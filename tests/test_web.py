"""Web API end-to-end tests: boot the real HTTP server on a free port and
drive it over HTTP (mirrors the REST half of the reference's Playwright
suite, tests/test_web_e2e.py:196-269)."""

import json
import os
import socket
import urllib.request

import pytest

from othello_reinforcement_learning_test_tpu.apps.web.server import (
    make_server,
    serve_forever_in_thread,
)


@pytest.fixture(scope="module")
def base_url(tmp_path_factory):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server, gm = make_server("127.0.0.1", port,
                             model_dir=str(tmp_path_factory.mktemp("models")))
    serve_forever_in_thread(server)
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def call(base, path, method="GET", body=None, expect_error=False):
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
        if not expect_error:
            raise
        return e.code, json.loads(e.read())


def test_initial_state(base_url):
    status, state = call(base_url, "/api/game/state")
    assert status == 200
    assert state["black_count"] == 2 and state["white_count"] == 2
    assert state["current_player"] == 1
    assert sorted(state["legal_moves"]) == [19, 26, 37, 44]
    assert not state["is_game_over"]
    assert not state["model_loaded"]
    assert state["board"][3][4] == 1 and state["board"][4][3] == 1
    assert state["board"][3][3] == -1 and state["board"][4][4] == -1


def test_move_and_undo(base_url):
    call(base_url, "/api/game/new", "POST")
    status, res = call(base_url, "/api/game/move", "POST", {"position": 19})
    assert status == 200 and res["success"]
    st = res["state"]
    assert st["black_count"] == 4 and st["white_count"] == 1
    assert st["current_player"] == -1
    assert st["last_move"] == 19 and st["can_undo"]

    status, res = call(base_url, "/api/game/undo", "POST")
    assert status == 200 and res["success"]
    st = res["state"]
    assert st["black_count"] == 2 and st["white_count"] == 2
    assert not st["can_undo"]


def test_invalid_move_rejected(base_url):
    call(base_url, "/api/game/new", "POST")
    status, res = call(
        base_url, "/api/game/move", "POST", {"position": 0}, expect_error=True
    )
    assert status == 400 and not res["success"]
    status, _ = call(
        base_url, "/api/game/move", "POST", {}, expect_error=True
    )
    assert status == 422


def test_simulations_clamped(base_url):
    status, res = call(base_url, "/api/ai/simulations", "PUT",
                       {"num_simulations": 9999})
    assert status == 200 and res["num_simulations"] == 500
    status, res = call(base_url, "/api/ai/simulations", "PUT",
                       {"num_simulations": 1})
    assert res["num_simulations"] == 10
    status, res = call(base_url, "/api/ai/simulations")
    assert res["num_simulations"] == 10


def test_ai_requires_model(base_url):
    status, res = call(base_url, "/api/game/ai-move", "POST",
                       expect_error=True)
    assert status == 400 and "model" in (res.get("error") or "")
    status, res = call(base_url, "/api/game/hint", expect_error=True)
    assert status == 400


def test_models_listing_empty(base_url):
    status, res = call(base_url, "/api/ai/models")
    assert status == 200 and res["models"] == []


def test_models_listing_skips_torchscript(tmp_path):
    # TorchScript exports conventionally share the .pt extension but fail
    # under torch.load(weights_only=True); the listing must not offer them
    torch = pytest.importorskip("torch")
    from othello_reinforcement_learning_test_tpu.apps.web.game_manager import (
        GameManager,
    )

    torch.save({"model_state_dict": {}}, tmp_path / "weights.pt")

    class _M(torch.nn.Module):
        def forward(self, x):
            return x

    torch.jit.save(torch.jit.script(_M()), str(tmp_path / "scripted.pt"))
    (tmp_path / "junk.txt").write_text("not a model")
    gm = GameManager(model_dir=str(tmp_path))
    names = [os.path.basename(p) for p in gm.list_models()]
    assert names == ["weights.pt"]


def test_models_listing_finds_named_orbax_dirs(tmp_path):
    """Arbitrarily-named orbax checkpoint dirs (like the committed
    results/model_* flagships) must be listed — identified by the orbax
    manifest inside — while orbax-internal subdirectories
    (ocdbt.process_*) must not leak into the list (round-4 fix, found by
    driving the web UI against results/). A directory with only a
    .config.json sidecar and NO orbax data must NOT be listed: selecting
    it in the UI could only fail at load time (round-5 ADVICE fix)."""
    from othello_reinforcement_learning_test_tpu.apps.web.game_manager import (
        GameManager,
    )

    m = tmp_path / "my_flagship_model"
    (m / "ocdbt.process_0").mkdir(parents=True)
    (m / "manifest.ocdbt").write_text("")
    (m / "ocdbt.process_0" / "manifest.ocdbt").write_text("")
    side = tmp_path / "sidecar_model"  # sidecar but no orbax data inside
    side.mkdir()
    (tmp_path / "sidecar_model.config.json").write_text("{}")
    (tmp_path / "random_dir").mkdir()  # neither manifest nor sidecar
    gm = GameManager(model_dir=str(tmp_path))
    names = sorted(os.path.basename(p) for p in gm.list_models())
    assert names == ["my_flagship_model"]


def test_static_files_served(base_url):
    with urllib.request.urlopen(base_url + "/") as resp:
        html = resp.read().decode()
    assert "Othello" in html and resp.status == 200
    with urllib.request.urlopen(base_url + "/js/api.js") as resp:
        assert "waitForAiMove" in resp.read().decode()
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(base_url + "/../secrets")


def test_ai_move_end_to_end(base_url, tmp_path):
    """Train a micro model, load it over the API, and play an async AI move
    to completion via status polling (reference api.py:118-168 semantics)."""
    import time

    from othello_reinforcement_learning_test_tpu.train import AlphaZeroTrainer
    from othello_reinforcement_learning_test_tpu.utils import load_config

    cfg = load_config()
    cfg["model"].update(num_blocks=1, num_filters=8)
    cfg["training"].update(
        num_iterations=1, self_play_episodes_per_iter=2, batch_size=8,
        train_epochs_per_iter=1, checkpoint_interval=5, replay_buffer_size=500,
    )
    cfg["mcts"]["num_simulations"] = 2
    cfg["paths"]["checkpoint_dir"] = str(tmp_path / "m")
    cfg["paths"]["log_dir"] = str(tmp_path / "l")
    AlphaZeroTrainer(cfg, log_cb=None).train()

    ckpt = str(tmp_path / "m" / "final_model")
    status, res = call(base_url, "/api/ai/load-model", "POST", {"path": ckpt})
    assert status == 200 and res["success"]

    call(base_url, "/api/game/new", "POST")
    call(base_url, "/api/ai/simulations", "PUT", {"num_simulations": 10})
    status, res = call(base_url, "/api/game/ai-move", "POST")
    assert status == 200 and res["success"]
    for _ in range(300):  # poll like the JS client
        status, st = call(base_url, "/api/game/ai-status")
        if not st["is_thinking"]:
            break
        time.sleep(0.2)
    assert not st["is_thinking"]
    status, state = call(base_url, "/api/game/state")
    assert state["move_count"] == 1
    assert state["last_ai_move"] in (19, 26, 37, 44)
    assert state["current_player"] == -1

    # hint now works
    status, hint = call(base_url, "/api/game/hint")
    assert status == 200
    assert all(0 <= v <= 100 for v in hint["evaluations"].values())

    # model listing sees the checkpoints
    status, res = call(base_url, "/api/ai/models")
    assert status == 200

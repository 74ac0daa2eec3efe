"""FastAPI adapter coverage without fastapi installed.

``apps/web/api.py`` mirrors the reference's FastAPI backend
(``/root/reference/src/web/api.py``) but the image ships no fastapi. A
minimal fake ``fastapi`` module is injected so ``create_app`` runs for
real: routes register, handlers execute against a live ``GameManager``,
pydantic response models validate, and error paths raise with the same
status codes the stdlib server uses.
"""

import sys
import types

import pytest


class FakeHTTPException(Exception):
    def __init__(self, status_code, detail=None):
        super().__init__(detail)
        self.status_code = status_code
        self.detail = detail


class FakeFastAPI:
    """Captures route registrations the way FastAPI's decorators do."""

    def __init__(self, title=""):
        self.title = title
        self.routes = {}  # (method, path) -> (handler, response_model)
        self.mounts = []

    def _register(self, method, path, response_model):
        def deco(fn):
            self.routes[(method, path)] = (fn, response_model)
            return fn

        return deco

    def get(self, path, response_model=None):
        return self._register("GET", path, response_model)

    def post(self, path, response_model=None):
        return self._register("POST", path, response_model)

    def put(self, path, response_model=None):
        return self._register("PUT", path, response_model)

    def mount(self, path, app, name=None):
        self.mounts.append((path, app))


@pytest.fixture()
def app_and_gm(tmp_path, monkeypatch):
    fake = types.ModuleType("fastapi")
    fake.FastAPI = FakeFastAPI
    fake.HTTPException = FakeHTTPException
    fake.BackgroundTasks = type("BackgroundTasks", (), {})
    staticfiles = types.ModuleType("fastapi.staticfiles")

    class StaticFiles:
        def __init__(self, directory=None, html=False):
            self.directory = directory

    staticfiles.StaticFiles = StaticFiles
    fake.staticfiles = staticfiles
    monkeypatch.setitem(sys.modules, "fastapi", fake)
    monkeypatch.setitem(sys.modules, "fastapi.staticfiles", staticfiles)

    from othello_reinforcement_learning_test_tpu.apps.web.api import create_app
    from othello_reinforcement_learning_test_tpu.apps.web.game_manager import (
        GameManager,
    )

    gm = GameManager(model_dir=str(tmp_path))
    return create_app(gm=gm), gm


def test_route_surface_matches_stdlib_server(app_and_gm):
    """The adapter must expose the same 11-endpoint REST surface as
    apps/web/server.py (the transport the tests drive over HTTP)."""
    app, _ = app_and_gm
    assert set(app.routes) == {
        ("POST", "/api/game/new"),
        ("GET", "/api/game/state"),
        ("POST", "/api/game/move"),
        ("POST", "/api/game/undo"),
        ("POST", "/api/game/ai-move"),
        ("GET", "/api/game/ai-status"),
        ("GET", "/api/game/hint"),
        ("POST", "/api/ai/load-model"),
        ("PUT", "/api/ai/simulations"),
        ("GET", "/api/ai/simulations"),
        ("GET", "/api/ai/models"),
    }
    # static files mounted at root, like the reference app
    assert app.mounts and app.mounts[0][0] == "/"


def test_game_flow_through_handlers(app_and_gm):
    """new -> state -> legal move -> undo, all through the FastAPI handlers,
    with every response validating against its declared response_model."""
    from othello_reinforcement_learning_test_tpu.apps.web import schemas

    app, gm = app_and_gm

    def call(method, path, *args):
        handler, model = app.routes[(method, path)]
        out = handler(*args)
        if model is not None:
            assert isinstance(out, model)
            model.model_validate(out.model_dump())
        return out

    state = call("POST", "/api/game/new")
    assert state.current_player == 1 and not state.is_game_over
    assert len(state.board) == 8 and len(state.board[0]) == 8

    state2 = call("GET", "/api/game/state")
    assert state2.board == state.board

    move = call("POST", "/api/game/move",
                schemas.MoveRequest(position=state.legal_moves[0]))
    assert move.success and move.state.current_player == -1

    undo = call("POST", "/api/game/undo")
    assert undo.success and undo.state.board == state.board

    sims = call("PUT", "/api/ai/simulations",
                schemas.SimulationsRequest(num_simulations=50))
    assert sims.num_simulations == 50
    assert call("GET", "/api/ai/simulations").num_simulations == 50

    models = call("GET", "/api/ai/models")
    assert models.models == [] and models.current is None

    status = call("GET", "/api/game/ai-status")
    assert not status.is_thinking


def test_error_paths_raise_http_exceptions(app_and_gm):
    """Illegal move -> 400; hint without model -> 400; bad model path -> 400
    (reference api.py returns the same codes)."""
    from othello_reinforcement_learning_test_tpu.apps.web import schemas

    app, gm = app_and_gm
    app.routes[("POST", "/api/game/new")][0]()

    with pytest.raises(FakeHTTPException) as ei:
        app.routes[("POST", "/api/game/move")][0](
            schemas.MoveRequest(position=0))
    assert ei.value.status_code == 400

    with pytest.raises(FakeHTTPException) as ei:
        app.routes[("GET", "/api/game/hint")][0]()
    assert ei.value.status_code == 400

    with pytest.raises(FakeHTTPException) as ei:
        app.routes[("POST", "/api/ai/load-model")][0](
            schemas.LoadModelRequest(path="no/such/model"))
    assert ei.value.status_code == 400

    # undo with no history -> 400
    app.routes[("POST", "/api/game/new")][0]()
    with pytest.raises(FakeHTTPException) as ei:
        app.routes[("POST", "/api/game/undo")][0]()
    assert ei.value.status_code == 400

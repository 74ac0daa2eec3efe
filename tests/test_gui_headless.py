"""GUI app-layer tests without a display: the fake tkinter in
``tests/fake_tk.py`` stands in for the real toolkit, so OthelloApp's click
handling, render draw-ops, button state machine, simulations slider, menu
wiring, and threaded AI marshalling all execute for real (the display-bound
suite in ``tests/test_gui.py`` skips in this image — VERDICT round 1).
Mirrors the reference's GUI automation (``test_gui_automated.py``)."""

import importlib
import sys
import threading
import time

import pytest

import fake_tk


@pytest.fixture()
def gui(monkeypatch, tmp_path):
    monkeypatch.setitem(sys.modules, "tkinter", fake_tk)
    monkeypatch.setitem(sys.modules, "tkinter.filedialog", fake_tk.filedialog)
    monkeypatch.setitem(sys.modules, "tkinter.messagebox", fake_tk.messagebox)
    # re-import the gui modules against the fake toolkit
    for name in list(sys.modules):
        if "apps.gui" in name:
            monkeypatch.delitem(sys.modules, name)
    board_ui = importlib.import_module(
        "othello_reinforcement_learning_test_tpu.apps.gui.board_ui")
    app_mod = importlib.import_module(
        "othello_reinforcement_learning_test_tpu.apps.gui.app")
    root = fake_tk.Tk()
    app = app_mod.OthelloApp(root, model_dir=str(tmp_path))
    yield app, root, board_ui
    root.destroy()


def _join_ai(app, timeout=300.0):
    """Wait for the daemon AI worker to finish and marshal its result."""
    deadline = time.time() + timeout
    while app.gm.is_ai_thinking and time.time() < deadline:
        time.sleep(0.05)
    # the worker calls root.after(0, ...) itself (synchronous in the fake);
    # give the thread a beat to run that callback
    for t in threading.enumerate():
        if t.daemon and t is not threading.current_thread():
            t.join(timeout=60.0)
    assert not app.gm.is_ai_thinking


def test_initial_render_draw_ops(gui):
    app, root, _ = gui
    items = app.board_ui.canvas.items
    kinds = [k for k, _, _ in items]
    assert kinds.count("line") == 18  # 9 horizontal + 9 vertical grid lines
    # 4 starting stones + 4 legal-move dots
    assert kinds.count("oval") == 8
    assert root._title.startswith("Othello")


def test_click_moves_and_rerenders(gui):
    app, _, _ = gui
    # click square D3 (row 2, col 3) through the canvas binding, pixel coords
    app.board_ui.canvas.event_generate(
        "<Button-1>", x=3 * app.board_ui.cell + 5, y=2 * app.board_ui.cell + 5)
    state = app.gm.state_dict()
    assert state["move_count"] == 1 and state["black_count"] == 4
    assert "White" in app.info.turn_var.get()
    assert app.info.score_var.get() == "● 4  -  ○ 1"
    # last-move marker drawn (width-3 outline oval)
    marks = [kw for k, _, kw in app.board_ui.canvas.items
             if k == "oval" and kw.get("width") == 3]
    assert len(marks) == 1


def test_illegal_click_is_ignored(gui):
    app, _, _ = gui
    app.board_ui.canvas.event_generate("<Button-1>", x=5, y=5)  # corner A1
    assert app.gm.state_dict()["move_count"] == 0


def test_undo_button_state_machine(gui):
    app, _, _ = gui
    assert app.btn_undo.cget("state") == "disabled"
    app._on_board_click(19)
    assert app.btn_undo.cget("state") == "normal"
    app.btn_undo.invoke()
    state = app.gm.state_dict()
    assert state["move_count"] == 0 and state["black_count"] == 2
    assert app.btn_undo.cget("state") == "disabled"


def test_ai_buttons_disabled_without_model(gui):
    app, _, _ = gui
    assert app.btn_ai.cget("state") == "disabled"
    assert app.btn_hint.cget("state") == "disabled"
    # invoking a disabled button is a no-op
    app.btn_ai.invoke()
    assert app.gm.state_dict()["move_count"] == 0


def test_sims_slider_updates_manager(gui):
    app, _, _ = gui
    app.sims_var.set(150)
    app._sims_changed(150)
    assert app.gm.ai_simulations == 150


def test_menu_wiring(gui):
    app, root, _ = gui
    menubar = root.kw.get("menu")
    assert menubar is not None
    kind, kw = menubar.entries[0]
    assert kind == "cascade" and kw["label"] == "Game"
    labels = [e[1].get("label") for e in kw["menu"].entries if e[0] == "command"]
    assert labels == ["Load Model...", "New Game", "Quit"]


def test_load_model_dialog_cancelled(gui):
    app, _, _ = gui
    fake_tk.filedialog.return_value = ""  # user cancels
    app.load_model_dialog()
    assert not app.gm.state_dict()["model_loaded"]


def test_model_load_ai_move_and_hint(gui, test_checkpoint):
    """Full AI path: load the tiny trained model (built on demand by the
    session fixture), click, let the threaded AI reply, then hint — all
    through the app layer."""
    app, _, _ = gui
    app.load_model(test_checkpoint)
    assert app.gm.state_dict()["model_loaded"]
    assert app.btn_ai.cget("state") == "normal"
    app.gm.set_simulations(10)  # keep the first CPU compile fast

    app._on_board_click(19)  # human move; auto-queues ai_move via after()
    _join_ai(app)
    state = app.gm.state_dict()
    assert state["move_count"] >= 2  # human + AI reply
    assert state["last_ai_move"] is not None

    app.show_hint()
    _join_ai(app)
    assert app._evals  # eval overlay populated
    texts = [a for k, a, kw in app.board_ui.canvas.items if k == "text"]
    assert len(texts) == len(app._evals)

"""GUI tests: headless-safe widget construction and interaction via a hidden
Tk root (mirrors the reference's guarded GUI scripts,
test_gui_automated.py:14-19,143-176). Skipped when no display is available."""

import pytest

tk = pytest.importorskip("tkinter")


def _make_root():
    try:
        root = tk.Tk()
    except tk.TclError:
        pytest.skip("no display available for tkinter")
    root.withdraw()
    return root


@pytest.fixture()
def app():
    from othello_reinforcement_learning_test_tpu.apps.gui import OthelloApp

    root = _make_root()
    app = OthelloApp(root)
    yield app
    root.destroy()


def test_widgets_constructed(app):
    assert app.board_ui.canvas.winfo_exists()
    assert app.info.turn_var.get().startswith("Black")
    assert app.sims_var.get() == 100


def test_click_makes_move_and_undo(app):
    app._on_board_click(19)  # D3
    state = app.gm.state_dict()
    assert state["black_count"] == 4 and state["move_count"] == 1
    assert "White" in app.info.turn_var.get()
    app.undo()
    state = app.gm.state_dict()
    assert state["black_count"] == 2 and state["move_count"] == 0


def test_illegal_click_ignored(app):
    app._on_board_click(0)
    assert app.gm.state_dict()["move_count"] == 0


def test_sims_slider_updates_manager(app):
    app.sims_var.set(150)
    app._sims_changed(None)
    assert app.gm.ai_simulations == 150


def test_board_render_with_evals(app):
    app._evals = {19: 75, 26: 30}
    app.refresh()  # must not raise
    items = app.board_ui.canvas.find_all()
    assert len(items) > 20  # grid + stones + overlays drawn

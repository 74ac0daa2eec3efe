"""Regression tests for the code-review findings (round 1)."""

import urllib.request

import numpy as np
import jax
import jax.numpy as jnp

from othello_reinforcement_learning_test_tpu.apps.web.game_manager import GameManager
from othello_reinforcement_learning_test_tpu.ops import bits
from othello_reinforcement_learning_test_tpu.ops.bitboard import Board, get_engine


def test_new_game_refused_while_thinking(tmp_path):
    gm = GameManager(model_dir=str(tmp_path))
    gm.is_ai_thinking = True
    ok, err = gm.new_game()
    assert not ok and "thinking" in err
    ok, err = gm.load_model("/nope")
    assert not ok and "thinking" in err
    gm.is_ai_thinking = False
    ok, _ = gm.new_game()
    assert ok


def test_pass_exposed_through_game_manager(tmp_path):
    """A human-must-pass position: GameManager accepts action 64 and the
    state advertises pass as the only legal move (frontends show a Pass
    button off this)."""
    gm = GameManager(model_dir=str(tmp_path))
    eng = gm.engine
    # mover has no placement; the opponent still has one. Vertical rays are
    # quirk-free: me={A2}, opp={A1} -> mover can't capture (A1's only rays
    # run off-board / into reference edge-mask kills), but the opponent can
    # play A3 capturing A2 upward.
    me = jnp.asarray(bits.from_uint64_np(np.uint64(1 << 8)))[None]
    opp = jnp.asarray(bits.from_uint64_np(np.uint64(1 << 0)))[None]
    gm.board = Board(me=me, opp=opp,
                     move_count=jnp.zeros((1,), jnp.int32),
                     passed=jnp.zeros((1,), jnp.bool_))
    # sanity: not terminal, pass is the only action
    assert not gm.is_game_over()
    assert gm.legal_moves() == [64]
    ok, err = gm.make_move(64)
    assert ok, err
    assert int(gm.board.move_count[0]) == 1


def test_static_prefix_sibling_not_served(tmp_path):
    """'static_evil' prefix must not defeat the containment check."""
    import socket

    from othello_reinforcement_learning_test_tpu.apps.web import server as srv

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server, _ = srv.make_server("127.0.0.1", port, model_dir=str(tmp_path))
    srv.serve_forever_in_thread(server)
    try:
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/..%2fstatic_evil/x")
            served = True
        except urllib.error.HTTPError as e:
            served = e.code == 200
        assert not served
    finally:
        server.shutdown()


def test_pallas_block_rows_any_multiple_of_128():
    """B=384 games (rows=3, not a power of two) must work."""
    from othello_reinforcement_learning_test_tpu.ops.pallas_step import (
        pack_boards,
        random_step,
        unpack_boards,
    )

    eng = get_engine(8)
    s = eng.initial_state((384,))
    packed = pack_boards(s.me, s.opp)
    new_packed, live = random_step(packed, jax.random.PRNGKey(0),
                                   interpret=True)
    me2, _ = unpack_boards(new_packed)
    assert me2.shape == (384, 2)
    assert np.asarray(live).all()


def test_num_parallel_games_chunks_self_play(tmp_path):
    from othello_reinforcement_learning_test_tpu.train import AlphaZeroTrainer
    from othello_reinforcement_learning_test_tpu.utils import load_config

    cfg = load_config()
    cfg["model"].update(num_blocks=1, num_filters=8)
    cfg["training"].update(
        num_iterations=1, self_play_episodes_per_iter=5, batch_size=8,
        train_epochs_per_iter=1, replay_buffer_size=500,
    )
    cfg["mcts"]["num_simulations"] = 2
    cfg["self_play"]["num_parallel_games"] = 2  # chunks of 2,2,1
    cfg["paths"]["checkpoint_dir"] = str(tmp_path / "m")
    cfg["paths"]["log_dir"] = str(tmp_path / "l")
    tr = AlphaZeroTrainer(cfg, log_cb=None)
    traj = tr.run_self_play(5)
    assert traj.mask.shape[0] == 5
    assert (np.asarray(traj.num_moves) >= 55).all()

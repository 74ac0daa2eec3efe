"""Regression tests for the second (high-effort) review pass."""

import numpy as np
import jax
import jax.numpy as jnp

from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine
from othello_reinforcement_learning_test_tpu.search import mcts
from othello_reinforcement_learning_test_tpu.train import buffer as buffer_lib


def test_temperature_no_overflow():
    """counts**(1/t) must not overflow for small nonzero temperatures."""
    counts = jnp.zeros((1, 65)).at[0, 3].set(500.0).at[0, 7].set(100.0)
    legal = jnp.zeros((1, 65), bool).at[0, 3].set(True).at[0, 7].set(True)
    for t in (0.01, 0.05, 0.5, 1.0):
        p = np.asarray(mcts.action_probs_from_counts(counts, legal, t))
        assert np.isfinite(p).all(), t
        np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)
    # tiny temperature degrades to argmax one-hot
    p = np.asarray(mcts.action_probs_from_counts(counts, legal, 0.01))[0]
    assert p[3] > 0.999


def test_buffer_overflow_batch_keeps_last_entries():
    """A single add() larger than capacity must keep the LAST C plies with
    consistent (board, pi, value) pairing — no duplicate-scatter races."""
    from tests.test_train import make_traj

    C = 4
    buf = buffer_lib.create(C, 65)
    # 6 valid plies with distinguishable values 0..5 encoded via pi[0]
    traj = make_traj(6, n_slots=8, A=65, value=1.0)
    pi = np.zeros((1, 8, 65), np.float32)
    for t in range(8):
        pi[0, t, 0] = float(t)
    traj = traj._replace(pi=jnp.asarray(pi))
    buf = buffer_lib.add(buf, traj)
    assert int(buf.filled) == C
    got = sorted(float(x) for x in np.asarray(buf.pi[:C, 0]))
    assert got == [2.0, 3.0, 4.0, 5.0]  # the last 4 of plies 0..5


def test_augment_disabled_under_reference_rules(tmp_path):
    from othello_reinforcement_learning_test_tpu.train import AlphaZeroTrainer
    from othello_reinforcement_learning_test_tpu.utils import load_config

    logs = []
    cfg = load_config()
    cfg["model"].update(num_blocks=1, num_filters=8)
    cfg["training"].update(augment_symmetries=True)
    cfg["paths"]["checkpoint_dir"] = str(tmp_path / "m")
    cfg["paths"]["log_dir"] = str(tmp_path / "l")
    tr = AlphaZeroTrainer(cfg, log_cb=logs.append)
    assert tr.augment is False
    assert any("not D4-symmetric" in m for m in logs)

    cfg["game"]["rules"] = "standard"
    tr2 = AlphaZeroTrainer(cfg, log_cb=None)
    assert tr2.augment is True


def test_execute_ai_move_guarded(tmp_path):
    from othello_reinforcement_learning_test_tpu.apps.web.game_manager import (
        GameManager,
    )

    gm = GameManager(model_dir=str(tmp_path))
    gm._player = object()  # pretend a model is loaded
    gm.is_ai_thinking = True
    ok, err = gm.execute_ai_move()
    assert not ok and "thinking" in err
    # hint refuses too (returns empty rather than racing)
    assert gm.hint() == {}


def test_default_stateless_fn_stable():
    from othello_reinforcement_learning_test_tpu.evaluation.players import Player

    class MyPlayer(Player):
        def act(self, rng, boards):  # pragma: no cover - never called
            raise NotImplementedError

    p = MyPlayer()
    fn1, _ = p.stateless()
    fn2, _ = p.stateless()
    assert fn1 is fn2

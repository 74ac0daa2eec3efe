"""Tests for the extras: prioritized replay, profiling utils, StableHLO
export, metrics writer."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from othello_reinforcement_learning_test_tpu.models import (
    OthelloResNet,
    init_variables,
)
from othello_reinforcement_learning_test_tpu.models.export import (
    load_stablehlo,
    save_stablehlo,
)
from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine
from othello_reinforcement_learning_test_tpu.train import buffer as buffer_lib
from othello_reinforcement_learning_test_tpu.utils.profiling import (
    PhaseTimer,
    model_flops_per_board,
    speed_of_light,
)


def _traj(n_steps, value=0.5):
    from tests.test_train import make_traj

    return make_traj(n_steps, value=value)


class TestPrioritizedBuffer:
    def test_add_sample_update(self):
        eng = get_engine(8)
        buf = buffer_lib.create_prioritized(32, 65, alpha=0.6)
        buf = buffer_lib.add_prioritized(buf, _traj(4, value=1.0))
        assert int(buf.filled) == 4
        feats, pi, v, idx, w = buffer_lib.sample_prioritized(
            buf, jax.random.PRNGKey(0), eng, 8
        )
        assert feats.shape == (8, 8, 8, 3) and v.shape == (8, 1)
        assert w.shape == (8,) and (np.asarray(w) <= 1.0 + 1e-6).all()
        assert (np.asarray(idx) < 4).all()

        td = jnp.asarray([2.0] * 8)
        buf = buffer_lib.update_priorities(buf, idx, td)
        assert float(buf.max_priority) >= 2.0

    def test_high_priority_sampled_more(self):
        eng = get_engine(8)
        buf = buffer_lib.create_prioritized(16, 65)
        buf = buffer_lib.add_prioritized(buf, _traj(6))
        # entry 0 gets huge priority
        buf = buffer_lib.update_priorities(
            buf, jnp.asarray([0]), jnp.asarray([100.0])
        )
        _, _, _, idx, _ = buffer_lib.sample_prioritized(
            buf, jax.random.PRNGKey(1), eng, 256
        )
        frac0 = float((np.asarray(idx) == 0).mean())
        assert frac0 > 0.5  # overwhelmingly sampled


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b", fence=jnp.ones(3) * 2):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert "a" in t.report()


def test_speed_of_light_report():
    out = speed_of_light(1e6, 1e5, model_flops_per_board())
    assert "env steps/s" in out
    assert model_flops_per_board() > 3e8  # ~380 MFLOP for 10x128


def test_stablehlo_export_roundtrip(tmp_path):
    model = OthelloResNet(num_blocks=1, num_filters=8)
    variables = init_variables(model, jax.random.PRNGKey(0))
    path = str(tmp_path / "model.shlo")
    save_stablehlo(model, variables, path, batch_size=4)
    assert os.path.exists(path) and os.path.exists(path + ".mlir")
    fn = load_stablehlo(path)
    x = jnp.zeros((4, 8, 8, 3))
    log_p, v = fn(x)
    ref_log_p, ref_v = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(log_p), np.asarray(ref_log_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)
    with open(path + ".mlir") as f:
        assert "stablehlo" in f.read()

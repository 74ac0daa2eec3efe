"""Fused Pallas inference trunk: interpret-mode equivalence with the Flax
model in eval mode (compiled path measured by benchmark_model.py --fused)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from othello_reinforcement_learning_test_tpu.models import (
    OthelloResNet,
    init_variables,
)
from othello_reinforcement_learning_test_tpu.models.pallas_resnet import (
    FusedInference,
    fold_block_params,
)


@pytest.fixture(scope="module")
def setup():
    model = OthelloResNet(num_blocks=3, num_filters=128)
    variables = init_variables(model, jax.random.PRNGKey(0))
    # non-trivial batch stats: run a train step so means/vars move
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 8, 8, 3))
    _, upd = model.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}
    return model, variables


def test_fold_shapes(setup):
    model, variables = setup
    w, b = fold_block_params(variables, model.num_blocks)
    assert w.shape == (6, 3, 3, 128, 128) and w.dtype == jnp.bfloat16
    assert b.shape == (6, 128) and b.dtype == jnp.float32


def test_fused_matches_flax_eval(setup):
    model, variables = setup
    fused = FusedInference(model, interpret=True)
    x = jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 8, 3))
    lp_ref, v_ref = model.apply(variables, x, train=False)
    lp_fused, v_fused = fused(variables, x)
    assert lp_fused.shape == lp_ref.shape and v_fused.shape == v_ref.shape
    # bf16 compute: compare action distributions and values loosely
    np.testing.assert_allclose(
        np.exp(np.asarray(lp_fused)), np.exp(np.asarray(lp_ref)),
        atol=0.03,
    )
    np.testing.assert_allclose(
        np.asarray(v_fused), np.asarray(v_ref), atol=0.05
    )
    # rankings agree on the top action
    np.testing.assert_array_equal(
        np.asarray(lp_fused).argmax(-1), np.asarray(lp_ref).argmax(-1)
    )


def test_fused_uneven_batch(setup):
    model, variables = setup
    fused = FusedInference(model, interpret=True, block_games=8)
    x = jnp.zeros((4, 8, 8, 3))
    lp, v = fused(variables, x)
    assert lp.shape == (4, 65) and v.shape == (4, 1)

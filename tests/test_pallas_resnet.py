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


def test_wide_variant_matches_flax_eval(setup):
    """Wide-matmul trunk (one (M,C)@(C,9C) per conv, shifts on the output
    side) must agree with the Flax model like the 9-matmul kernel does."""
    model, variables = setup
    fused = FusedInference(model, interpret=True, variant="wide")
    x = jax.random.uniform(jax.random.PRNGKey(3), (8, 8, 8, 3))
    lp_ref, v_ref = model.apply(variables, x, train=False)
    lp, v = fused(variables, x)
    np.testing.assert_allclose(
        np.exp(np.asarray(lp)), np.exp(np.asarray(lp_ref)), atol=0.03
    )
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=0.06)
    np.testing.assert_array_equal(
        np.asarray(lp).argmax(-1), np.asarray(lp_ref).argmax(-1)
    )


@pytest.mark.parametrize("variant", ["int8_xla", "int8", "int8_bf16",
                                     "int8_m9", "int8_patch", "int8_flat",
                                     "int8_dx3", "int8_dxcat"])
def test_int8_variants_match_flax_eval(setup, variant):
    """Int8 trunk (per-output-channel weight scales, dynamic per-tensor
    activation scales): distributions close to bf16, values within the
    quantization budget. Play-strength parity is validated separately by
    the arena (int8 vs bf16 match in eval tooling)."""
    model, variables = setup
    fused = FusedInference(model, interpret=True, variant=variant)
    x = jax.random.uniform(jax.random.PRNGKey(4), (8, 8, 8, 3))
    lp_ref, v_ref = model.apply(variables, x, train=False)
    lp, v = fused(variables, x)
    assert lp.shape == lp_ref.shape and v.shape == v_ref.shape
    assert np.all(np.isfinite(np.asarray(lp)))
    np.testing.assert_allclose(
        np.exp(np.asarray(lp)), np.exp(np.asarray(lp_ref)), atol=0.08
    )
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=0.15)


def test_int8_pallas_matches_int8_xla(setup):
    """The Pallas int8 kernel and the lax-only int8 path share weights and
    scheme; they should agree tightly (only per-block vs global activation
    scales differ)."""
    model, variables = setup
    a = FusedInference(model, interpret=True, variant="int8")
    b = FusedInference(model, interpret=True, variant="int8_xla")
    x = jax.random.uniform(jax.random.PRNGKey(5), (8, 8, 8, 3))
    lp_a, v_a = a(variables, x)
    lp_b, v_b = b(variables, x)
    np.testing.assert_allclose(
        np.exp(np.asarray(lp_a)), np.exp(np.asarray(lp_b)), atol=0.02
    )
    np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_b), atol=0.04)


def test_fused_uneven_batch(setup):
    model, variables = setup
    fused = FusedInference(model, interpret=True, block_games=8)
    x = jnp.zeros((4, 8, 8, 3))
    lp, v = fused(variables, x)
    assert lp.shape == (4, 65) and v.shape == (4, 1)

"""Model contract tests (mirrors reference tests/test_model.py, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from othello_reinforcement_learning_test_tpu.models import (
    OthelloResNet,
    create_model,
    init_variables,
    param_count,
    predict,
)


@pytest.fixture(scope="module")
def small():
    model = OthelloResNet(num_blocks=2, num_filters=32)
    variables = init_variables(model, jax.random.PRNGKey(0))
    return model, variables


def test_output_shapes(small):
    model, variables = small
    x = jnp.zeros((4, 8, 8, 3))
    log_probs, value = model.apply(variables, x, train=False)
    assert log_probs.shape == (4, 65)
    assert value.shape == (4, 1)


def test_policy_is_log_softmax(small):
    model, variables = small
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3))
    log_probs, _ = model.apply(variables, x, train=False)
    lp = np.asarray(log_probs)
    assert (lp <= 0).all()
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, rtol=1e-3)


def test_value_range(small):
    model, variables = small
    x = jax.random.uniform(jax.random.PRNGKey(2), (16, 8, 8, 3))
    _, value = model.apply(variables, x, train=False)
    v = np.asarray(value)
    assert (v >= -1).all() and (v <= 1).all()


@pytest.mark.parametrize("batch", [1, 2, 32])
def test_batch_sizes(small, batch):
    model, variables = small
    x = jnp.zeros((batch, 8, 8, 3))
    log_probs, value = model.apply(variables, x, train=False)
    assert log_probs.shape == (batch, 65) and value.shape == (batch, 1)


def test_gradients_flow(small):
    model, variables = small
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 8, 8, 3))

    def loss_fn(params):
        log_probs, value, = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            train=True,
            mutable=["batch_stats"],
        )[0]
        return -log_probs.mean() + (value**2).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert total > 0 and np.isfinite(total)


def test_train_mode_updates_batch_stats(small):
    model, variables = small
    x = jax.random.uniform(jax.random.PRNGKey(4), (8, 8, 8, 3)) * 3.0
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(after, before)
    )


def test_eval_deterministic(small):
    model, variables = small
    x = jax.random.uniform(jax.random.PRNGKey(5), (4, 8, 8, 3))
    lp1, v1 = model.apply(variables, x, train=False)
    lp2, v2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(lp1), np.asarray(lp2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_default_param_count():
    """Default config ~2.98M params like the reference (README.md:239)."""
    model = create_model({"model": {"num_blocks": 10, "num_filters": 128}})
    variables = init_variables(model, jax.random.PRNGKey(0))
    n = param_count(variables["params"])
    assert 2.8e6 < n < 3.2e6, n


def test_predict_single_sample(small):
    model, variables = small
    x = jnp.zeros((8, 8, 3))
    probs, value = predict(model, variables, x)
    assert probs.shape == (65,) and value.shape == (1,)
    np.testing.assert_allclose(float(probs.sum()), 1.0, rtol=1e-3)


def test_6x6_model():
    model = OthelloResNet(num_blocks=2, num_filters=16, board_size=6)
    variables = init_variables(model, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 6, 6, 3))
    log_probs, value = model.apply(variables, x, train=False)
    assert log_probs.shape == (2, 37) and value.shape == (2, 1)

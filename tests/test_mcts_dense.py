"""Unit tests for the dense one-hot tree-op helpers in search/mcts.py.

The round-2 rewrite replaced vmapped irregular gathers with dense one-hot
contractions (results/mcts_dense_tree.md); these pin the helpers to plain
advanced-indexing semantics so future kernel work can't drift.
"""

import jax
import jax.numpy as jnp
import numpy as np

from othello_reinforcement_learning_test_tpu.search.mcts import (
    _blend_at,
    _node_mask,
    _take,
    _take_lane,
)


def _rng_arrays(seed=0, B=7, N=11, A=5):
    r = np.random.default_rng(seed)
    return {
        "f3": jnp.asarray(r.normal(size=(B, N, A)).astype(np.float32)),
        "i2": jnp.asarray(r.integers(-9, 9, size=(B, N)).astype(np.int32)),
        "b3": jnp.asarray(r.integers(0, 2, size=(B, N, A)).astype(bool)),
        "u3": jnp.asarray(r.integers(0, 2**32, size=(B, N, 2), dtype=np.uint64)
                          .astype(np.uint32)),
        "node": jnp.asarray(r.integers(0, N, size=(B,)).astype(np.int32)),
        "lane": jnp.asarray(r.integers(0, A, size=(B,)).astype(np.int32)),
        "B": B, "N": N, "A": A,
    }


def test_take_matches_indexing():
    d = _rng_arrays()
    mask = _node_mask(d["node"], d["N"])
    rows = jnp.arange(d["B"])
    for key in ("f3", "i2", "b3", "u3"):
        got = np.asarray(_take(d[key], mask))
        want = np.asarray(d[key][rows, d["node"]])
        np.testing.assert_array_equal(got, want, err_msg=key)


def test_take_lane_matches_indexing():
    d = _rng_arrays()
    row_f = d["f3"][:, 0, :]
    row_b = d["b3"][:, 0, :]
    rows = jnp.arange(d["B"])
    np.testing.assert_array_equal(
        np.asarray(_take_lane(row_f, d["lane"])),
        np.asarray(row_f[rows, d["lane"]]))
    np.testing.assert_array_equal(
        np.asarray(_take_lane(row_b, d["lane"])),
        np.asarray(row_b[rows, d["lane"]]))


def test_blend_at_matches_scatter():
    d = _rng_arrays()
    val = jnp.asarray(np.arange(d["B"], dtype=np.int32) + 100)
    pred = jnp.asarray(np.array([True, False] * 4)[: d["B"]])
    got = np.asarray(_blend_at(d["i2"], d["node"], val, pred))
    want = np.asarray(d["i2"]).copy()
    for b in range(d["B"]):
        if bool(pred[b]):
            want[b, int(d["node"][b])] = int(val[b])
    np.testing.assert_array_equal(got, want)


def test_take_under_jit_and_grad_safety():
    """Helpers are used inside jit/while_loop — confirm they trace."""
    d = _rng_arrays()

    @jax.jit
    def f(arr, node):
        return _take(arr, _node_mask(node, arr.shape[1])).sum()

    out = f(d["f3"], d["node"])
    assert np.isfinite(float(out))

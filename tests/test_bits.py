"""Unit tests for the uint32-pair 64-bit word library."""

import numpy as np
import jax.numpy as jnp

from othello_reinforcement_learning_test_tpu.ops import bits


def np_u64(x):
    return int(bits.to_uint64_np(x))


def test_const_roundtrip():
    for v in [0, 1, 0xFFFFFFFFFFFFFFFF, 0x8000000000000000, 0x0123456789ABCDEF]:
        assert np_u64(bits.u64(v)) == v


def test_shifts_match_python():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**64, size=50, dtype=np.uint64)
    x = jnp.asarray(bits.from_uint64_np(vals))
    for s in (1, 7, 8, 9, 31):
        got_l = bits.to_uint64_np(bits.shl(x, s))
        got_r = bits.to_uint64_np(bits.shr(x, s))
        exp_l = (vals << np.uint64(s)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        exp_r = vals >> np.uint64(s)
        np.testing.assert_array_equal(got_l, exp_l)
        np.testing.assert_array_equal(got_r, exp_r)


def test_popcount_and_any():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 2**64, size=100, dtype=np.uint64)
    x = jnp.asarray(bits.from_uint64_np(vals))
    exp = np.array([bin(int(v)).count("1") for v in vals])
    np.testing.assert_array_equal(np.asarray(bits.popcount(x)), exp)
    np.testing.assert_array_equal(np.asarray(bits.any_set(x)), vals != 0)


def test_bit_onehot():
    pos = jnp.arange(-2, 66, dtype=jnp.int32)
    words = bits.to_uint64_np(bits.bit(pos))
    for p, w in zip(range(-2, 66), words):
        if 0 <= p < 64:
            assert int(w) == 1 << p
        else:
            assert int(w) == 0


def test_planes_roundtrip():
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 2**64, size=20, dtype=np.uint64)
    x = jnp.asarray(bits.from_uint64_np(vals))
    planes = bits.to_planes(x)
    assert planes.shape == (20, 64)
    back = bits.to_uint64_np(bits.from_planes(planes))
    np.testing.assert_array_equal(back, vals)
    # bit i of word maps to plane index i
    one = bits.u64(1 << 37)
    p = np.asarray(bits.to_planes(one))
    assert p[37] == 1 and p.sum() == 1


def test_bitwise_operators_lanewise():
    a = bits.u64(0xF0F0F0F0F0F0F0F0)
    b = bits.u64(0x00FF00FF00FF00FF)
    assert np_u64(a & b) == 0xF0F0F0F0F0F0F0F0 & 0x00FF00FF00FF00FF
    assert np_u64(a | b) == 0xF0F0F0F0F0F0F0F0 | 0x00FF00FF00FF00FF
    assert np_u64(a ^ b) == 0xF0F0F0F0F0F0F0F0 ^ 0x00FF00FF00FF00FF
    assert np_u64(~a) == (~0xF0F0F0F0F0F0F0F0) & 0xFFFFFFFFFFFFFFFF

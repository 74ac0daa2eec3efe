"""Vectorized 64-bit bitboard arithmetic as uint32 pairs.

TPUs have no native 64-bit integer path and enabling ``jax_enable_x64``
globally would poison float defaults, so a board word is represented as an
array whose **last axis has size 2**: ``[..., 0] = low 32 bits``,
``[..., 1] = high 32 bits`` (dtype ``uint32``).

Bitwise AND/OR/XOR/NOT work directly with jnp operators on this layout
(they are lane-wise); this module supplies the operations that must cross
the lo/hi boundary: shifts, popcount, single-bit construction, and
(un)packing to per-square planes.

All functions are pure, shape-polymorphic over leading batch axes, and
jit/vmap friendly. Equivalent role to the ``uint64_t`` arithmetic inside the
reference engine (``/root/reference/src/cython/bitboard.pyx:20-38``), but
batched and TPU-native.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

U32 = jnp.uint32
_FULL = 0xFFFFFFFFFFFFFFFF


def u64(value: int) -> jnp.ndarray:
    """Python int -> (2,) uint32 constant."""
    value &= _FULL
    return jnp.array([value & 0xFFFFFFFF, value >> 32], dtype=U32)


def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros((*shape, 2), dtype=U32)


def shl(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Logical left shift by a static amount 0 < s < 32."""
    assert 0 < s < 32, s
    lo, hi = x[..., 0], x[..., 1]
    return jnp.stack([lo << s, (hi << s) | (lo >> (32 - s))], axis=-1)


def shr(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Logical right shift by a static amount 0 < s < 32."""
    assert 0 < s < 32, s
    lo, hi = x[..., 0], x[..., 1]
    return jnp.stack([(lo >> s) | (hi << (32 - s)), hi >> s], axis=-1)


def popcount(x: jnp.ndarray) -> jnp.ndarray:
    """Number of set bits -> (...,) int32."""
    return jnp.sum(lax.population_count(x).astype(jnp.int32), axis=-1)


def any_set(x: jnp.ndarray) -> jnp.ndarray:
    """True where the 64-bit word is nonzero -> (...,) bool."""
    return (x[..., 0] | x[..., 1]) != 0


def is_zero(x: jnp.ndarray) -> jnp.ndarray:
    return ~any_set(x)


def equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def bit(pos: jnp.ndarray) -> jnp.ndarray:
    """One-hot 64-bit word for bit index ``pos`` (int array, (...,)).

    Out-of-range positions (pos < 0 or pos > 63, e.g. the pass action)
    return zero.
    """
    pos = pos.astype(jnp.int32)
    sh = (pos & 31).astype(U32)
    one = jnp.asarray(1, U32) << sh
    valid = (pos >= 0) & (pos < 64)
    lo = jnp.where(valid & (pos < 32), one, 0)
    hi = jnp.where(valid & (pos >= 32), one, 0)
    return jnp.stack([lo, hi], axis=-1)


def get_bit(x: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """True where bit ``pos`` of ``x`` is set -> (...,) bool."""
    return any_set(x & bit(pos))


def to_planes(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Unpack (..., 2) word -> (..., 64) per-square values in {0, 1}.

    Square i (row-major, row = i // 8, col = i % 8) lands at index i,
    matching the reference board layout (bitboard.pxd:18-22).
    """
    idx = jnp.arange(32, dtype=U32)
    lo_bits = (x[..., 0:1] >> idx) & jnp.asarray(1, U32)
    hi_bits = (x[..., 1:2] >> idx) & jnp.asarray(1, U32)
    return jnp.concatenate([lo_bits, hi_bits], axis=-1).astype(dtype)


def from_planes(planes: jnp.ndarray) -> jnp.ndarray:
    """Pack (..., 64) boolean/0-1 values -> (..., 2) uint32 word."""
    p = (planes != 0).astype(U32)
    idx = jnp.arange(32, dtype=U32)
    lo = jnp.sum(p[..., :32] << idx, axis=-1, dtype=U32)
    hi = jnp.sum(p[..., 32:] << idx, axis=-1, dtype=U32)
    return jnp.stack([lo, hi], axis=-1)


def to_uint64_np(x) -> "object":
    """Host helper: (..., 2) uint32 array -> numpy uint64 (for tests/io)."""
    import numpy as np

    a = np.asarray(x)
    return a[..., 0].astype(np.uint64) | (a[..., 1].astype(np.uint64) << np.uint64(32))


def from_uint64_np(v) -> "object":
    """Host helper: numpy uint64 (or python ints) -> (..., 2) uint32."""
    import numpy as np

    v = np.asarray(v, dtype=np.uint64)
    lo = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (v >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=-1)

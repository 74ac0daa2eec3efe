"""On-device ring replay buffer.

Replaces the reference's host-side ``deque`` buffer
(``/root/reference/src/train/buffer.py:18-136``) with fixed-capacity device
arrays and a write cursor: adds compact a whole self-play trajectory batch in
one jitted scatter, sampling is a jitted gather, and positions are stored as
packed bitboards (16 bytes each) with NN features recomputed on the fly —
no host round-trips anywhere in the training loop.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.bitboard import OthelloEngine
from .self_play import Trajectory


class ReplayBuffer(struct.PyTreeNode):
    """Ring buffer; slot ``capacity`` is a write-off trash slot so invalid
    (masked) entries can be scattered without branching."""

    me: jnp.ndarray  # (C+1, 2) uint32
    opp: jnp.ndarray  # (C+1, 2) uint32
    pi: jnp.ndarray  # (C+1, A) float32
    value: jnp.ndarray  # (C+1,) float32
    cursor: jnp.ndarray  # () int32 — next write position
    filled: jnp.ndarray  # () int32 — number of valid entries (<= C)
    total_added: jnp.ndarray  # () int32

    @property
    def capacity(self) -> int:
        return self.value.shape[0] - 1


def create(capacity: int, num_actions: int) -> ReplayBuffer:
    return ReplayBuffer(
        me=jnp.zeros((capacity + 1, 2), jnp.uint32),
        opp=jnp.zeros((capacity + 1, 2), jnp.uint32),
        pi=jnp.zeros((capacity + 1, num_actions), jnp.float32),
        value=jnp.zeros((capacity + 1,), jnp.float32),
        cursor=jnp.int32(0),
        filled=jnp.int32(0),
        total_added=jnp.int32(0),
    )


@jax.jit
def add(buffer: ReplayBuffer, traj: Trajectory) -> ReplayBuffer:
    """Append every masked-valid ply of a trajectory batch (compacting) —
    equivalent to the reference's per-step ``buffer.add`` loop
    (buffer.py:40-57) but one scatter."""
    C = buffer.capacity
    mask = traj.mask.reshape(-1)
    me = traj.me.reshape(-1, 2)
    opp = traj.opp.reshape(-1, 2)
    pi = traj.pi.reshape(-1, traj.pi.shape[-1])
    value = traj.value.reshape(-1)

    offsets = jnp.cumsum(mask.astype(jnp.int32)) - 1
    n_valid = mask.sum().astype(jnp.int32)
    # if one batch holds more valid plies than the capacity, keep only the
    # LAST C (ring semantics); otherwise duplicate scatter indices would pick
    # an arbitrary winner independently per field, pairing boards with the
    # wrong policies/values
    mask = mask & (offsets >= n_valid - C)
    pos = (buffer.cursor + offsets) % C
    pos = jnp.where(mask, pos, C)  # trash slot

    return buffer.replace(
        me=buffer.me.at[pos].set(me),
        opp=buffer.opp.at[pos].set(opp),
        pi=buffer.pi.at[pos].set(pi),
        value=buffer.value.at[pos].set(value),
        cursor=(buffer.cursor + n_valid) % C,
        filled=jnp.minimum(buffer.filled + n_valid, C),
        total_added=buffer.total_added + n_valid,
    )


@functools.partial(jax.jit, static_argnames=("engine", "batch_size"))
def sample(
    buffer: ReplayBuffer,
    rng: jax.Array,
    engine: OthelloEngine,
    batch_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniform minibatch -> (features (B,S,S,3), pi (B,A), value (B,1)),
    matching the reference sample contract (buffer.py:59-85) with features
    recomputed from packed boards on device.

    Like the reference's ``random.sample`` (buffer.py:76), the minibatch is
    drawn WITHOUT replacement whenever the buffer holds at least
    ``batch_size`` valid entries: every valid slot gets an i.i.d. uniform
    key and the ``batch_size`` smallest keys win (a fixed-shape on-device
    equivalent of a partial Fisher-Yates shuffle). If the buffer is smaller
    than the batch — a state ``is_ready`` callers never sample from — it
    falls back to with-replacement draws rather than returning junk slots.
    """
    C = buffer.capacity
    valid = jnp.arange(C + 1) < buffer.filled
    keys = jnp.where(valid, jax.random.uniform(rng, (C + 1,)), 2.0)
    _, idx_noreplace = jax.lax.top_k(-keys, batch_size)
    idx_fallback = jax.random.randint(
        rng, (batch_size,), 0, jnp.maximum(buffer.filled, 1)
    )
    idx = jnp.where(buffer.filled >= batch_size, idx_noreplace, idx_fallback)
    me = buffer.me[idx]
    opp = buffer.opp[idx]
    from ..ops.bitboard import Board

    boards = Board(
        me=me,
        opp=opp,
        move_count=jnp.zeros((batch_size,), jnp.int32),
        passed=jnp.zeros((batch_size,), jnp.bool_),
    )
    feats = engine.features(boards)
    return feats, buffer.pi[idx], buffer.value[idx][:, None]


def is_ready(buffer: ReplayBuffer, min_size: int) -> bool:
    """Host-side readiness check (reference buffer.py:95-105)."""
    return int(buffer.filled) >= min_size


# ---------------------------------------------------------------------------
# Prioritized replay. The reference declares a PrioritizedReplayBuffer that
# silently falls back to uniform sampling (buffer.py:139-177, SURVEY.md §7
# quirk #9); this is a real proportional-prioritization implementation
# (priority ~ |value-target TD proxy|^alpha with importance weights), still
# fully on-device.
# ---------------------------------------------------------------------------


class PrioritizedReplayBuffer(ReplayBuffer):
    priority: jnp.ndarray  # (C+1,) float32, >= 0
    max_priority: jnp.ndarray  # () float32
    alpha: jnp.ndarray  # () float32


def create_prioritized(
    capacity: int, num_actions: int, alpha: float = 0.6
) -> PrioritizedReplayBuffer:
    base = create(capacity, num_actions)
    return PrioritizedReplayBuffer(
        **{f: getattr(base, f) for f in (
            "me", "opp", "pi", "value", "cursor", "filled", "total_added")},
        priority=jnp.zeros((capacity + 1,), jnp.float32),
        max_priority=jnp.float32(1.0),
        alpha=jnp.float32(alpha),
    )


@jax.jit
def add_prioritized(
    buffer: PrioritizedReplayBuffer, traj: Trajectory
) -> PrioritizedReplayBuffer:
    """New entries get max priority so everything is seen at least once."""
    C = buffer.capacity
    mask = traj.mask.reshape(-1)
    offsets = jnp.cumsum(mask.astype(jnp.int32)) - 1
    n_valid = mask.sum().astype(jnp.int32)
    mask = mask & (offsets >= n_valid - C)
    pos = jnp.where(mask, (buffer.cursor + offsets) % C, C)
    base = add(
        ReplayBuffer(
            me=buffer.me, opp=buffer.opp, pi=buffer.pi, value=buffer.value,
            cursor=buffer.cursor, filled=buffer.filled,
            total_added=buffer.total_added,
        ),
        traj,
    )
    prio = buffer.priority.at[pos].set(
        jnp.where(mask, buffer.max_priority, 0.0)
    )
    return PrioritizedReplayBuffer(
        **{f: getattr(base, f) for f in (
            "me", "opp", "pi", "value", "cursor", "filled", "total_added")},
        priority=prio,
        max_priority=buffer.max_priority,
        alpha=buffer.alpha,
    )


@functools.partial(jax.jit, static_argnames=("engine", "batch_size"))
def sample_prioritized(
    buffer: PrioritizedReplayBuffer,
    rng: jax.Array,
    engine: OthelloEngine,
    batch_size: int,
):
    """Proportional sampling: P(i) ~ priority_i^alpha. Returns
    (features, pi, value, idx, importance_weights)."""
    C = buffer.capacity
    valid = jnp.arange(C + 1) < buffer.filled
    p = jnp.where(valid, buffer.priority, 0.0) ** buffer.alpha
    p = jnp.where(valid & (p <= 0), 1e-6, p)  # unseen-but-valid guard
    total = jnp.maximum(p.sum(), 1e-8)
    idx = jax.random.choice(
        rng, C + 1, shape=(batch_size,), p=p / total, replace=True
    )
    from ..ops.bitboard import Board

    boards = Board(
        me=buffer.me[idx],
        opp=buffer.opp[idx],
        move_count=jnp.zeros((batch_size,), jnp.int32),
        passed=jnp.zeros((batch_size,), jnp.bool_),
    )
    feats = engine.features(boards)
    n = jnp.maximum(buffer.filled, 1).astype(jnp.float32)
    probs = (p / total)[idx]
    weights = 1.0 / jnp.maximum(n * probs, 1e-8)
    weights = weights / jnp.maximum(weights.max(), 1e-8)
    return feats, buffer.pi[idx], buffer.value[idx][:, None], idx, weights


@jax.jit
def update_priorities(
    buffer: PrioritizedReplayBuffer, idx: jnp.ndarray, td_error: jnp.ndarray
) -> PrioritizedReplayBuffer:
    prio = jnp.abs(td_error) + 1e-3
    return buffer.replace(
        priority=buffer.priority.at[idx].set(prio),
        max_priority=jnp.maximum(buffer.max_priority, prio.max()),
    )


@jax.jit
def statistics(buffer: ReplayBuffer) -> Dict[str, jnp.ndarray]:
    """size / fill rate / value mean+std over valid entries
    (reference buffer.py:107-136)."""
    C = buffer.capacity
    valid = jnp.arange(C + 1) < buffer.filled
    n = jnp.maximum(buffer.filled, 1).astype(jnp.float32)
    v = jnp.where(valid, buffer.value, 0.0)
    mean = v.sum() / n
    var = jnp.where(valid, (buffer.value - mean) ** 2, 0.0).sum() / n
    return {
        "size": buffer.filled,
        "capacity": jnp.int32(C),
        "fill_rate": buffer.filled.astype(jnp.float32) / C,
        "total_added": buffer.total_added,
        "value_mean": mean,
        "value_std": jnp.sqrt(var),
    }


# reference-name alias (buffer.py:107 get_statistics)
get_statistics = statistics

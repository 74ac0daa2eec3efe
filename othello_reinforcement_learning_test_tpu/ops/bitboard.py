"""Batched TPU-native Othello bitboard engine.

A from-scratch, fully vectorized JAX reimplementation of the capabilities of
the reference Cython engine (``/root/reference/src/cython/bitboard.pyx``):
boards are two 64-bit words (side-to-move / opponent) stored as uint32 pairs
(:mod:`.bits`), and every operation — legal-move generation, flip resolution,
stepping, terminal/winner detection, feature extraction, D4 symmetries — is
expressed as batched bit-parallel flood fills (Kogge-Stone style) with **no
per-square loops**, so thousands of games step in lockstep under ``jit``.

Board layout (same as reference, bitboard.pxd:18-22): bit ``i`` is square
``(row=i//8, col=i%8)``; col 0 prints as file A. The side to move always owns
``me``; :func:`step` swaps perspectives after every move including passes
(bitboard.pyx:195-247).

Rules variants
--------------
``rules="reference"`` (default) reproduces the reference engine *exactly*,
including its edge quirks, which we verified empirically against the compiled
reference (see ``tests/golden/reference_games.json``):

- A capturing ray whose bracketing own stone lies on the far edge file in the
  ray direction is NOT recognized (e.g. an eastward capture ending on file H
  fails), because the reference applies its pre-shift wrap mask *after* the
  shift (bitboard.pyx:88-117 with DIRECTION_MASKS at :28-38).
- A ray starting on the near edge file can WRAP to the next row (a move on H1
  may flip stones on row 2 via the "east" ray).

``rules="standard"`` uses the correct anti-wrap masks and plays standard
Othello. Training parity targets use ``reference``.

Board sizes other than 8 (e.g. the reference's aspirational 6x6,
``configs/debug_6x6.yaml``) embed the SxS board in the 8-wide bit layout with
a validity mask; out-of-board squares are never occupied or empty so floods
stop there naturally, and no wrap quirks apply (edge files of the 8x8 layout
are out of board). Action space is ``S*S + 1`` with action ``S*S`` = pass
(reference uses 64 squares + pass=64, bitboard.pyx:209-219).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import bits

FULL = 0xFFFFFFFFFFFFFFFF
FILE_A = 0x0101010101010101
FILE_H = 0x8080808080808080
NOT_A = FULL ^ FILE_A
NOT_H = FULL ^ FILE_H

# (delta, reference post-shift mask, standard post-shift mask).
# Reference order/comment: up, down, left, right, up-left, up-right,
# down-left, down-right (bitboard.pyx:20-38). The standard masks are the
# correct anti-wrap masks (a shift whose column delta is +1 can never
# legitimately land on file A, and vice versa).
_DIRECTIONS = (
    (-8, FULL, FULL),
    (8, FULL, FULL),
    (-1, NOT_A, NOT_H),
    (1, NOT_H, NOT_A),
    (-9, NOT_A, NOT_H),
    (-7, NOT_H, NOT_A),
    (7, NOT_A, NOT_H),
    (9, NOT_H, NOT_A),
)

# Max opponent-chain length a ray can traverse (a run of squares all inside
# any direction mask is at most 7 long on the 8-wide layout).
_FLOOD_ITERS = 6


class Board(struct.PyTreeNode):
    """Batch of Othello positions (struct-of-arrays pytree).

    ``me`` is always the side to move; all leading axes are batch axes.
    """

    me: jnp.ndarray  # (..., 2) uint32
    opp: jnp.ndarray  # (..., 2) uint32
    move_count: jnp.ndarray  # (...,) int32
    passed: jnp.ndarray  # (...,) bool

    @property
    def batch_shape(self):
        return self.move_count.shape


def _shift(x: jnp.ndarray, delta: int) -> jnp.ndarray:
    return bits.shl(x, delta) if delta > 0 else bits.shr(x, -delta)


class OthelloEngine:
    """Static-config engine: all methods are pure and jit/vmap friendly.

    Equality/hash by (size, rules) so instances can be jit static args.
    """

    def __init__(self, size: int = 8, rules: str = "reference"):
        assert 4 <= size <= 8 and size % 2 == 0, size
        assert rules in ("reference", "standard"), rules
        self.size = size
        self.rules = rules
        self.num_actions = size * size + 1
        self.pass_action = size * size

        valid = 0
        for r in range(size):
            for c in range(size):
                valid |= 1 << (r * 8 + c)
        self._valid_int = valid
        mask_idx = 1 if rules == "reference" else 2
        self._dirs = tuple((d[0], d[mask_idx]) for d in _DIRECTIONS)

        # Initial four stones in the center of the SxS board
        # (reference: D4,E5 white / E4,D5 black, black to move; bitboard.pyx:50-66).
        r0 = size // 2 - 1
        self._init_black = (1 << (r0 * 8 + r0 + 1)) | (1 << ((r0 + 1) * 8 + r0))
        self._init_white = (1 << (r0 * 8 + r0)) | (1 << ((r0 + 1) * 8 + r0 + 1))

        # Map from action index (row*size+col) to bit index (row*8+col).
        sq = np.arange(size * size)
        self._action_bit_np = (sq // size) * 8 + (sq % size)

    # -- hashing so the engine can be a jit static argument ---------------
    def __eq__(self, other):
        return (
            isinstance(other, OthelloEngine)
            and (self.size, self.rules) == (other.size, other.rules)
        )

    def __hash__(self):
        return hash((self.size, self.rules))

    def __repr__(self):
        return f"OthelloEngine(size={self.size}, rules={self.rules!r})"

    # -- state construction ------------------------------------------------
    def initial_state(self, batch_shape: Tuple[int, ...] = ()) -> Board:
        me = jnp.broadcast_to(bits.u64(self._init_black), (*batch_shape, 2))
        opp = jnp.broadcast_to(bits.u64(self._init_white), (*batch_shape, 2))
        return Board(
            me=me,
            opp=opp,
            move_count=jnp.zeros(batch_shape, jnp.int32),
            passed=jnp.zeros(batch_shape, jnp.bool_),
        )

    # -- core bit kernels ----------------------------------------------------
    def legal_squares(self, me: jnp.ndarray, opp: jnp.ndarray) -> jnp.ndarray:
        """Bitmask of legal placement squares (reference bitboard.pyx:135-158).

        Reverse flood: for each direction d, walk from own stones backwards
        through opponent chains; a landing on an empty square marks a legal
        move. Visited chain squares and the bracketing own stone carry the
        direction's post-shift mask — the landing square itself is unmasked —
        which reproduces the reference's per-square forward ray scan exactly
        (including its edge quirks under ``rules="reference"``).
        """
        valid = bits.u64(self._valid_int)
        empty = valid & ~(me | opp)
        legal = jnp.zeros_like(me)
        for delta, mask_int in self._dirs:
            m = bits.u64(mask_int)
            prop = opp & m
            y = _shift(me & m, -delta) & prop
            for _ in range(_FLOOD_ITERS):
                y = y | (_shift(y, -delta) & prop)
            legal = legal | (_shift(y, -delta) & empty)
        return legal

    def flips(self, me: jnp.ndarray, opp: jnp.ndarray, move: jnp.ndarray) -> jnp.ndarray:
        """All stones flipped by placing on one-hot bit ``move``
        (reference bitboard.pyx:71-133). ``move`` may be zero (no flips)."""
        total = jnp.zeros_like(me)
        for delta, mask_int in self._dirs:
            m = bits.u64(mask_int)
            prop = opp & m
            f = _shift(move, delta) & prop
            for _ in range(_FLOOD_ITERS):
                f = f | (_shift(f, delta) & prop)
            terminator = _shift(f, delta) & m & ~f
            ok = bits.any_set(terminator & me)
            total = total | jnp.where(ok[..., None], f, jnp.zeros_like(f))
        return total

    # -- action mapping ------------------------------------------------------
    def action_to_bitpos(self, action: jnp.ndarray) -> jnp.ndarray:
        """Action index (row*S+col) -> bit index (row*8+col); pass -> -1."""
        s = self.size
        pos = (action // s) * 8 + (action % s)
        return jnp.where(action >= self.pass_action, -1, pos).astype(jnp.int32)

    def squares_to_actions(self, mask: jnp.ndarray) -> jnp.ndarray:
        """Square bitmask (..., 2) -> per-action {0,1} planes (..., S*S)."""
        planes = bits.to_planes(mask, jnp.bool_)
        grid = planes.reshape(*planes.shape[:-1], 8, 8)
        return grid[..., : self.size, : self.size].reshape(
            *planes.shape[:-1], self.size * self.size
        )

    def legal_actions(self, state: Board) -> jnp.ndarray:
        """(..., A) bool legal-action mask. Pass (action S*S) is legal iff no
        square is playable (reference bitboard.pyx:177-179, 209-219)."""
        legal_sq = self.legal_squares(state.me, state.opp)
        sq_mask = self.squares_to_actions(legal_sq)
        can_pass = ~jnp.any(sq_mask, axis=-1, keepdims=True)
        return jnp.concatenate([sq_mask, can_pass], axis=-1)

    # -- stepping -------------------------------------------------------------
    def step(
        self,
        state: Board,
        action: jnp.ndarray,
        pass_legal: jnp.ndarray = None,
    ) -> Tuple[Board, jnp.ndarray]:
        """Apply ``action`` ((...,) int32 in [0, S*S]); returns (new, valid).

        Invalid actions leave the board unchanged and return valid=False,
        mirroring reference ``make_move`` returning False (bitboard.pyx:195-247).
        Pass is valid only when no placement is legal; both placement and pass
        swap perspective and increment ``move_count``.

        ``pass_legal`` ((...,) bool, optional): callers that already ran
        :meth:`observe`/:meth:`legal_actions` can pass the precomputed
        pass-legality to skip the internal legal-move flood (the only use of
        it here) — the hot-loop fast path.
        """
        is_pass = action == self.pass_action
        move = bits.bit(self.action_to_bitpos(action))
        if pass_legal is None:
            pass_legal = bits.is_zero(self.legal_squares(state.me, state.opp))
        f = self.flips(state.me, state.opp, move)
        occupied = bits.any_set((state.me | state.opp) & move)
        valid_place = (~is_pass) & bits.any_set(f) & ~occupied
        valid_pass = is_pass & pass_legal
        valid = valid_place | valid_pass

        placed = jnp.where(valid[..., None], move, jnp.zeros_like(move))
        flip = jnp.where(valid[..., None], f, jnp.zeros_like(f))
        new_me = jnp.where(valid[..., None], state.opp & ~flip, state.me)
        new_opp = jnp.where(valid[..., None], state.me | placed | flip, state.opp)
        return (
            Board(
                me=new_me,
                opp=new_opp,
                move_count=state.move_count + valid.astype(jnp.int32),
                passed=jnp.where(valid, is_pass, state.passed),
            ),
            valid,
        )

    # -- termination ----------------------------------------------------------
    def is_terminal(self, state: Board) -> jnp.ndarray:
        """True when neither side can place (reference bitboard.pyx:249-264)."""
        a = bits.is_zero(self.legal_squares(state.me, state.opp))
        b = bits.is_zero(self.legal_squares(state.opp, state.me))
        return a & b

    def winner(self, state: Board) -> jnp.ndarray:
        """+1 side-to-move wins, -1 loses, 0 draw (bitboard.pyx:266-282)."""
        diff = bits.popcount(state.me) - bits.popcount(state.opp)
        return jnp.sign(diff).astype(jnp.int32)

    def stone_counts(self, state: Board) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return bits.popcount(state.me), bits.popcount(state.opp)

    # -- fused observation ------------------------------------------------------
    def observe(self, state: Board, with_features: bool = False):
        """One-pass observation for hot loops: computes each side's legal
        floods exactly once and derives everything consumers need.

        Returns ``(legal_actions (..., A) bool, terminal (...,), winner (...,))``
        or, with ``with_features``, ``(..., features (..., S, S, 3))`` too.
        Replaces separate ``legal_actions`` + ``is_terminal`` + ``winner`` (+
        ``features``) calls, which would redo the 8-direction flood up to 5x.
        """
        legal_me = self.legal_squares(state.me, state.opp)
        legal_opp = self.legal_squares(state.opp, state.me)
        sq_mask = self.squares_to_actions(legal_me)
        me_stuck = bits.is_zero(legal_me)
        terminal = me_stuck & bits.is_zero(legal_opp)
        legal_actions = jnp.concatenate([sq_mask, me_stuck[..., None]], axis=-1)
        winner = jnp.sign(
            bits.popcount(state.me) - bits.popcount(state.opp)
        ).astype(jnp.int32)
        if not with_features:
            return legal_actions, terminal, winner

        def grid(word):
            planes = bits.to_planes(word, jnp.float32)
            g = planes.reshape(*planes.shape[:-1], 8, 8)
            return g[..., : self.size, : self.size]

        feats = jnp.stack(
            [grid(state.me), grid(state.opp), grid(legal_me)], axis=-1
        )
        return legal_actions, terminal, winner, feats

    # -- NN features ------------------------------------------------------------
    def features(self, state: Board) -> jnp.ndarray:
        """(..., S, S, 3) float32: own stones / opp stones / legal mask.

        NHWC (TPU-native) rather than the reference's CHW (bitboard.pyx:300-323);
        channel semantics identical.
        """
        legal_sq = self.legal_squares(state.me, state.opp)

        def grid(word):
            planes = bits.to_planes(word, jnp.float32)
            g = planes.reshape(*planes.shape[:-1], 8, 8)
            return g[..., : self.size, : self.size]

        return jnp.stack([grid(state.me), grid(state.opp), grid(legal_sq)], axis=-1)

    # -- symmetries ---------------------------------------------------------------
    def symmetries(
        self, features: jnp.ndarray, pi: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """All 8 D4-symmetric (features, policy) pairs, stacked on a new axis
        before the spatial axes. Order matches the reference: for k in 0..3,
        rot90(k) then rot90(k)+horizontal flip (bitboard.pyx:338-370).

        features: (..., S, S, C); pi: (..., S*S+1).
        """
        s = self.size
        pi_grid = pi[..., : s * s].reshape(*pi.shape[:-1], s, s)
        pi_pass = pi[..., s * s :]
        feats, pis = [], []
        for k in range(4):
            fb = jnp.rot90(features, k, axes=(-3, -2))
            pb = jnp.rot90(pi_grid, k, axes=(-2, -1))
            for flip in (False, True):
                fb2 = jnp.flip(fb, axis=-2) if flip else fb
                pb2 = jnp.flip(pb, axis=-1) if flip else pb
                feats.append(fb2)
                pis.append(
                    jnp.concatenate(
                        [pb2.reshape(*pi.shape[:-1], s * s), pi_pass], axis=-1
                    )
                )
        axis = features.ndim - 3
        return jnp.stack(feats, axis=axis), jnp.stack(pis, axis=pi.ndim - 1)

    # -- host-side pretty printing ---------------------------------------------
    def to_string(self, state: Board) -> str:
        """ASCII board for a single (unbatched) state; ● = side to move."""
        me = np.asarray(bits.to_planes(state.me, jnp.int32))
        opp = np.asarray(bits.to_planes(state.opp, jnp.int32))
        assert me.shape == (64,), "to_string takes a single unbatched board"
        lines = ["  " + " ".join("ABCDEFGH"[: self.size])]
        for r in range(self.size):
            row = [f"{r + 1} "]
            for c in range(self.size):
                i = r * 8 + c
                row.append("● " if me[i] else ("○ " if opp[i] else ". "))
            lines.append("".join(row).rstrip())
        return "\n".join(lines)


@functools.lru_cache(maxsize=None)
def get_engine(size: int = 8, rules: str = "reference") -> OthelloEngine:
    return OthelloEngine(size=size, rules=rules)

"""ctypes bindings for the native C++ host engine (``csrc/``).

The on-device compute path is the JAX engine (:mod:`.bitboard`); this module
exposes the C++ library for host-side uses — low-latency single-game stepping
in interactive frontends, cross-implementation parity checks, and a CPU
throughput baseline comparable to the reference's Cython engine
(``/root/reference/src/cython/bitboard.pyx``, claims 10k+ games/sec).

The shared library is built on demand with ``g++`` (see csrc/Makefile); when
no compiler is available, :func:`load` raises and callers fall back to the
JAX engine.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_NAME = "libothello_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

RULES = {"reference": 0, "standard": 1}


def build(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    csrc = os.path.abspath(_CSRC)
    lib_path = os.path.join(csrc, _LIB_NAME)
    src_path = os.path.join(csrc, "othello_native.cpp")
    if force or not os.path.exists(lib_path) or (
        os.path.getmtime(src_path) > os.path.getmtime(lib_path)
    ):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", lib_path, src_path],
            check=True,
            capture_output=True,
        )
    return lib_path


def load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = ctypes.CDLL(build())
        u64, i32, i64 = ctypes.c_uint64, ctypes.c_int, ctypes.c_longlong
        lib.oth_legal.restype = u64
        lib.oth_legal.argtypes = [u64, u64, i32]
        lib.oth_flips.restype = u64
        lib.oth_flips.argtypes = [u64, u64, i32, i32]
        lib.oth_popcount.restype = i32
        lib.oth_popcount.argtypes = [u64]
        lib.oth_step.restype = i32
        lib.oth_step.argtypes = [ctypes.POINTER(u64), i32, i32]
        lib.oth_is_terminal.restype = i32
        lib.oth_is_terminal.argtypes = [u64, u64, i32]
        lib.oth_random_playouts.restype = i64
        lib.oth_random_playouts.argtypes = [
            i64, u64, i32,
            ctypes.POINTER(i64), ctypes.POINTER(i64), ctypes.POINTER(i64),
        ]
        lib.oth_best_move.restype = i32
        lib.oth_best_move.argtypes = [u64, u64, i32, i32, i32,
                                      ctypes.POINTER(i32)]
        _lib = lib
        return lib


def best_move(me: int, opp: int, depth: int = 6, exact_empties: int = 12,
              rules: str = "reference") -> Tuple[int, int]:
    """Alpha-beta best action for the side to move (8x8): ``(action,
    negamax score)``; action 64 = pass. Positions with ≤ ``exact_empties``
    empty squares are solved exactly by disc differential."""
    lib = load()
    score = ctypes.c_int()
    action = lib.oth_best_move(me, opp, int(depth), int(exact_empties),
                               RULES[rules], ctypes.byref(score))
    return int(action), int(score.value)


def available() -> bool:
    try:
        load()
        return True
    except Exception:  # noqa: BLE001 — no compiler / load failure
        return False


class NativeBoard:
    """Host-side single-game board with the reference ``OthelloBitboard``
    API surface (bitboard.pxd:38-48): reset / get_legal_moves /
    get_legal_moves_bits / make_move / is_terminal / get_winner /
    get_stone_counts / get_tensor_input / copy / get_symmetries / to_string.
    8x8 only (like the reference's native engine)."""

    def __init__(self, rules: str = "reference"):
        self._lib = load()
        self._rules = RULES[rules]
        self.rules = rules
        self.reset()

    def reset(self) -> None:
        self.self_board = (1 << 28) | (1 << 35)
        self.opp_board = (1 << 27) | (1 << 36)
        self.move_count = 0
        self.passed = False

    def get_legal_moves_bits(self) -> int:
        return int(self._lib.oth_legal(self.self_board, self.opp_board,
                                       self._rules))

    def get_legal_moves(self) -> List[int]:
        bits_ = self.get_legal_moves_bits()
        if bits_ == 0:
            return [64]
        return [i for i in range(64) if bits_ >> i & 1]

    def make_move(self, pos: int) -> bool:
        boards = (ctypes.c_uint64 * 2)(self.self_board, self.opp_board)
        if pos == 64:
            ok = self._lib.oth_step(boards, 64, self._rules)
            if ok:
                self.self_board, self.opp_board = boards[0], boards[1]
                self.move_count += 1
                self.passed = True
            return bool(ok)
        if not 0 <= pos <= 63:
            return False
        ok = self._lib.oth_step(boards, pos, self._rules)
        if ok:
            self.self_board, self.opp_board = boards[0], boards[1]
            self.move_count += 1
            self.passed = False
        return bool(ok)

    def is_terminal(self) -> bool:
        return bool(self._lib.oth_is_terminal(self.self_board, self.opp_board,
                                              self._rules))

    def get_winner(self) -> int:
        a = self._lib.oth_popcount(self.self_board)
        b = self._lib.oth_popcount(self.opp_board)
        return (a > b) - (a < b)

    def get_stone_counts(self) -> Tuple[int, int]:
        return (
            int(self._lib.oth_popcount(self.self_board)),
            int(self._lib.oth_popcount(self.opp_board)),
        )

    def get_tensor_input(self) -> np.ndarray:
        """(8, 8, 3) float32 NHWC: own / opp / legal (reference emits CHW,
        bitboard.pyx:300-323; the JAX model consumes NHWC)."""
        out = np.zeros((8, 8, 3), np.float32)
        legal = self.get_legal_moves_bits()
        for i in range(64):
            r, c = divmod(i, 8)
            if self.self_board >> i & 1:
                out[r, c, 0] = 1.0
            if self.opp_board >> i & 1:
                out[r, c, 1] = 1.0
            if legal >> i & 1:
                out[r, c, 2] = 1.0
        return out

    def copy(self) -> "NativeBoard":
        nb = NativeBoard.__new__(NativeBoard)
        nb._lib = self._lib
        nb._rules = self._rules
        nb.rules = self.rules
        nb.self_board = self.self_board
        nb.opp_board = self.opp_board
        nb.move_count = self.move_count
        nb.passed = self.passed
        return nb

    def get_symmetries(self, pi: np.ndarray) -> List[Tuple[np.ndarray, np.ndarray]]:
        """8 D4-symmetric (tensor, pi) pairs, reference ordering
        (bitboard.pyx:338-370)."""
        board = self.get_tensor_input()
        pi_grid = np.asarray(pi[:64], np.float32).reshape(8, 8)
        out = []
        for k in range(4):
            rb = np.rot90(board, k, axes=(0, 1))
            rp = np.rot90(pi_grid, k)
            for flip in (False, True):
                b2 = np.flip(rb, axis=1) if flip else rb
                p2 = np.flip(rp, axis=1) if flip else rp
                new_pi = np.zeros(65, np.float32)
                new_pi[:64] = p2.reshape(-1)
                new_pi[64] = pi[64]
                out.append((b2.copy(), new_pi))
        return out

    def to_string(self) -> str:
        lines = ["  A B C D E F G H"]
        for r in range(8):
            row = [f"{r + 1} "]
            for c in range(8):
                i = r * 8 + c
                row.append(
                    "● " if self.self_board >> i & 1
                    else "○ " if self.opp_board >> i & 1 else ". ")
            lines.append("".join(row).rstrip())
        return "\n".join(lines)

    __repr__ = to_string


def random_playout_benchmark(
    n_games: int, seed: int = 1, rules: str = "reference"
) -> dict:
    """Native random-vs-random playout throughput (the reference
    ``benchmark.py`` workload on the C++ engine)."""
    import time

    lib = load()
    bw = ctypes.c_longlong()
    ww = ctypes.c_longlong()
    dr = ctypes.c_longlong()
    t0 = time.perf_counter()
    moves = lib.oth_random_playouts(
        n_games, seed, RULES[rules], ctypes.byref(bw), ctypes.byref(ww),
        ctypes.byref(dr),
    )
    dt = time.perf_counter() - t0
    return {
        "games": n_games,
        "moves": int(moves),
        "seconds": dt,
        "games_per_sec": n_games / dt,
        "moves_per_sec": moves / dt,
        "black_wins": bw.value,
        "white_wins": ww.value,
        "draws": dr.value,
    }

"""Native C++ engine tests: golden parity with the reference, random
cross-checks against the JAX engine, and throughput sanity."""

import json
import os
import random

import numpy as np
import pytest

from othello_reinforcement_learning_test_tpu.ops import native

if not native.available():  # pragma: no cover - environment dependent
    pytest.skip("no C++ toolchain available", allow_module_level=True)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "reference_games.json")


def test_golden_trajectories_native():
    with open(GOLDEN) as f:
        golden = json.load(f)
    for game in golden["games"]:
        b = native.NativeBoard("reference")
        for st in game["steps"]:
            assert b.make_move(st["action"])
            assert b.self_board == st["me"]
            assert b.opp_board == st["opp"]
            assert b.move_count == st["move_count"]
            assert b.passed == st["passed"]
            assert b.get_legal_moves_bits() == st["legal_bits"]
        assert b.is_terminal()
        assert b.get_winner() == game["winner"]
        assert list(b.get_stone_counts()) == game["counts"]


def test_golden_probes_native():
    with open(GOLDEN) as f:
        golden = json.load(f)
    for p in golden["probes"]:
        b = native.NativeBoard("reference")
        b.self_board, b.opp_board = p["me"], p["opp"]
        assert b.get_legal_moves_bits() == p["legal_bits"], p["desc"]
        assert b.is_terminal() == p["is_terminal"], p["desc"]


def test_cross_check_vs_jax_engine():
    """Random games: the C++ and JAX engines must agree position-by-position
    for both rules variants (two independent implementations)."""
    import jax.numpy as jnp

    from othello_reinforcement_learning_test_tpu.ops import bits
    from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine

    for rules in ("reference", "standard"):
        eng = get_engine(8, rules)
        rng = random.Random(7)
        for _ in range(3):
            nb = native.NativeBoard(rules)
            s = eng.initial_state(())
            while not nb.is_terminal():
                legal_native = nb.get_legal_moves_bits()
                legal_jax = int(bits.to_uint64_np(eng.legal_squares(s.me, s.opp)))
                assert legal_native == legal_jax
                moves = nb.get_legal_moves()
                a = rng.choice(moves)
                assert nb.make_move(a)
                s, ok = eng.step(s, jnp.asarray(a, jnp.int32))
                assert bool(ok)
                assert nb.self_board == int(bits.to_uint64_np(s.me))
                assert nb.opp_board == int(bits.to_uint64_np(s.opp))
            assert bool(eng.is_terminal(s))
            assert nb.get_winner() == int(eng.winner(s))


def test_reference_api_surface():
    b = native.NativeBoard()
    assert sorted(b.get_legal_moves()) == [19, 26, 37, 44]
    t = b.get_tensor_input()
    assert t.shape == (8, 8, 3) and t[..., 2].sum() == 4
    c = b.copy()
    assert b.make_move(19)
    assert c.self_board != b.self_board  # deep copy
    syms = c.get_symmetries(np.full(65, 1 / 65, np.float32))
    assert len(syms) == 8
    assert "●" in b.to_string()


def test_native_throughput():
    """The C++ engine must clear the reference's own pass bar
    (>=5000 games/sec, reference benchmark.py:91-95) with margin."""
    out = native.random_playout_benchmark(2000, seed=3)
    assert out["games"] == 2000
    assert out["black_wins"] + out["white_wins"] + out["draws"] == 2000
    assert 50 <= out["moves"] / out["games"] <= 70
    assert out["games_per_sec"] > 5000, out

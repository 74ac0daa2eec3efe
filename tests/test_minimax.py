"""NativeMinimaxPlayer — the C++ alpha-beta baseline opponent.

The strong classical anchor the reference's EdaxPlayer stub reached for
(/root/reference/src/eval/players.py:226-262, random fallback): search
correctness (legality, determinism, corner tactics, exact endgame vs brute
force) and arena integration/strength on CPU.
"""

import jax
import numpy as np
import pytest

from othello_reinforcement_learning_test_tpu.evaluation.arena import Arena
from othello_reinforcement_learning_test_tpu.evaluation.players import (
    GreedyPlayer,
    NativeMinimaxPlayer,
    RandomPlayer,
)
from othello_reinforcement_learning_test_tpu.ops import native
from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable (no compiler)"
)


@pytest.fixture(scope="module")
def engine():
    return get_engine(8, "reference")


INITIAL_ME = (1 << 28) | (1 << 35)
INITIAL_OPP = (1 << 27) | (1 << 36)


def test_best_move_legal_and_deterministic():
    legal = native.load().oth_legal(INITIAL_ME, INITIAL_OPP, 0)
    for depth in (1, 2, 4, 6):
        a, score = native.best_move(INITIAL_ME, INITIAL_OPP, depth=depth,
                                    exact_empties=0)
        assert legal >> a & 1, (depth, a)
        a2, score2 = native.best_move(INITIAL_ME, INITIAL_OPP, depth=depth,
                                      exact_empties=0)
        assert (a, score) == (a2, score2)


def test_pass_when_no_legal_move():
    # lone black stone in a white-free corner: nothing to flip anywhere
    a, _ = native.best_move(1, 0, depth=4, exact_empties=0)
    assert a == 64


def test_takes_offered_corner():
    """White row a8..c8 = opp opp me with empty a1-corner capture for black:
    black h1? Construct directly: me on c1 (pos 2), opp on b1 (pos 1),
    a1 (pos 0) empty -> playing a1 flips b1 and lands the corner."""
    me = 1 << 2
    opp = 1 << 1
    legal = native.load().oth_legal(me, opp, 0)
    assert legal >> 0 & 1  # a1 available
    a, score = native.best_move(me, opp, depth=2, exact_empties=0)
    assert a == 0  # corner is the dominant choice of the weight table


def _passed(board: native.NativeBoard) -> native.NativeBoard:
    """The position after a pass: sides swap. Built directly (the engine's
    make_move(64) rightly refuses a pass while the legal mask is nonzero,
    which the zero-flip quirk branch below needs)."""
    nxt = board.copy()
    nxt.self_board, nxt.opp_board = nxt.opp_board, nxt.self_board
    nxt.move_count += 1
    nxt.passed = True
    return nxt


def _brute_force_score(board: native.NativeBoard, passed: bool = False) -> int:
    """Negamax over the full remaining game, disc-differential terminal
    scoring identical to the C++ (WIN_BASE +/- diff)."""
    legal = board.get_legal_moves_bits()
    if legal == 0:
        opp_legal = native.load().oth_legal(
            board.opp_board, board.self_board, native.RULES[board.rules]
        )
        if passed or opp_legal == 0:
            me, op = board.get_stone_counts()
            d = me - op
            return (10000 + d) if d > 0 else (-10000 + d) if d < 0 else 0
        return -_brute_force_score(_passed(board), passed=True)
    best = None
    for a in range(64):
        if not legal >> a & 1:
            continue
        nxt = board.copy()
        if not nxt.make_move(a):
            continue
        v = -_brute_force_score(nxt)
        if best is None or v > best:
            best = v
    if best is None:
        # quirk: legal mask had only zero-flip squares — the C++ search
        # treats this as a pass (never observed in 300k random positions)
        if passed:
            me, op = board.get_stone_counts()
            d = me - op
            return (10000 + d) if d > 0 else (-10000 + d) if d < 0 else 0
        return -_brute_force_score(_passed(board), passed=True)
    return best


def _random_position(seed: int, target_empties: int) -> native.NativeBoard:
    rng = np.random.RandomState(seed)
    b = native.NativeBoard()
    while not b.is_terminal():
        empties = 64 - sum(b.get_stone_counts())
        if empties <= target_empties:
            break
        moves = b.get_legal_moves()
        b.make_move(moves[rng.randint(len(moves))])
    return b


@pytest.mark.parametrize("seed", [0, 1, 2, 51])  # 51 reaches a forced-pass
def test_exact_endgame_matches_brute_force(seed):  # root (score regression)
    b = _random_position(seed, target_empties=6)
    if b.is_terminal():
        pytest.skip("random line ended early")
    expect = _brute_force_score(b)
    a, score = native.best_move(b.self_board, b.opp_board, depth=1,
                                exact_empties=8)
    assert score == expect
    # and the chosen move achieves it
    nxt = b.copy()
    assert nxt.make_move(a)
    assert -_brute_force_score(nxt) == expect


def test_requires_8x8():
    with pytest.raises(ValueError):
        NativeMinimaxPlayer(get_engine(6, "reference"))


def test_arena_strength_vs_baselines(engine):
    """Depth-4 minimax crushes Random and Greedy through the jitted
    lockstep arena (io_callback path; randomized openings give game
    diversity between two deterministic players)."""
    mm = NativeMinimaxPlayer(engine, depth=4, exact_empties=10)
    arena = Arena(engine)
    s_rand = arena.play_matches(mm, RandomPlayer(engine), num_games=8,
                                rng=jax.random.PRNGKey(0))
    assert s_rand.wins >= 7, (s_rand.wins, s_rand.losses, s_rand.draws)
    s_greedy = arena.play_matches(mm, GreedyPlayer(engine), num_games=8,
                                  rng=jax.random.PRNGKey(1),
                                  opening_random_plies=4)
    assert s_greedy.wins >= 6, (s_greedy.wins, s_greedy.losses)

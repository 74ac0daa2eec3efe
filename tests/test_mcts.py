"""MCTS tests: integration with the real engine and a tiny real network
(no mocks), mirroring reference tests/test_mcts.py coverage (SURVEY.md §4)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from othello_reinforcement_learning_test_tpu.models import (
    OthelloResNet,
    init_variables,
)
from othello_reinforcement_learning_test_tpu.ops import bits
from othello_reinforcement_learning_test_tpu.ops.bitboard import Board, get_engine
from othello_reinforcement_learning_test_tpu.search import mcts


@pytest.fixture(scope="module")
def setup():
    eng = get_engine(8, "reference")
    model = OthelloResNet(num_blocks=1, num_filters=8)
    variables = init_variables(model, jax.random.PRNGKey(0))

    def apply_fn(x):
        return model.apply(variables, x, train=False)

    return eng, apply_fn


@pytest.fixture(scope="module")
def searched(setup):
    eng, apply_fn = setup
    boards = eng.initial_state((4,))
    run = jax.jit(
        functools.partial(
            mcts.search, eng, apply_fn, num_simulations=16, add_noise=False
        )
    )
    return eng, run(boards=boards, rng=jax.random.PRNGKey(1))


def test_visit_counts_basic(searched):
    eng, res = searched
    counts = np.asarray(res.visit_counts)
    legal = np.asarray(res.legal)
    assert counts.shape == (4, 65)
    # all 16 simulations land in root children
    np.testing.assert_array_equal(counts.sum(-1), 16.0)
    assert (counts[~legal] == 0).all()
    # opening position: only the 4 legal moves get visits
    assert (counts[0] > 0).sum() <= 4


def test_action_probs_normalized(searched):
    _, res = searched
    probs = np.asarray(
        mcts.action_probs_from_counts(res.visit_counts, res.legal, 1.0)
    )
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    assert (probs[~np.asarray(res.legal)] == 0).all()


def test_temperature_zero_one_hot(searched):
    _, res = searched
    probs = np.asarray(
        mcts.action_probs_from_counts(res.visit_counts, res.legal, 0.0)
    )
    assert ((probs == 0) | (probs == 1)).all()
    np.testing.assert_array_equal(probs.sum(-1), 1.0)
    np.testing.assert_array_equal(
        probs.argmax(-1), np.asarray(res.visit_counts).argmax(-1)
    )


def test_best_action_legal(searched):
    _, res = searched
    a = np.asarray(mcts.best_action(res.visit_counts, res.legal))
    legal = np.asarray(res.legal)
    for i in range(4):
        assert legal[i, a[i]]


def test_dirichlet_noise_mixing():
    rng = jax.random.PRNGKey(0)
    legal = jnp.zeros((2, 65), jnp.bool_).at[:, :4].set(True)
    prior = jnp.where(legal, 0.25, 0.0)
    noised = mcts.add_dirichlet_noise(rng, prior, legal, 0.3, 0.25)
    n = np.asarray(noised)
    np.testing.assert_allclose(n.sum(-1), 1.0, rtol=1e-5)
    assert (n[~np.asarray(legal)] == 0).all()
    assert not np.allclose(n, np.asarray(prior))


def test_noise_changes_search(setup):
    eng, apply_fn = setup
    boards = eng.initial_state((2,))
    run = jax.jit(
        functools.partial(
            mcts.search, eng, apply_fn, num_simulations=8, add_noise=True
        )
    )
    res = run(boards=boards, rng=jax.random.PRNGKey(2))
    assert np.asarray(res.visit_counts).sum() == 16.0


def test_terminal_value_propagation(setup):
    """Position with a single legal move that ends the game: search must
    value that move with the exact game outcome."""
    eng, apply_fn = setup
    # me at C1(2), opp at B1(1): only legal move is A1(0); after it the mover
    # owns all three stones -> terminal, mover wins.
    me = jnp.asarray(bits.from_uint64_np(np.uint64(1 << 2)))[None]
    opp = jnp.asarray(bits.from_uint64_np(np.uint64(1 << 1)))[None]
    boards = Board(
        me=me,
        opp=opp,
        move_count=jnp.zeros((1,), jnp.int32),
        passed=jnp.zeros((1,), jnp.bool_),
    )
    res = mcts.search(
        eng, apply_fn, boards, jax.random.PRNGKey(0), num_simulations=8
    )
    counts = np.asarray(res.visit_counts)[0]
    assert counts[0] == 8  # all sims go through the only legal move
    np.testing.assert_allclose(np.asarray(res.q_values)[0, 0], 1.0)
    # root value averages the NN root estimate with 8 exact win backups
    assert np.asarray(res.root_value)[0] > 0.5


def test_action_evaluations_contract(searched):
    _, res = searched
    ev = np.asarray(mcts.action_evaluations(res))
    legal = np.asarray(res.legal)
    counts = np.asarray(res.visit_counts)
    visited = (counts > 0) & legal
    assert ((ev[visited] >= 0) & (ev[visited] <= 100)).all()
    assert (ev[~visited] == -1).all()


def test_full_game_via_mcts(setup):
    """Play a full game with jitted MCTS at every move; must terminate."""
    eng, apply_fn = setup
    B = 2

    @jax.jit
    def play(rng):
        boards = eng.initial_state((B,))

        def body(carry):
            boards, rng, t = carry
            rng, k1, k2 = jax.random.split(rng, 3)
            res = mcts.search(eng, apply_fn, boards, k1, num_simulations=8)
            probs = mcts.action_probs_from_counts(res.visit_counts, res.legal, 1.0)
            a = jax.random.categorical(k2, jnp.log(probs + 1e-12), axis=-1)
            done = eng.is_terminal(boards)
            nb, _ = eng.step(boards, a.astype(jnp.int32))
            boards = jax.tree.map(
                lambda n, o: jnp.where(
                    done.reshape(done.shape + (1,) * (n.ndim - done.ndim)), o, n
                ),
                nb,
                boards,
            )
            return boards, rng, t + 1

        def cond(carry):
            boards, rng, t = carry
            return (~eng.is_terminal(boards)).any() & (t < 130)

        boards, _, t = jax.lax.while_loop(cond, body, (boards, rng, 0))
        return boards, t

    boards, t = play(jax.random.PRNGKey(3))
    assert bool(eng.is_terminal(boards).all())
    total = np.asarray(sum(eng.stone_counts(boards)))
    assert (total <= 64).all()

"""Reference-style object facade tests (MCTS / SelfPlayWorker /
Arena.play_game / buffer.get_statistics)."""

import numpy as np
import jax

from othello_reinforcement_learning_test_tpu.evaluation import (
    Arena,
    GreedyPlayer,
    RandomPlayer,
)
from othello_reinforcement_learning_test_tpu.models import (
    OthelloResNet,
    init_variables,
)
from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine
from othello_reinforcement_learning_test_tpu.search import MCTS
from othello_reinforcement_learning_test_tpu.train import (
    SelfPlayWorker,
    apply_eval,
    buffer as buffer_lib,
)


def _setup():
    eng = get_engine(8)
    model = OthelloResNet(num_blocks=1, num_filters=8)
    variables = init_variables(model, jax.random.PRNGKey(0))
    return eng, model, variables


def test_mcts_facade():
    eng, model, variables = _setup()
    m = MCTS(eng, apply_eval(model), variables, num_simulations=4)
    boards = eng.initial_state((2,))
    rng = jax.random.PRNGKey(1)
    probs = np.asarray(m.get_action_probs(boards, rng))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    a = np.asarray(m.get_best_action(boards, rng))
    legal = np.asarray(eng.legal_actions(boards))
    assert legal[0, a[0]] and legal[1, a[1]]
    ev = np.asarray(m.get_action_evaluations(boards, rng))
    assert ev.shape == (2, 65)


def test_self_play_worker_facade():
    eng, model, variables = _setup()
    w = SelfPlayWorker(eng, apply_eval(model), variables, num_simulations=2)
    traj = w.execute_episodes(2, jax.random.PRNGKey(2))
    assert traj.mask.shape[0] == 2
    single = w.execute_episode(jax.random.PRNGKey(3))
    assert single.mask.shape[0] == 1
    assert int(single.num_moves[0]) >= 55


def test_arena_play_game():
    eng, _, _ = _setup()
    arena = Arena(eng)
    r = arena.play_game(RandomPlayer(eng), GreedyPlayer(eng),
                        jax.random.PRNGKey(4))
    assert r.player1_color == "black"
    assert r.winner in (-1, 0, 1)
    r2 = arena.play_game(RandomPlayer(eng), GreedyPlayer(eng),
                         jax.random.PRNGKey(5), player1_color="white")
    assert r2.player1_color == "white"


def test_buffer_get_statistics_alias():
    buf = buffer_lib.create(8, 65)
    stats = jax.device_get(buffer_lib.get_statistics(buf))
    assert stats["size"] == 0

"""Evaluation tests: player legality, arena invariants, greedy sanity
(mirrors reference tests/test_eval.py coverage, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from othello_reinforcement_learning_test_tpu.evaluation import (
    Arena,
    GreedyPlayer,
    MCTSPlayer,
    RandomPlayer,
    evaluate_player,
)
from othello_reinforcement_learning_test_tpu.models import OthelloResNet, init_variables
from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine
from othello_reinforcement_learning_test_tpu.train.trainer import apply_eval


@pytest.fixture(scope="module")
def eng():
    return get_engine(8, "reference")


def test_players_move_legally(eng):
    boards = eng.initial_state((16,))
    legal = np.asarray(eng.legal_actions(boards))
    for player in (RandomPlayer(eng), GreedyPlayer(eng)):
        a = np.asarray(player.act(jax.random.PRNGKey(0), boards))
        for i in range(16):
            assert legal[i, a[i]], (player.name, i, a[i])


def test_greedy_picks_max_flips(eng):
    """Opening: all four moves flip exactly one stone -> greedy takes the
    lowest-index (first-max) like the reference's in-order scan."""
    boards = eng.initial_state((2,))
    a = np.asarray(GreedyPlayer(eng).act(jax.random.PRNGKey(0), boards))
    assert (a == 19).all()  # D3 is the lowest-index legal opening move


def test_arena_invariants(eng):
    summary = Arena(eng).play_matches(
        RandomPlayer(eng), GreedyPlayer(eng), 16, jax.random.PRNGKey(1)
    )
    assert summary.wins + summary.losses + summary.draws == 16
    assert 0.0 <= summary.win_rate <= 1.0
    for r in summary.results:
        assert r.player1_score + r.player2_score <= 64
        assert r.winner in (-1, 0, 1)
        if r.winner == 1:
            assert r.player1_score > r.player2_score
        elif r.winner == -1:
            assert r.player2_score > r.player1_score
        else:
            assert r.player1_score == r.player2_score
    colors = {r.player1_color for r in summary.results}
    assert colors == {"black", "white"}


def test_greedy_beats_random_on_average(eng):
    """Greedy should be clearly stronger than random over enough games."""
    summary = Arena(eng).play_matches(
        GreedyPlayer(eng), RandomPlayer(eng), 64, jax.random.PRNGKey(2)
    )
    assert summary.win_rate > 0.5


def test_evaluate_player_contract(eng):
    model = OthelloResNet(num_blocks=1, num_filters=8)
    variables = init_variables(model, jax.random.PRNGKey(0))
    player = MCTSPlayer(eng, apply_eval(model), variables, num_simulations=4)
    out = evaluate_player(player, RandomPlayer(eng), eng, num_games=4)
    assert set(out) >= {
        "opponent", "num_games", "wins", "losses", "draws",
        "win_rate", "avg_score", "avg_moves", "results",
    }
    assert out["num_games"] == 4
    assert out["wins"] + out["losses"] + out["draws"] == 4


def test_mcts_player_from_checkpoint(eng, tmp_path):
    """Checkpoint -> MCTSPlayer roundtrip (reference players.py:159-223)."""
    from othello_reinforcement_learning_test_tpu.train import AlphaZeroTrainer
    from othello_reinforcement_learning_test_tpu.utils import load_config

    cfg = load_config()
    cfg["model"].update(num_blocks=1, num_filters=8)
    cfg["training"].update(
        num_iterations=1, self_play_episodes_per_iter=2, batch_size=8,
        train_epochs_per_iter=1, checkpoint_interval=5, replay_buffer_size=500,
    )
    cfg["mcts"]["num_simulations"] = 2
    cfg["paths"]["checkpoint_dir"] = str(tmp_path / "m")
    cfg["paths"]["log_dir"] = str(tmp_path / "l")
    tr = AlphaZeroTrainer(cfg, log_cb=None)
    tr.train()
    player = MCTSPlayer.from_checkpoint(
        str(tmp_path / "m" / "final_model"), num_simulations=4
    )
    boards = player.engine.initial_state((2,))
    a = np.asarray(player.act(jax.random.PRNGKey(3), boards))
    legal = np.asarray(player.engine.legal_actions(boards))
    assert legal[0, a[0]] and legal[1, a[1]]


def test_play_game_white_plays_one_game(eng):
    """play_game(player1_color="white") seats player1 white by swapping the
    players for ONE game (round-1 version played two and discarded one) and
    re-expresses the result from player1's side."""
    g, r = GreedyPlayer(eng), RandomPlayer(eng)
    arena = Arena(eng)
    rng = jax.random.PRNGKey(3)
    res_w = arena.play_game(g, r, rng, player1_color="white")
    assert res_w.player1_color == "white"
    assert res_w.player1 == g.name and res_w.player2 == r.name
    # the mirrored seating with the same rng: identical game, flipped view
    res_m = arena.play_game(r, g, rng, player1_color="black")
    assert res_m.winner == -res_w.winner
    assert res_m.player1_score == res_w.player2_score
    assert res_m.player2_score == res_w.player1_score
    assert res_m.num_moves == res_w.num_moves

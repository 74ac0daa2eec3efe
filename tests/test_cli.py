"""CLI surface tests (parser contract; command internals are covered by the
end-to-end drives in the verify skill and training tests)."""

import pytest

from othello_reinforcement_learning_test_tpu.cli import build_parser


def test_train_defaults():
    args = build_parser().parse_args(["train"])
    assert args.config == "configs/default_8x8.yaml"
    assert args.resume is None


def test_train_resume_flag():
    args = build_parser().parse_args(
        ["train", "--config", "c.yaml", "--resume", "latest"])
    assert args.config == "c.yaml" and args.resume == "latest"


def test_eval_flags():
    args = build_parser().parse_args(
        ["eval", "--checkpoint", "x", "--games", "7", "--simulations", "99",
         "--device", "cpu", "--save-results", "--verbose"])
    assert (args.checkpoint, args.games, args.simulations) == ("x", 7, 99)
    assert args.device == "cpu" and args.save_results and args.verbose


def test_eval_requires_checkpoint():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["eval"])


def test_play_flags():
    args = build_parser().parse_args(
        ["play", "--checkpoint", "x", "--color", "white"])
    assert args.color == "white" and args.simulations == 100


def test_unknown_command_rejected():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["frobnicate"])


def test_eval_simulations_default_from_sidecar():
    """--simulations defaults to None so eval_command can honor the
    checkpoint config's mcts.num_simulations_eval (a key the reference
    defines but never reads)."""
    args = build_parser().parse_args(["eval", "--checkpoint", "x"])
    assert args.simulations is None


def test_eval_survives_failing_opponent(test_checkpoint, monkeypatch, capsys):
    """A failing opponent (e.g. a host-callback player that can't compile
    over a tunneled backend) must not abort eval — completed opponents'
    results are kept and reported."""
    import argparse

    from othello_reinforcement_learning_test_tpu import cli, evaluation

    real_evaluate = evaluation.evaluate_player
    calls = []

    def flaky(player, opponent, *a, **kw):
        calls.append(opponent.name)
        if opponent.name.startswith("Greedy"):
            raise RuntimeError("backend setup/compile error (Unavailable)")
        return real_evaluate(player, opponent, *a, **kw)

    monkeypatch.setattr(evaluation, "evaluate_player", flaky)
    args = argparse.Namespace(
        checkpoint=test_checkpoint, games=2, simulations=2, seed=0,
        minimax_depth=0, opening_random_plies=0, device="cpu",
        verbose=False, save_results=False,
        edax=None, edax_level=5, edax_args=None,
    )
    cli.eval_command(args)  # must not raise
    out = capsys.readouterr().out
    assert calls == ["Random", "Greedy"]  # both attempted
    assert "vs Random" in out and "win rate" in out
    assert "evaluation failed" in out and "Unavailable" in out

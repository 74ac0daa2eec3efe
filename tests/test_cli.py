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

"""Test harness: force CPU JAX with a virtual 8-device mesh.

The container boots an ``axon`` TPU PJRT plugin via sitecustomize and forces
``jax_platforms="axon,cpu"`` at interpreter start, so plain env vars are not
enough: we must update the jax config back to ``cpu`` *before the first
backend use*. Tests always run on host CPU; multi-chip sharding is exercised
with ``--xla_force_host_platform_device_count=8`` (the JAX-native way to test
multi-device programs without hardware — SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(scope="session")
def test_checkpoint():
    """Path to a tiny trained 8x8 checkpoint at ``data/models/test/``.

    Trained on first use (the directory is not committed and may be wiped
    between sessions); reused across runs once on disk. Mirrors the
    reference's ``configs/test.yaml`` smoke regime (2 blocks x 16 filters,
    2 iterations) so checkpoint-consuming tests (GUI app layer, int8
    strength) have a real artifact without a fixed-order dependency on the
    training suite."""
    path = os.path.join("data", "models", "test", "final_model")
    if not os.path.isdir(path):
        from othello_reinforcement_learning_test_tpu.train.trainer import (
            AlphaZeroTrainer,
        )

        cfg = {
            "game": {"size": 8, "rules": "reference"},
            "model": {"num_blocks": 2, "num_filters": 16, "board_size": 8},
            "training": {
                "batch_size": 16,
                "lr": 0.01,
                "num_iterations": 2,
                "self_play_episodes_per_iter": 3,
                "train_epochs_per_iter": 2,
                "checkpoint_interval": 2,
                "replay_buffer_size": 2048,
            },
            "mcts": {"num_simulations": 5},
            "self_play": {"temperature_threshold": 3},
            "system": {"seed": 42},
            "paths": {
                "checkpoint_dir": os.path.join("data", "models", "test"),
                "log_dir": os.path.join("data", "logs", "test"),
            },
        }
        trainer = AlphaZeroTrainer(cfg, log_cb=None)
        trainer.train()
        trainer.close()
    return path

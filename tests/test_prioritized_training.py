"""End-to-end training with prioritized replay enabled."""

import numpy as np

from othello_reinforcement_learning_test_tpu.train import AlphaZeroTrainer
from othello_reinforcement_learning_test_tpu.train.buffer import (
    PrioritizedReplayBuffer,
)
from othello_reinforcement_learning_test_tpu.utils import load_config


def test_prioritized_training_iteration(tmp_path):
    cfg = load_config()
    cfg["model"].update(num_blocks=1, num_filters=8)
    cfg["training"].update(
        num_iterations=2, self_play_episodes_per_iter=2, batch_size=8,
        train_epochs_per_iter=2, checkpoint_interval=5, replay_buffer_size=500,
        prioritized_replay=True,
    )
    cfg["mcts"]["num_simulations"] = 2
    cfg["paths"]["checkpoint_dir"] = str(tmp_path / "m")
    cfg["paths"]["log_dir"] = str(tmp_path / "l")
    tr = AlphaZeroTrainer(cfg, log_cb=None)
    assert isinstance(tr.buffer, PrioritizedReplayBuffer)
    metrics = tr.train()
    assert metrics["Loss/train"] > 0 and np.isfinite(metrics["Loss/train"])
    # priorities were updated away from the init value for sampled entries
    prio = np.asarray(tr.buffer.priority)
    filled = int(tr.buffer.filled)
    assert filled > 0
    assert (prio[:filled] > 0).all()
    assert float(tr.buffer.max_priority) >= 1.0

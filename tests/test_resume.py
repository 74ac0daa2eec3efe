"""True resume: a run interrupted at a checkpoint and resumed must be
bit-identical to an uninterrupted run (VERDICT round 1 item 5).

The reference has no working resume at all — its ``load_checkpoint`` exists
but is never called (``/root/reference/src/train/trainer.py:387-404``) and
its host-side deque buffer is lost on restart. Here the checkpoint carries
TrainState + replay buffer + host RNG, so training continues exactly where
it stopped.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from othello_reinforcement_learning_test_tpu.train import checkpoint as ckpt_lib
from othello_reinforcement_learning_test_tpu.train.trainer import AlphaZeroTrainer


def tiny_config(tmp_path, name, **training_overrides):
    training = {
        "batch_size": 16,
        "lr": 0.01,
        "num_iterations": 4,
        "self_play_episodes_per_iter": 4,
        "train_epochs_per_iter": 2,
        "checkpoint_interval": 2,
        "replay_buffer_size": 512,
    }
    training.update(training_overrides)
    return {
        "game": {"size": 4, "rules": "reference"},
        "model": {"num_blocks": 1, "num_filters": 8, "board_size": 4},
        "training": training,
        "mcts": {"num_simulations": 2},
        "self_play": {"temperature_threshold": 3},
        "system": {"seed": 7},
        "paths": {
            "checkpoint_dir": str(tmp_path / name / "models"),
            "log_dir": str(tmp_path / name / "logs"),
        },
    }


def leaves_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


@pytest.mark.parametrize("prioritized", [False, True])
def test_resume_bit_identical(tmp_path, prioritized):
    # uninterrupted 4-iteration run
    cfg_a = tiny_config(tmp_path, "a", prioritized_replay=prioritized)
    tr_a = AlphaZeroTrainer(cfg_a, log_cb=None)
    tr_a.train()
    tr_a.close()

    # interrupted run: stop after 2 iterations (checkpoint_interval=2 wrote
    # checkpoint_iter_000002), then resume in a FRESH trainer
    cfg_b = tiny_config(tmp_path, "b", prioritized_replay=prioritized)
    tr_b = AlphaZeroTrainer(cfg_b, log_cb=None)
    tr_b.train(num_iterations=2)
    tr_b.close()
    ckpt = os.path.join(tr_b.checkpoint_dir, "checkpoint_iter_000002")
    assert os.path.isdir(ckpt)

    tr_c = AlphaZeroTrainer(tiny_config(tmp_path, "b", prioritized_replay=prioritized),
                            log_cb=None)
    tr_c.load_checkpoint(ckpt)
    assert int(tr_c.state.iteration) == 2
    # buffer and RNG must round-trip, not reset
    assert int(tr_c.buffer.filled) == int(tr_b.buffer.filled) or int(tr_c.buffer.filled) > 0
    tr_c.train()  # continues 2 -> 4
    tr_c.close()

    assert leaves_equal(tr_a.state.params, tr_c.state.params), (
        "resumed params differ from uninterrupted run"
    )
    assert leaves_equal(tr_a.state.opt_state, tr_c.state.opt_state)
    assert np.array_equal(np.asarray(tr_a.rng), np.asarray(tr_c.rng))
    assert leaves_equal(
        {k: getattr(tr_a.buffer, k) for k in ("me", "opp", "pi", "value")},
        {k: getattr(tr_c.buffer, k) for k in ("me", "opp", "pi", "value")},
    )


def test_resume_latest_roundtrip(tmp_path):
    cfg = tiny_config(tmp_path, "latest", num_iterations=2)
    tr = AlphaZeroTrainer(cfg, log_cb=None)
    tr.train()
    tr.close()
    latest = ckpt_lib.latest_checkpoint(tr.checkpoint_dir)
    assert latest is not None
    meta = ckpt_lib.load_meta(latest)
    assert meta["format"] == 2
    tr2 = AlphaZeroTrainer(tiny_config(tmp_path, "latest", num_iterations=2),
                           log_cb=None)
    tr2.load_checkpoint(latest)
    assert int(tr2.state.iteration) == 2
    assert int(tr2.buffer.filled) > 0
    tr2.close()


def test_format1_checkpoint_still_loads(tmp_path):
    """Round-1 bare-TrainState checkpoints load (with empty buffer)."""
    cfg = tiny_config(tmp_path, "old", num_iterations=1)
    tr = AlphaZeroTrainer(cfg, log_cb=None)
    path = str(tmp_path / "old" / "models" / "bare")
    ckpt_lib.save(path, tr.state, config=cfg)  # old format: state only
    tr2 = AlphaZeroTrainer(tiny_config(tmp_path, "old", num_iterations=1),
                           log_cb=None)
    tr2.load_checkpoint(path)
    assert int(tr2.buffer.filled) == 0
    tr.close()
    tr2.close()


def test_buffer_shape_mismatch_falls_back(tmp_path):
    """Resuming with a different replay_buffer_size keeps the train state
    and warns instead of crashing."""
    cfg = tiny_config(tmp_path, "mismatch", num_iterations=2)
    tr = AlphaZeroTrainer(cfg, log_cb=None)
    tr.train()
    tr.close()
    ckpt = os.path.join(tr.checkpoint_dir, "final_model")

    msgs = []
    cfg2 = tiny_config(tmp_path, "mismatch", num_iterations=2,
                       replay_buffer_size=128)
    tr2 = AlphaZeroTrainer(cfg2, log_cb=msgs.append)
    tr2.load_checkpoint(ckpt)
    assert int(tr2.state.iteration) == 2
    assert int(tr2.buffer.filled) == 0
    assert any("empty buffer" in m for m in msgs)
    tr2.close()


def test_mcts_player_loads_full_checkpoint(tmp_path):
    """Inference-side loading works on format-2 checkpoints."""
    from othello_reinforcement_learning_test_tpu.evaluation.players import MCTSPlayer

    cfg = tiny_config(tmp_path, "player", num_iterations=2)
    tr = AlphaZeroTrainer(cfg, log_cb=None)
    tr.train()
    tr.close()
    player = MCTSPlayer.from_checkpoint(
        os.path.join(tr.checkpoint_dir, "final_model"), num_simulations=2
    )
    boards = player.engine.initial_state((2,))
    actions = player.act(jax.random.PRNGKey(0), boards)
    legal = player.engine.legal_actions(boards)
    assert all(bool(legal[i, int(actions[i])]) for i in range(2))


def test_resume_with_gating_refreshes_best(tmp_path):
    """Resuming a GATED run from a checkpoint saved WITHOUT gating must not
    leave gated self-play on the random-init network (round-2 review): the
    restored candidate becomes the provisional best."""
    cfg = tiny_config(tmp_path, "nogate")
    tr = AlphaZeroTrainer(cfg, log_cb=None)
    tr.train()
    ckpt = os.path.join(cfg["paths"]["checkpoint_dir"], "final_model")
    tr.close()

    cfg2 = tiny_config(
        tmp_path, "gated",
        gating={"enabled": True, "games": 2, "win_threshold": 0.55,
                "interval": 2},
    )
    tr2 = AlphaZeroTrainer(cfg2, log_cb=None)
    init_best = jax.device_get(tr2.best_variables)
    tr2.load_checkpoint(ckpt)
    assert leaves_equal(tr2.best_variables, tr2.variables())
    assert not leaves_equal(tr2.best_variables, init_best)
    tr2.close()


def test_resume_respects_disabled_gating(tmp_path):
    """A checkpoint carrying a gating 'best' network must not re-enable
    gating when the config disabled it (config wins)."""
    cfg = tiny_config(
        tmp_path, "gatedsrc",
        gating={"enabled": True, "games": 2, "win_threshold": 0.55,
                "interval": 2},
    )
    tr = AlphaZeroTrainer(cfg, log_cb=None)
    tr.train()
    ckpt = os.path.join(cfg["paths"]["checkpoint_dir"], "final_model")
    tr.close()

    cfg2 = tiny_config(tmp_path, "ungated")  # gating off
    tr2 = AlphaZeroTrainer(cfg2, log_cb=None)
    tr2.load_checkpoint(ckpt)
    assert not tr2.gating_enabled
    assert tr2.best_variables is None
    tr2.close()


def test_load_train_state_partial_matches_full(tmp_path):
    """The PLACEHOLDER-based partial restore must return the same TrainState
    as the full composite restore (and not touch the buffer bytes)."""
    cfg = tiny_config(tmp_path, "partial")
    tr = AlphaZeroTrainer(cfg, log_cb=None)
    tr.train()
    ckpt = os.path.join(cfg["paths"]["checkpoint_dir"], "final_model")

    fresh = AlphaZeroTrainer(tiny_config(tmp_path, "tmpl"), log_cb=None)
    partial = ckpt_lib.load_train_state(ckpt, fresh.state)
    full = ckpt_lib.load_full(ckpt, fresh.state, fresh.buffer, fresh.rng)
    assert leaves_equal(partial, full["train_state"])
    tr.close()
    fresh.close()

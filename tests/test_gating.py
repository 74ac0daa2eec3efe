"""Arena-gated model acceptance (VERDICT round 1 item 7; BASELINE.json
"strong_8x8.yaml with arena gating").

Self-play uses the best-so-far network; the candidate replaces it only on a
decisive gate-match win rate >= threshold. The reference has no gating at
all (its trainer adopts every update unconditionally)."""

import json
import os

import jax
import numpy as np
import pytest

from othello_reinforcement_learning_test_tpu.train.trainer import AlphaZeroTrainer
from othello_reinforcement_learning_test_tpu.utils.config import load_config

from test_resume import tiny_config  # noqa: E402  (shared tiny trainer config)


def gated_config(tmp_path, name, **gating):
    cfg = tiny_config(tmp_path, name, num_iterations=2, checkpoint_interval=2)
    cfg["training"]["gating"] = {
        "enabled": True, "games": 4, "win_threshold": 0.55, "interval": 1,
        "num_simulations": 2, "opening_random_plies": 2, **gating,
    }
    return cfg


def params_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_rejected_candidate_keeps_best(tmp_path, monkeypatch):
    tr = AlphaZeroTrainer(gated_config(tmp_path, "reject"), log_cb=None)
    initial_best = jax.tree.map(lambda x: x, tr.best_variables["params"])

    class S:  # rigged summary
        wins, losses, draws = 0, 4, 0

    monkeypatch.setattr(tr, "_gate_match", lambda rng: (0.0, S))
    tr.train()
    tr.close()
    # training ran (params moved) but best never adopted
    assert not params_equal(tr.state.params, initial_best)
    assert params_equal(tr.best_variables["params"], initial_best)


def test_accepted_candidate_becomes_best(tmp_path, monkeypatch):
    tr = AlphaZeroTrainer(gated_config(tmp_path, "accept"), log_cb=None)
    initial_best = jax.tree.map(lambda x: x, tr.best_variables["params"])

    class S:
        wins, losses, draws = 4, 0, 0

    monkeypatch.setattr(tr, "_gate_match", lambda rng: (1.0, S))
    tr.train()
    tr.close()
    assert not params_equal(tr.best_variables["params"], initial_best)
    assert params_equal(tr.best_variables["params"], tr.state.params)


def test_gating_decisions_logged(tmp_path, monkeypatch):
    cfg = gated_config(tmp_path, "log")
    tr = AlphaZeroTrainer(cfg, log_cb=None)

    class S:
        wins, losses, draws = 3, 1, 0

    monkeypatch.setattr(tr, "_gate_match", lambda rng: (0.75, S))
    tr.train()
    tr.close()
    jsonl = [
        os.path.join(cfg["paths"]["log_dir"], f)
        for f in os.listdir(cfg["paths"]["log_dir"])
        if f.endswith(".jsonl")
    ]
    assert jsonl
    tags = set()
    with open(jsonl[0]) as f:
        for line in f:
            tags.add(json.loads(line).get("tag"))
    assert "Gating/win_rate" in tags
    assert "Gating/accepted" in tags


def test_real_gate_match_runs(tmp_path):
    """End-to-end (no rigging): identical candidate/best nets, real arena."""
    tr = AlphaZeroTrainer(gated_config(tmp_path, "real"), log_cb=None)
    win_rate, s = tr._gate_match(jax.random.PRNGKey(0))
    assert 0.0 <= win_rate <= 1.0
    assert s.wins + s.losses + s.draws == 4
    tr.close()


def test_gating_survives_resume(tmp_path, monkeypatch):
    cfg = gated_config(tmp_path, "resume")
    tr = AlphaZeroTrainer(cfg, log_cb=None)

    class S:
        wins, losses, draws = 4, 0, 0

    monkeypatch.setattr(tr, "_gate_match", lambda rng: (1.0, S))
    tr.train()
    tr.close()

    tr2 = AlphaZeroTrainer(gated_config(tmp_path, "resume"), log_cb=None)
    tr2.load_checkpoint(os.path.join(tr.checkpoint_dir, "final_model"))
    assert tr2.best_variables is not None
    assert params_equal(tr2.best_variables["params"], tr.best_variables["params"])
    tr2.close()


def test_strong_config_has_gating():
    cfg = load_config("configs/strong_8x8.yaml")
    g = cfg["training"]["gating"]
    assert g["enabled"] is True
    assert g["games"] == 40
    assert abs(g["win_threshold"] - 0.55) < 1e-9
    # nested merge keeps defaults for unspecified subkeys
    assert g["num_simulations"] is None


def test_gating_config_validation(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text(
        "training:\n  gating:\n    enabled: true\n    win_threshold: 1.5\n"
    )
    with pytest.raises(ValueError):
        load_config(str(bad))


def test_scalar_gating_config_raises_clear_error(tmp_path):
    """`training: {gating: true}` (natural shorthand) must produce a clear
    ValueError, not an AttributeError deep in validation (round-2 review)."""
    import yaml

    path = tmp_path / "bad.yaml"
    path.write_text(yaml.safe_dump({"training": {"gating": True}}))
    with pytest.raises(ValueError, match="training.gating must be a mapping"):
        load_config(str(path))

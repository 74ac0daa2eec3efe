"""YAML config loading with validation.

Reference-compatible: the same section names and keys as the reference's
``configs/*.yaml`` (game/model/training/mcts/self_play/paths/system —
``/root/reference/main.py:22-34``) load unchanged. Unlike the reference
(plain ``yaml.safe_load`` with ``dict.get`` defaults scattered at use sites
and several silently-unread keys — SURVEY.md §5), unknown keys produce
warnings and values are type-checked.
"""

from __future__ import annotations

import copy
import warnings
from typing import Any, Dict, Optional

import yaml

DEFAULTS: Dict[str, Dict[str, Any]] = {
    "game": {"size": 8, "rules": "reference"},
    "model": {"num_blocks": 10, "num_filters": 128, "board_size": 8},
    "training": {
        "batch_size": 256,
        "lr": 0.001,
        # "step" = decay by lr_gamma every lr_step_size iterations (the
        # reference's *declared* StepLR intent); "constant" = no decay — the
        # reference's *actual* behavior, since it constructs StepLR but never
        # calls scheduler.step() (/root/reference/src/train/trainer.py:63-76).
        "lr_schedule": "step",
        "lr_step_size": 100,
        "lr_gamma": 0.1,
        "weight_decay": 0.0001,
        "momentum": 0.9,
        "num_iterations": 1000,
        "self_play_episodes_per_iter": 100,
        "train_epochs_per_iter": 10,
        "checkpoint_interval": 10,
        "replay_buffer_size": 100_000,
        "augment_symmetries": False,
        "prioritized_replay": False,
        # arena-gated model acceptance (AlphaZero-style): self-play uses the
        # BEST network; every `interval` iterations the candidate plays a
        # gate match vs best and replaces it only on a decisive win rate
        # >= win_threshold (BASELINE.json: "strong_8x8.yaml with arena
        # gating"). Subkeys missing from a user config fall back to these.
        "gating": {
            "enabled": False,
            "games": 40,
            "win_threshold": 0.55,
            "interval": None,  # None = checkpoint_interval
            "num_simulations": None,  # None = mcts.num_simulations
            "opening_random_plies": 4,
        },
    },
    "mcts": {
        "num_simulations": 25,
        # accepted for reference-config compatibility; used as the default
        # --simulations by evaluation tooling, not read by the trainer
        # (mirrors the reference, where this key is also unread — SURVEY §2)
        "num_simulations_eval": 50,
        "c_puct": 1.0,
        "dirichlet_alpha": 0.3,
        "dirichlet_epsilon": 0.25,
    },
    "self_play": {
        "temperature_threshold": 15,
        # reference-compat lockstep-batch cap (reference main.py:111-115):
        # self-play runs in chunks of at most this many games per jitted
        # batch. None = all episodes in one batch (fastest on TPU).
        "num_parallel_games": None,
        # evaluate the lockstep loops' liveness conds (scalar cross-shard
        # all-reduces under a dp mesh) every k iterations instead of every
        # iteration. Bit-identical results for any k. None/"auto" =
        # transport-aware default (k=4 on multi-process non-TPU transports
        # where the conds are latency-bound — measured +15.4% at N=4 in
        # results/multihost_scaling.md — else k=1); an int overrides.
        "cond_interval": None,
    },
    "paths": {
        "checkpoint_dir": "data/models",
        "log_dir": "data/logs",
        "data_dir": "data",
    },
    "system": {
        "device": "auto",
        "seed": 42,
        # accepted for compat; bf16 compute is always on (the AMP
        # equivalent) — the reference also never reads this key
        "use_mixed_precision": True,
        # multi-chip data parallelism: number of devices for the dp mesh
        # (None = single device; the games/batch axes shard when set)
        "mesh_devices": None,
        # self-play/gating inference path: "xla" (default) or a fused Pallas
        # trunk variant ("int8" measures +6% games/s at B=1024 and +35% at
        # B=4096 on v5e — results/nn_inference_decomposition.md). TPU only
        # except "int8_xla". Training forward/backward is unaffected.
        "self_play_net_variant": "xla",
        # multi-host self-play design: "global" = one mesh-spanning SPMD
        # program (no host bounce; conds ride the interconnect), "local" =
        # per-process local play + host assembly (zero cross-host syncs
        # during play). "auto" picks global on TPU/ICI, local on CPU/GPU
        # process groups — the measured winners per transport
        # (results/multihost_scaling.md round 4).
        "distributed_self_play": "auto",
        # self-healing training: max consecutive iteration failures the
        # trainer absorbs (clear backend -> resume latest checkpoint ->
        # retry) before re-raising. 0 disables recovery.
        "max_recovery_retries": 3,
    },
}


def load_config(path: Optional[str] = None) -> Dict:
    """Load a YAML config merged over defaults; validates section/key names."""
    cfg = copy.deepcopy(DEFAULTS)
    if path is None:
        return cfg
    with open(path) as f:
        user = yaml.safe_load(f) or {}
    for section, values in user.items():
        if section not in cfg:
            warnings.warn(f"config: unknown section '{section}' (ignored)")
            continue
        if not isinstance(values, dict):
            warnings.warn(f"config: section '{section}' is not a mapping")
            continue
        for key, value in values.items():
            if key not in cfg[section]:
                warnings.warn(f"config: unknown key '{section}.{key}' (kept)")
            if isinstance(cfg[section].get(key), dict) and isinstance(value, dict):
                # nested block (e.g. training.gating): merge over defaults
                for k2, v2 in value.items():
                    if k2 not in cfg[section][key]:
                        warnings.warn(
                            f"config: unknown key '{section}.{key}.{k2}' (kept)"
                        )
                    cfg[section][key][k2] = v2
            else:
                cfg[section][key] = value
    # keep model.board_size consistent with game.size unless explicitly set
    if "model" not in user or "board_size" not in user.get("model", {}):
        cfg["model"]["board_size"] = cfg["game"]["size"]
    _validate(cfg)
    return cfg


def _validate(cfg: Dict) -> None:
    t = cfg["training"]
    for key in ("batch_size", "num_iterations", "self_play_episodes_per_iter",
                "train_epochs_per_iter", "checkpoint_interval",
                "replay_buffer_size"):
        if int(t[key]) <= 0:
            raise ValueError(f"training.{key} must be positive, got {t[key]}")
    if not (0.0 < float(t["lr"])):
        raise ValueError("training.lr must be > 0")
    if t.get("lr_schedule", "step") not in ("step", "constant"):
        raise ValueError("training.lr_schedule must be 'step' or 'constant'")
    gating = t.get("gating") or {}
    if not isinstance(gating, dict):
        raise ValueError(
            "training.gating must be a mapping, e.g. "
            "{enabled: true, games: 40, win_threshold: 0.55}; "
            f"got {t.get('gating')!r}"
        )
    if gating.get("enabled"):
        if int(gating.get("games", 40)) <= 0:
            raise ValueError("training.gating.games must be positive")
        if not (0.0 <= float(gating.get("win_threshold", 0.55)) <= 1.0):
            raise ValueError("training.gating.win_threshold must be in [0, 1]")
    m = cfg["mcts"]
    if int(m["num_simulations"]) <= 0:
        raise ValueError("mcts.num_simulations must be positive")
    if not (0.0 <= float(m["dirichlet_epsilon"]) <= 1.0):
        raise ValueError("mcts.dirichlet_epsilon must be in [0, 1]")
    g = cfg["game"]
    if int(g["size"]) not in (4, 6, 8):
        raise ValueError("game.size must be 4, 6 or 8")
    if g.get("rules", "reference") not in ("reference", "standard"):
        raise ValueError("game.rules must be 'reference' or 'standard'")

"""Orbax checkpointing of the full train state (+ config sidecar).

TPU-native replacement for the reference's ``torch.save`` dict of
model/optimizer/scheduler state (``/root/reference/src/train/trainer.py:
366-404``). Unlike the reference — whose ``load_checkpoint`` is never called
by any entry point (SURVEY.md §5) — resume is a first-class path here.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

_CHECKPOINTER: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def save(path: str, state: Any, config: Optional[Dict] = None) -> str:
    """Save a pytree checkpoint at ``path`` (a directory), with the config
    as a JSON sidecar for architecture rediscovery (the reference re-derives
    hyperparams from state_dict shapes when config is missing,
    players.py:183-204 — we just store it)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    # StandardCheckpointer is async in current orbax; block so the
    # checkpoint is durable before we report success.
    ckptr.wait_until_finished()
    if config is not None:
        with open(path + ".config.json", "w") as f:
            json.dump(config, f, indent=2, default=str)
    return path


def load(path: str, template: Any) -> Any:
    """Restore into the exact pytree structure of ``template`` (orbax may
    return generic containers; re-unflatten over the template treedef)."""
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path, template)
    return jax.tree.unflatten(
        jax.tree.structure(template), jax.tree.leaves(restored)
    )


# ---------------------------------------------------------------------------
# Full training-state checkpoints (format 2): TrainState + replay buffer +
# host RNG key in one composite pytree, so ``--resume`` reproduces an
# uninterrupted run bit-for-bit. The reference has no equivalent — its
# ``load_checkpoint`` is never called and its host-side deque buffer is
# simply lost on restart (/root/reference/src/train/trainer.py:387-404).
# A ``.meta.json`` sidecar records the format so round-1 bare-TrainState
# checkpoints keep loading.
# ---------------------------------------------------------------------------


def save_full(
    path: str,
    train_state: Any,
    buffer: Any,
    rng: jax.Array,
    config: Optional[Dict] = None,
    best: Any = None,
) -> str:
    """Save the composite {train_state, buffer, rng[, best]} pytree + meta
    sidecar. ``best`` is the gating best-network variables (params +
    batch_stats), present only when arena gating is enabled."""
    composite = {"train_state": train_state, "buffer": buffer, "rng": rng}
    if best is not None:
        composite["best"] = best
    path = save(path, composite, config)
    meta = {
        "format": 2,
        "buffer_capacity": int(buffer.capacity),
        "buffer_class": type(buffer).__name__,
        "num_actions": int(buffer.pi.shape[-1]),
        "has_best": best is not None,
    }
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_meta(path: str) -> Dict:
    """Checkpoint meta sidecar; ``{"format": 1}`` for round-1 bare
    TrainState checkpoints (no sidecar)."""
    sidecar = os.path.abspath(path) + ".meta.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    return {"format": 1}


def load_full(path: str, train_state_template: Any, buffer_template: Any,
              rng_template: jax.Array) -> Dict[str, Any]:
    """Restore a format-2 checkpoint into the given templates. Returns
    ``{"train_state": ..., "buffer": ..., "rng": ...[, "best": ...]}``.
    For a format-1 checkpoint, restores only the TrainState and passes the
    buffer/rng templates through unchanged (``"partial": True``)."""
    meta = load_meta(path)
    if meta.get("format", 1) >= 2:
        template = {
            "train_state": train_state_template,
            "buffer": buffer_template,
            "rng": rng_template,
        }
        if meta.get("has_best"):
            template["best"] = {
                "params": train_state_template.params,
                "batch_stats": train_state_template.batch_stats,
            }
        restored = load(path, template)
        restored["partial"] = False
        return restored
    return {
        "train_state": load(path, train_state_template),
        "buffer": buffer_template,
        "rng": rng_template,
        "partial": True,
    }


def load_train_state(path: str, train_state_template: Any) -> Any:
    """Restore just the TrainState from either checkpoint format (what
    inference-side consumers like ``MCTSPlayer.from_checkpoint`` need)."""
    meta = load_meta(path)
    if meta.get("format", 1) < 2:
        return load(path, train_state_template)
    # partial restore: only the train_state subtree is deserialized — the
    # replay buffer (potentially tens of MB) and RNG leaves are marked
    # ``ocp.PLACEHOLDER`` so orbax skips reading them (inference consumers
    # like MCTSPlayer.from_checkpoint open many checkpoints in a sweep)
    from . import buffer as buffer_lib

    cap = int(meta.get("buffer_capacity", 0))
    cls = meta.get("buffer_class", "ReplayBuffer")
    num_actions = int(meta.get("num_actions", 0))
    if num_actions <= 0:
        cfg = load_config(path) or {}
        size = int(cfg.get("game", {}).get("size",
                   cfg.get("model", {}).get("board_size", 8)))
        num_actions = size * size + 1
    if cls == "PrioritizedReplayBuffer":
        buf_t = buffer_lib.create_prioritized(cap, num_actions)
    else:
        buf_t = buffer_lib.create(cap, num_actions)
    template = {
        "train_state": train_state_template,
        "buffer": jax.tree.map(lambda _: ocp.PLACEHOLDER, buf_t),
        "rng": ocp.PLACEHOLDER,
    }
    if meta.get("has_best"):
        template["best"] = jax.tree.map(
            lambda _: ocp.PLACEHOLDER,
            {"params": train_state_template.params,
             "batch_stats": train_state_template.batch_stats},
        )

    # explicit restore shardings from the TEMPLATE (not the checkpoint
    # file) so checkpoints written on one device kind restore on another
    # (e.g. a TPU training checkpoint opened by a CPU web server)
    def _restore_arg(leaf):
        if leaf is ocp.PLACEHOLDER:
            return ocp.RestoreArgs()
        arr = jnp.asarray(leaf)
        return ocp.ArrayRestoreArgs(
            sharding=jax.sharding.SingleDeviceSharding(
                arr.devices().pop() if hasattr(arr, "devices")
                else jax.devices()[0]
            ),
            global_shape=arr.shape,
            dtype=arr.dtype,
        )

    restore_args = jax.tree.map(_restore_arg, template)
    restored = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(item=template, restore_args=restore_args),
    )
    state = restored["train_state"]
    return jax.tree.unflatten(
        jax.tree.structure(train_state_template), jax.tree.leaves(state)
    )


def load_config(path: str) -> Optional[Dict]:
    sidecar = os.path.abspath(path) + ".config.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    return None


def latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Most recent checkpoint directory under ``checkpoint_dir``."""
    if not os.path.isdir(checkpoint_dir):
        return None
    entries = [
        os.path.join(checkpoint_dir, e)
        for e in os.listdir(checkpoint_dir)
        if os.path.isdir(os.path.join(checkpoint_dir, e))
        and (e.startswith("checkpoint_") or e == "final_model")
    ]
    if not entries:
        return None
    return max(entries, key=os.path.getmtime)

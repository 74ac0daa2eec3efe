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

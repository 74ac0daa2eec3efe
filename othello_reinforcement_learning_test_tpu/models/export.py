"""Model export via jax.export (StableHLO).

The reference lists ONNX export as an unimplemented remaining task
(``/root/reference/REMAINING_TASKS.md`` §3, ``pyproject.toml`` onnx extra).
The TPU-native serving format is a serialized StableHLO export: portable
across JAX versions and runnable on any XLA backend. (No torch involved.)
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .resnet import OthelloResNet


def export_forward(
    model: OthelloResNet, variables: Dict, batch_size: int = 256
):
    """Export the eval-mode forward pass (weights baked in) for a fixed
    batch size. Returns the jax.export Exported object."""

    def forward(x):
        return model.apply(variables, x, train=False)

    s = model.board_size
    x_spec = jax.ShapeDtypeStruct((batch_size, s, s, 3), jnp.float32)
    return jax_export.export(jax.jit(forward))(x_spec)


def save_stablehlo(
    model: OthelloResNet, variables: Dict, path: str, batch_size: int = 256
) -> str:
    """Serialize the exported forward pass to ``path`` (plus a readable
    ``.mlir`` sidecar with the StableHLO module text)."""
    exported = export_forward(model, variables, batch_size)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    with open(path + ".mlir", "w") as f:
        f.write(exported.mlir_module())
    return path


def load_stablehlo(path: str):
    """Deserialize an export; returns a callable ``fn(x) -> (log_probs, value)``."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    def fn(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return exported.call(x)

    return fn

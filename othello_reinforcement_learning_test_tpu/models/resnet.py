"""Dual-head policy/value ResNet (TPU-native Flax implementation).

Same network family and I/O contract as the reference PyTorch model
(``/root/reference/src/model/net.py:139-265``): input is the 3-plane board
tensor, output is ``(policy_log_probs, value)`` with LogSoftmax policy over
``S*S + 1`` actions and tanh value in [-1, 1]. Defaults (10 blocks x 128
filters) give ~2.98M parameters like the reference (net.py:158-180,
README.md:239).

TPU-first choices (not a port):
- NHWC layout ``(B, S, S, 3)`` — the TPU-native convolution layout — instead
  of the reference's NCHW.
- bfloat16 compute with float32 parameters and batch statistics (the
  reference's CUDA AMP equivalent, trainer.py:79,303-315).
- BatchNorm with running statistics; inference uses the running averages.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResBlock(nn.Module):
    """Conv-BN-ReLU-Conv-BN + skip, final ReLU (reference net.py:34-61)."""

    filters: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        return nn.relu(x + y)


class OthelloResNet(nn.Module):
    """Dual-head ResNet: ``(B, S, S, 3) -> (log_probs (B, S*S+1), value (B, 1))``.

    Heads mirror the reference: policy Conv1x1(2ch)-BN-ReLU-FC-LogSoftmax
    (net.py:64-96); value Conv1x1(1ch)-BN-ReLU-FC(256)-ReLU-FC(1)-Tanh
    (net.py:99-136).
    """

    num_blocks: int = 10
    num_filters: int = 128
    board_size: int = 8
    value_hidden: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.board_size
        num_actions = s * s + 1
        x = x.astype(self.dtype)

        # stem (net.py:15-31)
        x = nn.Conv(self.num_filters, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)

        for _ in range(self.num_blocks):
            x = ResBlock(self.num_filters, dtype=self.dtype)(x, train)

        # policy head
        p = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype)(x)
        p = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(p)
        p = nn.relu(p)
        p = p.reshape(p.shape[0], -1)
        p = nn.Dense(num_actions, dtype=self.dtype)(p)
        log_probs = nn.log_softmax(p.astype(jnp.float32), axis=-1)

        # value head
        v = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype)(x)
        v = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(v)
        v = nn.relu(v)
        v = v.reshape(v.shape[0], -1)
        v = nn.Dense(self.value_hidden, dtype=self.dtype)(v)
        v = nn.relu(v)
        v = nn.Dense(1, dtype=self.dtype)(v)
        value = jnp.tanh(v.astype(jnp.float32))

        return log_probs, value


def create_model(config: Optional[Dict] = None) -> OthelloResNet:
    """Build from a reference-style config dict (``model:`` section keys
    num_blocks / num_filters / board_size — reference net.py:238-265)."""
    cfg = (config or {}).get("model", config or {})
    return OthelloResNet(
        num_blocks=int(cfg.get("num_blocks", 10)),
        num_filters=int(cfg.get("num_filters", 128)),
        board_size=int(cfg.get("board_size", 8)),
    )


def init_variables(model: OthelloResNet, rng: jax.Array) -> Dict:
    """Initialize {params, batch_stats} with a dummy batch."""
    s = model.board_size
    dummy = jnp.zeros((1, s, s, 3), jnp.float32)
    return model.init(rng, dummy, train=False)


def param_count(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def predict(
    model: OthelloResNet, variables: Dict, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference: returns (probs, value) with probs = exp(log_probs), handling
    a single unbatched sample like the reference ``predict`` (net.py:207-235)."""
    single = x.ndim == 3
    if single:
        x = x[None]
    log_probs, value = model.apply(variables, x, train=False)
    probs = jnp.exp(log_probs)
    if single:
        probs, value = probs[0], value[0]
    return probs, value

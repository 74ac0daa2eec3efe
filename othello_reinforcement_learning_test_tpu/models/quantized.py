"""Int8 quantized inference for the residual trunk.

Why: the bf16 trunk already runs at ~63% of the v5e's 197 TFLOP/s bf16 peak
(~330k boards/s x ~377 MFLOP/board), so bf16-side kernel work can recover at
most ~1.5x. The MXU's int8 path has 2x the peak (394 TOP/s), which is the
only honest route to the >=2x inference-throughput target. AlphaZero-style
policy/value nets are classically robust to 8-bit inference; play-strength
is validated by an int8-vs-bf16 arena match (tests + eval harness).

Scheme (standard per-channel post-training quantization):
- weights: symmetric int8, one scale per *output channel* shared across all
  9 spatial taps and input channels — so the int32 accumulator can sum all
  nine shifted tap-matmuls before a single dequantize.
- activations: dynamic symmetric int8 with a per-tensor scale computed per
  layer (trunk conv inputs are post-ReLU, so the range is one-sided).
- BatchNorm is folded into the weights/bias first (eval mode), exactly as
  in ``pallas_resnet.fold_block_params``.

Two execution paths share the same quantized weights:
- ``xla_int8_trunk``: pure-XLA (lax ops only) — runs anywhere incl. CPU,
  serves as the correctness baseline and the fallback.
- ``pallas_resnet.fused_trunk_int8``: VMEM-resident Pallas kernel.

Same network contract as the reference model
(``/root/reference/src/model/net.py:139-265``).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from .pallas_resnet import fold_block_params


class QuantizedTrunk(NamedTuple):
    """Folded + quantized residual-trunk parameters.

    w_int8: (L, C, 9*C) int8 — tap k's (C_in, C_out) matrix lives in columns
        [k*C, (k+1)*C), k indexed row-major over (dy, dx) in (-1, 0, 1)^2.
    w_scale: (L, C) f32 — per-output-channel dequant scale (shared by taps).
    bias: (L, C) f32 — folded BatchNorm bias.
    """

    w_int8: jnp.ndarray
    w_scale: jnp.ndarray
    bias: jnp.ndarray


def quantize_trunk(variables: Dict, num_blocks: int) -> QuantizedTrunk:
    """Fold eval-mode BN and quantize the trunk weights to int8."""
    w, bias = fold_block_params(variables, num_blocks)  # (L,3,3,C,C) bf16
    w = w.astype(jnp.float32)
    L, _, _, C, _ = w.shape
    # (L, 3, 3, C_in, C_out) -> per-output-channel max over taps + C_in
    absmax = jnp.max(jnp.abs(w), axis=(1, 2, 3))  # (L, C_out)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.round(w / scale[:, None, None, None, :])
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    # (L, 3, 3, C, C) -> (L, C_in, 9*C_out): tap-major columns
    q = q.reshape(L, 9, C, C).transpose(0, 2, 1, 3).reshape(L, C, 9 * C)
    return QuantizedTrunk(q, scale, bias)


def quantize_activations(h: jnp.ndarray):
    """Dynamic symmetric per-tensor int8: returns (q_int8, scale_f32)."""
    s = jnp.maximum(jnp.max(jnp.abs(h)), 1e-8) / 127.0
    q = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
    return q, s


# 3x3 neighborhood offsets — shared with the Pallas kernels so the tap
# ordering in the (L, C, 9C) weight layout can never diverge between the
# XLA baseline and the fused trunks
from .pallas_resnet import _OFFSETS  # noqa: E402


def _int8_conv3x3(h: jnp.ndarray, w_cols: jnp.ndarray, scale: jnp.ndarray,
                  bias: jnp.ndarray) -> jnp.ndarray:
    """One folded conv layer: quantize -> wide int8 matmul -> shifted int32
    accumulation -> single dequant. h: (B, S, S, C) f32; returns f32."""
    B, S, _, C = h.shape
    q, s_act = quantize_activations(h)
    # one (B*S*S, C) @ (C, 9C) int8 matmul, int32 accumulation on the MXU
    z = jax.lax.dot_general(
        q.reshape(B * S * S, C), w_cols,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(B, S, S, 9, C)
    # y[p] = sum_k z_k[p + o_k] (shift commutes with the channel matmul)
    padded = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    acc = jnp.zeros((B, S, S, C), jnp.int32)
    for k, (dy, dx) in enumerate(_OFFSETS):
        acc = acc + padded[:, 1 + dy: 1 + dy + S, 1 + dx: 1 + dx + S, k, :]
    return acc.astype(jnp.float32) * (s_act * scale)[None, None, None, :] \
        + bias[None, None, None, :]


def xla_int8_trunk(h: jnp.ndarray, qt: QuantizedTrunk,
                   num_blocks: int) -> jnp.ndarray:
    """Apply the quantized residual trunk with pure XLA ops.

    h: (B, S, S, C) f32 stem output (post-ReLU). Returns f32.
    """
    for i in range(num_blocks):
        y = jnp.maximum(
            _int8_conv3x3(h, qt.w_int8[2 * i], qt.w_scale[2 * i],
                          qt.bias[2 * i]), 0.0)
        z = _int8_conv3x3(y, qt.w_int8[2 * i + 1], qt.w_scale[2 * i + 1],
                          qt.bias[2 * i + 1])
        h = jnp.maximum(h + z, 0.0)
    return h

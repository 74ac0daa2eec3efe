"""Fused Pallas inference trunk for the dual-head ResNet.

XLA lowers each 3x3 conv by materializing an im2col patch tensor to HBM
(~9x the activation bytes, ~11 GB of traffic for a 20-conv forward at
B=4096) — measured at ~33% of MXU peak. This kernel keeps a block of games'
activations resident in VMEM across the entire residual trunk and expresses
each 3x3 conv as **nine shifted 128x128 matmuls** accumulated in f32 (no
patch tensor at all), with inference BatchNorm folded into per-layer
scale/bias.

Scope: the 10 residual blocks (20 convs, 128->128) in eval mode. The stem
and the two heads stay in XLA (tiny). Training still uses the Flax model;
this path serves MCTS/self-play inference where the FLOPs are.

Cross-checked against ``model.apply`` in interpret mode (CPU tests) and
compiled on TPU (bench: ``benchmark_model.py --fused``).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resnet import OthelloResNet

# 3x3 neighborhood offsets, row-major like the conv kernel layout (HWIO)
_OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def fold_block_params(variables: Dict, num_blocks: int) -> Tuple[jnp.ndarray, ...]:
    """Fold eval-mode BatchNorm into conv weights/biases for the trunk.

    Returns (weights (L, 3, 3, C, C) bf16, bias (L, C) f32) with L = 2 *
    num_blocks, ordered [block0.conv0, block0.conv1, block1.conv0, ...].
    BN(conv(x)) = conv(x) * g + b with g = gamma/sqrt(var+eps),
    b = beta - mean*g — absorbed into the conv kernel and a bias.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    ws, bs = [], []
    for i in range(num_blocks):
        blk = params[f"ResBlock_{i}"]
        blk_stats = stats[f"ResBlock_{i}"]
        for j in range(2):
            w = blk[f"Conv_{j}"]["kernel"]  # (3, 3, C, C)
            bn = blk[f"BatchNorm_{j}"]
            bn_s = blk_stats[f"BatchNorm_{j}"]
            g = bn["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
            b = bn["bias"] - bn_s["mean"] * g
            ws.append((w * g[None, None, None, :]).astype(jnp.bfloat16))
            bs.append(b.astype(jnp.float32))
    return jnp.stack(ws), jnp.stack(bs)


def _trunk_kernel(x_ref, w_ref, b_ref, out_ref, *, num_blocks: int, size: int):
    """x: (Bblk, S, S, C) bf16; w: (L, 3, 3, C, C) bf16; b: (L, C) f32."""
    x = x_ref[:]
    Bblk, S, _, C = x.shape

    def conv3x3(h, layer):
        """Nine shifted (Bblk*S*S, C)@(C, C) matmuls, f32 accumulation.

        Measured variants on v5e: this beats XLA's conv lowering by ~15-20%
        at B=4096; a single deep (.., 9C)@(9C, C) matmul is NOT better here —
        Mosaic can't lower the channel-concat of shifted slices, and staging
        the patch tensor through a VMEM scratch costs more than the deeper
        contraction buys."""
        acc = jnp.broadcast_to(
            b_ref[layer][None, None, None, :], (Bblk, S, S, C)
        ).astype(jnp.float32)
        padded = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for k, (dy, dx) in enumerate(_OFFSETS):
            shifted = padded[:, 1 + dy : 1 + dy + S, 1 + dx : 1 + dx + S, :]
            w_k = w_ref[layer, 1 + dy, 1 + dx]  # (C, C)
            acc = acc + jax.lax.dot_general(
                shifted.reshape(Bblk * S * S, C),
                w_k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(Bblk, S, S, C)
        return acc

    for i in range(num_blocks):
        y = jnp.maximum(conv3x3(x, 2 * i), 0.0).astype(jnp.bfloat16)
        z = conv3x3(y, 2 * i + 1)
        x = jnp.maximum(x.astype(jnp.float32) + z, 0.0).astype(jnp.bfloat16)

    out_ref[:] = x


def fold_block_params_wide(variables: Dict, num_blocks: int):
    """Fold BN and lay the trunk out for the wide-matmul kernel.

    Returns (w (L, C, 9*C) bf16, bias (L, C) f32): tap k's (C_in, C_out)
    matrix in columns [k*C, (k+1)*C), k row-major over (dy, dx). One
    (M, C) @ (C, 9C) matmul then replaces nine (M, C) @ (C, C) ones —
    shift and channel-contraction commute, so the shifts move to the
    matmul *output*, and the MXU sees a 9x wider (better-pipelined) op.
    """
    w, b = fold_block_params(variables, num_blocks)  # (L,3,3,C,C) bf16
    L, _, _, C, _ = w.shape
    wide = w.reshape(L, 9, C, C).transpose(0, 2, 1, 3).reshape(L, C, 9 * C)
    return wide, b


def _shifted_accum(z, bias, Bblk, S, C, acc_dtype=jnp.float32):
    """y[p] = sum_k z[p + o_k, tap k] for z (M, 9C): pad once spatially,
    accumulate nine lane-aligned column slices."""
    z = z.reshape(Bblk, S, S, 9 * C)
    padded = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.broadcast_to(
        bias[None, None, None, :], (Bblk, S, S, C)
    ).astype(acc_dtype)
    for k, (dy, dx) in enumerate(_OFFSETS):
        acc = acc + padded[
            :, 1 + dy: 1 + dy + S, 1 + dx: 1 + dx + S, k * C: (k + 1) * C
        ].astype(acc_dtype)
    return acc


def _trunk_kernel_wide(x_ref, w_ref, b_ref, out_ref, *, num_blocks: int,
                       size: int):
    """x: (Bblk, S, S, C) bf16; w: (L, C, 9C) bf16; b: (L, C) f32."""
    x = x_ref[:]
    Bblk, S, _, C = x.shape

    def conv3x3(h, layer):
        z = jax.lax.dot_general(
            h.reshape(Bblk * S * S, C), w_ref[layer],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # bf16 staging keeps the padded copy small
        return _shifted_accum(z, b_ref[layer], Bblk, S, C)

    for i in range(num_blocks):
        y = jnp.maximum(conv3x3(x, 2 * i), 0.0).astype(jnp.bfloat16)
        z = conv3x3(y, 2 * i + 1)
        x = jnp.maximum(x.astype(jnp.float32) + z, 0.0).astype(jnp.bfloat16)

    out_ref[:] = x


def _trunk_kernel_int8(x_ref, w_ref, s_ref, b_ref, out_ref, *,
                       num_blocks: int, size: int):
    """Int8 trunk: w (L, C, 9C) int8 with per-output-channel scale s (L, C)
    shared across taps, so all nine shifted taps accumulate in one int32
    sum with a single dequant (see models/quantized.py for the scheme)."""
    x = x_ref[:].astype(jnp.float32)
    Bblk, S, _, C = x.shape

    def conv3x3(h, layer):
        # dynamic per-tensor activation scale (inputs are post-ReLU)
        s_act = jnp.maximum(jnp.max(jnp.abs(h)), 1e-8) / 127.0
        q = jnp.clip(jnp.round(h / s_act), -127, 127).astype(jnp.int8)
        z = jax.lax.dot_general(
            q.reshape(Bblk * S * S, C), w_ref[layer],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = _shifted_accum(z, jnp.zeros((C,), jnp.int32), Bblk, S, C,
                             acc_dtype=jnp.int32)
        return acc.astype(jnp.float32) * (s_act * s_ref[layer]) \
            + b_ref[layer][None, None, None, :]

    for i in range(num_blocks):
        y = jnp.maximum(conv3x3(x, 2 * i), 0.0)
        z = conv3x3(y, 2 * i + 1)
        x = jnp.maximum(x + z, 0.0)

    out_ref[:] = x.astype(jnp.bfloat16)


def _grid_call(kern, x, consts, num_blocks, block_games, interpret):
    """Shared pallas_call plumbing: block the games axis, broadcast consts."""
    B, S, _, C = x.shape
    bg = block_games
    while B % bg:
        bg //= 2
    return pl.pallas_call(
        kern,
        grid=(B // bg,),
        in_specs=[
            pl.BlockSpec((bg, S, S, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(c.shape, (lambda nd: lambda i: (0,) * nd)(c.ndim),
                         memory_space=pltpu.VMEM)
            for c in consts
        ],
        out_specs=pl.BlockSpec((bg, S, S, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, S, C), jnp.bfloat16),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), *consts)


@functools.partial(
    jax.jit, static_argnames=("num_blocks", "block_games", "interpret")
)
def fused_trunk_wide(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray,
    num_blocks: int,
    block_games: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Wide-matmul bf16 trunk. x: (B, S, S, C); weights from
    ``fold_block_params_wide``."""
    kern = functools.partial(_trunk_kernel_wide, num_blocks=num_blocks,
                             size=x.shape[1])
    return _grid_call(kern, x, (weights, bias), num_blocks, block_games,
                      interpret)


@functools.partial(
    jax.jit, static_argnames=("num_blocks", "block_games", "interpret")
)
def fused_trunk_int8(
    x: jnp.ndarray,
    w_int8: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_blocks: int,
    block_games: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Int8 trunk (2x MXU peak). Weights from ``quantized.quantize_trunk``."""
    kern = functools.partial(_trunk_kernel_int8, num_blocks=num_blocks,
                             size=x.shape[1])
    return _grid_call(kern, x, (w_int8, w_scale, bias), num_blocks,
                      block_games, interpret)


@functools.partial(
    jax.jit, static_argnames=("num_blocks", "block_games", "interpret")
)
def fused_trunk(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray,
    num_blocks: int,
    block_games: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply the folded residual trunk. x: (B, S, S, C) bf16, B % block ==0."""
    B, S, _, C = x.shape
    bg = block_games
    while B % bg:
        bg //= 2
    grid = (B // bg,)
    kern = functools.partial(_trunk_kernel, num_blocks=num_blocks, size=S)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bg, S, S, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights.shape, lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bg, S, S, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, S, C), jnp.bfloat16),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), weights, bias)


class FusedInference:
    """Eval-mode forward with the Pallas trunk: stem and heads in XLA,
    residual trunk fused. Drop-in for ``apply_fn(variables, x)``."""

    VARIANTS = ("matmul9", "wide", "int8", "int8_xla")

    def __init__(self, model: OthelloResNet, interpret: bool = False,
                 block_games: int = 0, variant: str = "matmul9"):
        if variant not in self.VARIANTS:
            raise ValueError(f"variant must be one of {self.VARIANTS}")
        self.model = model
        self.interpret = interpret
        # 0 = per-variant default tuned for the ~16 MB VMEM budget
        self.block_games = block_games or {
            "matmul9": 32, "wide": 16, "int8": 8, "int8_xla": 0
        }[variant]
        self.variant = variant

    def __call__(self, variables: Dict, x: jnp.ndarray):
        model = self.model
        params = variables["params"]
        stats = variables["batch_stats"]

        def stem(x):
            w = params["Conv_0"]["kernel"].astype(jnp.bfloat16)
            h = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            bn = params["BatchNorm_0"]
            bn_s = stats["BatchNorm_0"]
            g = (bn["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)).astype(jnp.float32)
            b = (bn["bias"] - bn_s["mean"] * g).astype(jnp.float32)
            return jnp.maximum(h.astype(jnp.float32) * g + b, 0.0)

        h = stem(x).astype(jnp.bfloat16)
        if self.variant == "matmul9":
            w_t, b_t = fold_block_params(variables, model.num_blocks)
            h = fused_trunk(
                h, w_t, b_t, model.num_blocks,
                block_games=self.block_games, interpret=self.interpret,
            )
        elif self.variant == "wide":
            w_t, b_t = fold_block_params_wide(variables, model.num_blocks)
            h = fused_trunk_wide(
                h, w_t, b_t, model.num_blocks,
                block_games=self.block_games, interpret=self.interpret,
            )
        else:
            from .quantized import quantize_trunk, xla_int8_trunk
            qt = quantize_trunk(variables, model.num_blocks)
            if self.variant == "int8":
                h = fused_trunk_int8(
                    h, qt.w_int8, qt.w_scale, qt.bias, model.num_blocks,
                    block_games=self.block_games, interpret=self.interpret,
                )
            else:  # int8_xla — lax-only, runs on any backend
                h = xla_int8_trunk(
                    h.astype(jnp.float32), qt, model.num_blocks
                ).astype(jnp.bfloat16)

        # heads in XLA (tiny): reuse the flax submodules by name
        s = model.board_size
        num_actions = s * s + 1

        def bn_eval(prefix, v):
            bn = params[prefix]
            bn_s = stats[prefix]
            g = bn["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
            return v.astype(jnp.float32) * g + (bn["bias"] - bn_s["mean"] * g)

        def conv1x1(name, v):
            w = params[name]["kernel"].astype(jnp.bfloat16)  # (1,1,C,K)
            return jnp.einsum("bhwc,ck->bhwk", v.astype(jnp.bfloat16),
                              w[0, 0])

        p = jnp.maximum(bn_eval("BatchNorm_1", conv1x1("Conv_1", h)), 0.0)
        p = p.reshape(p.shape[0], -1)
        dp = params["Dense_0"]
        logits = p.astype(jnp.bfloat16) @ dp["kernel"].astype(jnp.bfloat16)
        logits = logits.astype(jnp.float32) + dp["bias"]
        log_probs = jax.nn.log_softmax(logits, axis=-1)

        v = jnp.maximum(bn_eval("BatchNorm_2", conv1x1("Conv_2", h)), 0.0)
        v = v.reshape(v.shape[0], -1)
        d1, d2 = params["Dense_1"], params["Dense_2"]
        v = jnp.maximum(
            (v.astype(jnp.bfloat16) @ d1["kernel"].astype(jnp.bfloat16))
            .astype(jnp.float32) + d1["bias"], 0.0)
        v = (v.astype(jnp.bfloat16) @ d2["kernel"].astype(jnp.bfloat16)) \
            .astype(jnp.float32) + d2["bias"]
        value = jnp.tanh(v)
        assert log_probs.shape[-1] == num_actions
        return log_probs, value

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
                       num_blocks: int, size: int, stage_bf16: bool = False):
    """Int8 trunk: w (L, C, 9C) int8 with per-output-channel scale s (L, C)
    shared across taps, so all nine shifted taps accumulate in one int32
    sum with a single dequant (see models/quantized.py for the scheme).

    ``stage_bf16`` converts the (M, 9C) int32 matmul output to bf16 before
    the shifted accumulate: the kernel is VMEM-traffic-bound on exactly that
    staging tensor (results/nn_inference_decomposition.md), so halving its
    bytes targets the bound directly. Precision: |z| ≤ 9·127·127·C ≈ 1.9e7
    fits bf16's exponent; its 8-bit mantissa gives ~0.4% relative error per
    tap, under the ~0.8% already introduced by int8 quantization (taps sum
    in f32)."""
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
        if stage_bf16:
            acc = _shifted_accum(z.astype(jnp.bfloat16),
                                 jnp.zeros((C,), jnp.float32), Bblk, S, C,
                                 acc_dtype=jnp.float32)
        else:
            acc = _shifted_accum(z, jnp.zeros((C,), jnp.int32), Bblk, S, C,
                                 acc_dtype=jnp.int32).astype(jnp.float32)
        return acc * (s_act * s_ref[layer]) \
            + b_ref[layer][None, None, None, :]

    for i in range(num_blocks):
        y = jnp.maximum(conv3x3(x, 2 * i), 0.0)
        z = conv3x3(y, 2 * i + 1)
        x = jnp.maximum(x + z, 0.0)

    out_ref[:] = x.astype(jnp.bfloat16)


def _trunk_kernel_int8_m9(x_ref, w_ref, s_ref, b_ref, out_ref, *,
                          num_blocks: int, size: int):
    """Int8 trunk, input-side shifts: quantize h once per layer, pad the
    *int8* activations (4x smaller than the int32 z of the output-shift
    kernel), nine (M, C) @ (C, C) int8 matmuls summed in int32.

    Rationale: the matmuls are ~10x cheaper than the VPU/VMEM traffic at
    these shapes, so the kernel is structured to move the fewest bytes —
    shifting int8 inputs beats shifting int32 outputs."""
    x = x_ref[:].astype(jnp.float32)
    Bblk, S, _, C = x.shape
    M = Bblk * S * S

    def conv3x3(h, layer):
        s_act = jnp.maximum(jnp.max(jnp.abs(h)), 1e-8) / 127.0
        q = jnp.clip(jnp.round(h / s_act), -127, 127).astype(jnp.int8)
        padded = jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for k, (dy, dx) in enumerate(_OFFSETS):
            shifted = padded[:, 1 + dy: 1 + dy + S, 1 + dx: 1 + dx + S, :]
            z = jax.lax.dot_general(
                shifted.reshape(M, C), w_ref[layer, k],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = z if acc is None else acc + z
        acc = acc.reshape(Bblk, S, S, C)
        return acc.astype(jnp.float32) * (s_act * s_ref[layer]) \
            + b_ref[layer][None, None, None, :]

    for i in range(num_blocks):
        y = jnp.maximum(conv3x3(x, 2 * i), 0.0)
        z = conv3x3(y, 2 * i + 1)
        x = jnp.maximum(x + z, 0.0)

    out_ref[:] = x.astype(jnp.bfloat16)


def _trunk_kernel_int8_patch(x_ref, w_ref, s_ref, b_ref, out_ref, patch_ref,
                             *, num_blocks: int, size: int):
    """Int8 trunk, im2col-in-VMEM: build the (M, 9C) int8 patch matrix in a
    scratch ref (nine lane-aligned column writes), then ONE deep
    (M, 9C) @ (9C, C) int8 matmul per conv. Minimum VMEM traffic of the
    int8 variants and the deepest (most MXU-efficient) contraction.
    w: (L, 9C, C) int8, rows tap-major (see quantize_trunk + caller)."""
    x = x_ref[:].astype(jnp.float32)
    Bblk, S, _, C = x.shape
    M = Bblk * S * S

    def conv3x3(h, layer):
        s_act = jnp.maximum(jnp.max(jnp.abs(h)), 1e-8) / 127.0
        q = jnp.clip(jnp.round(h / s_act), -127, 127).astype(jnp.int8)
        padded = jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for k, (dy, dx) in enumerate(_OFFSETS):
            shifted = padded[:, 1 + dy: 1 + dy + S, 1 + dx: 1 + dx + S, :]
            patch_ref[:, k * C: (k + 1) * C] = shifted.reshape(M, C)
        z = jax.lax.dot_general(
            patch_ref[:], w_ref[layer],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(Bblk, S, S, C)
        return z.astype(jnp.float32) * (s_act * s_ref[layer]) \
            + b_ref[layer][None, None, None, :]

    for i in range(num_blocks):
        y = jnp.maximum(conv3x3(x, 2 * i), 0.0)
        z = conv3x3(y, 2 * i + 1)
        x = jnp.maximum(x + z, 0.0)

    out_ref[:] = x.astype(jnp.bfloat16)


def _trunk_kernel_int8_flat(x_ref, w_ref, s_ref, b_ref, out_ref, patch_ref,
                            *, num_blocks: int, size: int):
    """Int8 trunk in flat (M, C) layout — the fast path.

    The other kernels move a (M, 9C) int32 intermediate (or relayout
    (Bblk, S, S, C) spatial slices) per conv; that VMEM traffic, not the
    MXU, is their measured bound. Here everything stays in (M = games*S*S,
    C) space where a (dy, dx) spatial shift is a plain row shift by
    s = S*dy + dx with a per-position validity mask (which also kills the
    cross-game leakage of a flat shift). Per conv: quantize once, nine
    masked row-shifted int8 column-writes into a (M, 9C) scratch patch,
    then ONE deep (M, 9C) @ (9C, C) int8 matmul straight to the (M, C)
    int32 output — the big intermediate is int8, 4x smaller.

    w: (L, 9C, C) int8 tap-major rows; s: (L, C) f32 per-output-channel
    scales; b: (L, C) f32 folded-BN bias.
    """
    Bblk, S, _, C = x_ref.shape
    M = Bblk * S * S
    x = x_ref[:].reshape(M, C).astype(jnp.float32)

    # per-position validity masks for each tap, (9, S*S) int8, built from
    # iota at trace time (compile-time constants)
    pos = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % (S * S)
    r, c = pos // S, pos % S

    def conv3x3(h, layer):
        s_act = jnp.maximum(jnp.max(jnp.abs(h)), 1e-8) / 127.0
        q = jnp.clip(jnp.round(h / s_act), -127, 127).astype(jnp.int8)
        padded = jnp.pad(q, ((32, 32), (0, 0)))
        for k, (dy, dx) in enumerate(_OFFSETS):
            s_off = 32 + S * dy + dx
            shifted = padded[s_off: s_off + M, :]
            valid = ((r + dy >= 0) & (r + dy < S)
                     & (c + dx >= 0) & (c + dx < S))
            patch_ref[:, k * C: (k + 1) * C] = jnp.where(
                valid, shifted, jnp.int8(0)
            )
        z = jax.lax.dot_general(
            patch_ref[:], w_ref[layer],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return z.astype(jnp.float32) * (s_act * s_ref[layer])[None, :] \
            + b_ref[layer][None, :]

    for i in range(num_blocks):
        y = jnp.maximum(conv3x3(x, 2 * i), 0.0)
        z = conv3x3(y, 2 * i + 1)
        x = jnp.maximum(x + z, 0.0)

    out_ref[:] = x.reshape(Bblk, S, S, C).astype(jnp.bfloat16)


def _trunk_kernel_int8_dx3(x_ref, w_ref, s_ref, b_ref, out_ref, *,
                           num_blocks: int, size: int):
    """Int8 trunk, dx-grouped hybrid shifts — the staging-relayout attack
    (VERDICT r2 item 3b): the out_shift kernel is bound by Mosaic relayouts
    around its (M, 9C) int32 staging shifts (spatial ±1 windows are never
    sublane-tile-aligned). Here the 3x3 conv is decomposed by dx column:

    - dx = ±1 shifts act on the **int8 input** (4x smaller than int32, only
      2 extra shifted copies), masked at row boundaries;
    - each dx group runs one (M, C) @ (C, 3C) int8 matmul;
    - the remaining dy = ±1 shifts act on the (M, 3C) int32 output as row
      shifts of exactly ±S = ±8 — a whole sublane tile for int32 (8, 128)
      tiling, so every staging access is tile-aligned.

    Everything stays in flat (M = Bblk*S*S, C) space; per-position validity
    masks kill cross-row/cross-game leakage. w: (L, 3, C, 3C) int8, dx-major
    groups with dy-minor column blocks; s: (L, C) per-output-channel scales;
    b: (L, C) folded-BN bias."""
    Bblk, S, _, C = x_ref.shape
    M = Bblk * S * S
    x = x_ref[:].reshape(M, C).astype(jnp.float32)

    pos = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % (S * S)
    r, c = pos // S, pos % S

    def conv3x3(h, layer):
        s_act = jnp.maximum(jnp.max(jnp.abs(h)), 1e-8) / 127.0
        q = jnp.clip(jnp.round(h / s_act), -127, 127).astype(jnp.int8)
        qpad = jnp.pad(q, ((1, 1), (0, 0)))
        acc = None
        for gi, dx in enumerate((-1, 0, 1)):
            if dx == 0:
                qdx = q
            else:
                qdx = jnp.where(
                    (c + dx >= 0) & (c + dx < S),
                    qpad[1 + dx: 1 + dx + M, :], jnp.int8(0)
                )
            z = jax.lax.dot_general(
                qdx, w_ref[layer, gi],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (M, 3C)
            zpad = jnp.pad(z, ((S, S), (0, 0)))
            for gj, dy in enumerate((-1, 0, 1)):
                zs = zpad[S + S * dy: S + S * dy + M, gj * C:(gj + 1) * C]
                term = jnp.where((r + dy >= 0) & (r + dy < S), zs, 0)
                acc = term if acc is None else acc + term
        return acc.astype(jnp.float32) * (s_act * s_ref[layer])[None, :] \
            + b_ref[layer][None, :]

    for i in range(num_blocks):
        y = jnp.maximum(conv3x3(x, 2 * i), 0.0)
        z = conv3x3(y, 2 * i + 1)
        x = jnp.maximum(x + z, 0.0)

    out_ref[:] = x.reshape(Bblk, S, S, C).astype(jnp.bfloat16)


def _trunk_kernel_int8_dxcat(x_ref, w_ref, s_ref, b_ref, out_ref, qcat_ref, *,
                             num_blocks: int, size: int):
    """Int8 trunk, dx-concat: dx3 with a 3x deeper MXU contraction.

    Round-4 decomposition (results/nn_inference_decomposition.md): the dx3
    trunk at B=1024 runs at ~55% of the v5e int8 peak — but almost exactly
    100% of the *bf16* MXU rate, suggesting the residual is not staging
    traffic (dx3 already made every large access tile-aligned) but the
    K=128 contraction depth: the MXU only reaches the 2x int8 rate on
    deeper contractions. This kernel keeps dx3's alignment structure and
    feeds the MXU K=384:

    - the three dx-shifted int8 copies (2 misaligned 1-row shifts, cheap at
      int8 width) concatenate along LANES into one (M, 3C) tensor — column
      offsets 0/C/2C are whole (32, 128) int8 tiles;
    - per dy group: ONE (M, 3C) @ (3C, C) int8 matmul (K = 384);
    - dy = ±1 output shifts stay whole-sublane int32 row shifts (±S) as in
      dx3, but on a (M, C) z — 3x less int32 staging than dx3's (M, 3C).

    w: (L, 3, 3C, C) int8 — dy-major groups, rows (dx block, C_in)-major;
    s: (L, C) per-output-channel scales; b: (L, C) folded-BN bias."""
    Bblk, S, _, C = x_ref.shape
    M = Bblk * S * S
    x = x_ref[:].reshape(M, C).astype(jnp.float32)

    pos = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % (S * S)
    r, c = pos // S, pos % S

    def conv3x3(h, layer):
        s_act = jnp.maximum(jnp.max(jnp.abs(h)), 1e-8) / 127.0
        q = jnp.clip(jnp.round(h / s_act), -127, 127).astype(jnp.int8)
        qpad = jnp.pad(q, ((1, 1), (0, 0)))
        # lane-concat via the scratch ref (Mosaic can't concat vectors whose
        # sublane offsets differ; the 3 static column writes are whole
        # (32, 128) int8 tiles)
        for gi, dx in enumerate((-1, 0, 1)):
            if dx == 0:
                part = q
            else:
                part = jnp.where(
                    (c + dx >= 0) & (c + dx < S),
                    qpad[1 + dx: 1 + dx + M, :], jnp.int8(0))
            qcat_ref[:, gi * C: (gi + 1) * C] = part
        qcat = qcat_ref[:]  # (M, 3C) int8
        acc = None
        for gj, dy in enumerate((-1, 0, 1)):
            z = jax.lax.dot_general(
                qcat, w_ref[layer, gj],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (M, C) int32
            zpad = jnp.pad(z, ((S, S), (0, 0)))
            zs = zpad[S + S * dy: S + S * dy + M, :]
            term = jnp.where((r + dy >= 0) & (r + dy < S), zs, 0)
            acc = term if acc is None else acc + term
        return acc.astype(jnp.float32) * (s_act * s_ref[layer])[None, :] \
            + b_ref[layer][None, :]

    for i in range(num_blocks):
        y = jnp.maximum(conv3x3(x, 2 * i), 0.0)
        z = conv3x3(y, 2 * i + 1)
        x = jnp.maximum(x + z, 0.0)

    out_ref[:] = x.reshape(Bblk, S, S, C).astype(jnp.bfloat16)


def _grid_call(kern, x, consts, num_blocks, block_games, interpret,
               scratch_shapes=(), vmem_limit_bytes=None):
    """Shared pallas_call plumbing: block the games axis, broadcast consts."""
    B, S, _, C = x.shape
    bg = block_games
    while B % bg:
        bg //= 2
    compiler_params = None
    if vmem_limit_bytes and not interpret:
        # the dx3 kernel at bg=64 sits ~3% over the 16 MiB *default* scoped
        # budget in some fusion contexts; the physical VMEM headroom is
        # there (measured faster than any bg<=32 point)
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes)
    return pl.pallas_call(
        kern,
        grid=(B // bg,),
        compiler_params=compiler_params,
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
        scratch_shapes=[s(bg) for s in scratch_shapes],
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
    jax.jit,
    static_argnames=("num_blocks", "block_games", "interpret", "kernel"),
)
def fused_trunk_int8(
    x: jnp.ndarray,
    w_int8: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_blocks: int,
    block_games: int = 8,
    interpret: bool = False,
    kernel: str = "out_shift",
) -> jnp.ndarray:
    """Int8 trunk (2x MXU peak). Weights from ``quantized.quantize_trunk``
    ((L, C, 9C) tap-major columns). ``kernel`` picks the data-movement
    strategy: "out_shift" (one wide matmul, int32 output shifts), "m9"
    (int8 input shifts, nine matmuls), "patch" (im2col scratch, one deep
    matmul per conv)."""
    S, C = x.shape[1], x.shape[-1]
    scratch = ()
    vmem_limit = None
    if kernel == "out_shift":
        kfn = _trunk_kernel_int8
    elif kernel == "out_shift_bf16":
        kfn = functools.partial(_trunk_kernel_int8, stage_bf16=True)
    elif kernel == "m9":
        kfn = _trunk_kernel_int8_m9
        # (L, C, 9C) -> (L, 9, C, C): per-tap square matrices
        L = w_int8.shape[0]
        w_int8 = w_int8.reshape(L, C, 9, C).transpose(0, 2, 1, 3)
    elif kernel == "dx3":
        kfn = _trunk_kernel_int8_dx3
        # bg<=64 sits ~3% over the 16 MiB default scoped budget; bg=128
        # needs ~2x the staging VMEM (measured in round 4's bg sweep)
        vmem_limit = (24 if block_games <= 64 else 96) * 1024 * 1024
        # (L, C, 9C) tap-major (k = 3*(dy+1) + dx+1) -> (L, 3, C, 3C):
        # dx-major groups, dy-minor column blocks within each group
        L = w_int8.shape[0]
        wt = w_int8.reshape(L, C, 3, 3, C)  # (L, C, dy, dx, C)
        w_int8 = wt.transpose(0, 3, 1, 2, 4).reshape(L, 3, C, 3 * C)
    elif kernel == "dxcat":
        kfn = _trunk_kernel_int8_dxcat
        vmem_limit = 24 * 1024 * 1024
        # (L, C, 9C) tap-major -> (L, 3, 3C, C): dy-major groups, rows
        # (dx block, C_in)-major to match the lane-concatenated input
        L = w_int8.shape[0]
        wt = w_int8.reshape(L, C, 3, 3, C)  # (L, C_in, dy, dx, C_out)
        w_int8 = wt.transpose(0, 2, 3, 1, 4).reshape(L, 3, 3 * C, C)
        scratch = (
            lambda bg: pltpu.VMEM((bg * S * S, 3 * C), jnp.int8),
        )
    elif kernel in ("patch", "flat"):
        kfn = (_trunk_kernel_int8_patch if kernel == "patch"
               else _trunk_kernel_int8_flat)
        # (L, C, 9C) -> (L, 9C, C): tap-major rows for the im2col matmul
        L = w_int8.shape[0]
        w_int8 = w_int8.reshape(L, C, 9, C).transpose(0, 2, 1, 3) \
            .reshape(L, 9 * C, C)
        scratch = (
            lambda bg: pltpu.VMEM((bg * S * S, 9 * C), jnp.int8),
        )
    else:
        raise ValueError(f"unknown int8 kernel {kernel!r}")
    kern = functools.partial(kfn, num_blocks=num_blocks, size=S)
    return _grid_call(kern, x, (w_int8, w_scale, bias), num_blocks,
                      block_games, interpret, scratch_shapes=scratch,
                      vmem_limit_bytes=vmem_limit)


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

    VARIANTS = ("matmul9", "wide", "int8", "int8_bf16", "int8_m9",
                "int8_patch", "int8_flat", "int8_dx3", "int8_dxcat",
                "int8_xla")

    def __init__(self, model: OthelloResNet, interpret: bool = False,
                 block_games: int = 0, variant: str = "matmul9"):
        if variant not in self.VARIANTS:
            raise ValueError(f"variant must be one of {self.VARIANTS}")
        self.model = model
        self.interpret = interpret
        # 0 = per-variant default tuned for the ~16 MB VMEM budget
        # measured on TPU v5e at B=4096 (trunk-only, 10x128): out_shift int8
        # bg=16 is the sweet spot (10.1 ms vs 11.2 at bg=8, 11.7 at bg=32)
        self.block_games = block_games or {
            "matmul9": 32, "wide": 16, "int8": 16, "int8_bf16": 16,
            "int8_m9": 32, "int8_patch": 32, "int8_flat": 32, "int8_dx3": 64,
            "int8_dxcat": 64, "int8_xla": 0,
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
            if self.variant.startswith("int8_") and self.variant != "int8_xla" \
                    or self.variant == "int8":
                kernel = {"int8": "out_shift",
                          "int8_bf16": "out_shift_bf16", "int8_m9": "m9",
                          "int8_patch": "patch", "int8_flat": "flat",
                          "int8_dx3": "dx3",
                          "int8_dxcat": "dxcat"}[self.variant]
                h = fused_trunk_int8(
                    h, qt.w_int8, qt.w_scale, qt.bias, model.num_blocks,
                    block_games=self.block_games, interpret=self.interpret,
                    kernel=kernel,
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

#!/usr/bin/env python
"""Forward-pass decomposition at the MCTS operating point (VERDICT r3
weak #1: no published stem/trunk/heads/glue breakdown of the fused
int8_dx3 path at B=1024 existed, so nobody knew where the next 10-15%
lives).

Times each component of ``FusedInference`` in isolation — stem, quantize,
trunk (per variant/bg), heads — plus the full forward, with the
chained-scan + null-subtraction methodology of
results/nn_inference_decomposition.md: R forwards chained inside one jit
with an iteration-dependent input perturbation (so XLA can't CSE), a
forced D2H read, and the fixed per-call cost (dispatch + axon tunnel
round trip) measured by a null program and subtracted.

Usage: python scripts/profile_forward_parts.py [--batch 1024] [--reps 64]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=64, help="chain length")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--bgs", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--kernels", nargs="+", default=["dx3", "dxcat"])
    ap.add_argument("--full-variants", nargs="+", default=["int8_dx3"])
    args = ap.parse_args()
    import jax

    if args.platform:
        # env vars cannot override sitecustomize's platform registration
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from othello_reinforcement_learning_test_tpu.models import (
        OthelloResNet, init_variables)
    from othello_reinforcement_learning_test_tpu.models.pallas_resnet import (
        FusedInference, fused_trunk_int8)
    from othello_reinforcement_learning_test_tpu.models.quantized import (
        quantize_trunk)
    from othello_reinforcement_learning_test_tpu.train import apply_eval

    B, R = args.batch, args.reps
    model = OthelloResNet(num_blocks=10, num_filters=128)
    variables = init_variables(model, jax.random.PRNGKey(0))
    interpret = jax.devices()[0].platform != "tpu"

    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 8, 3), jnp.float32)
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, 8, 8, 128),
                           jnp.bfloat16)
    qt = jax.block_until_ready(quantize_trunk(variables, model.num_blocks))
    eps = jnp.float32(1e-3)
    overhead = [0.0]

    def timed(name, fn, init):
        """fn(x, i) -> array(s); chained R times with i-dependence."""
        @jax.jit
        def run(init):
            def body(c, i):
                out = fn(c, i)
                return out, ()
            out, _ = jax.lax.scan(body, init, jnp.arange(R))
            return jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda t: t.astype(jnp.float32).sum(), out))

        float(run(init))  # compile + real D2H
        best = 1e9
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(run(init))
            best = min(best, time.perf_counter() - t0)
        per = (best - overhead[0]) / R
        print(f"{name:34s}: {per*1e3:8.3f} ms   (raw {best/R*1e3:.3f})",
              flush=True)
        return per

    t_null = timed("null (per-call overhead)",
                   lambda c, i: c + eps * i.astype(jnp.float32),
                   jnp.zeros((8, 128), jnp.float32))
    overhead[0] = t_null * R

    fi = {v: FusedInference(model, variant=v, interpret=interpret)
          for v in dict.fromkeys(["int8_dx3"] + args.full_variants)}

    # stem alone: (B,8,8,3) -> (B,8,8,128) bf16 (XLA conv + folded BN)
    def stem_only(c, i):
        params = variables["params"]
        stats = variables["batch_stats"]
        x = c + eps * i.astype(jnp.float32)
        w = params["Conv_0"]["kernel"].astype(jnp.bfloat16)
        h = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bn, bn_s = params["BatchNorm_0"], stats["BatchNorm_0"]
        g = (bn["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)).astype(jnp.float32)
        b = (bn["bias"] - bn_s["mean"] * g).astype(jnp.float32)
        out = jnp.maximum(h.astype(jnp.float32) * g + b, 0.0)
        return c + out[..., :3] * 0  # keep carry shape, consume out

    t_stem = timed("stem (XLA conv 3->128 + BN)", stem_only, x0)

    # quantize_trunk alone (checks whether XLA hoists it in loops: this row
    # is its un-hoisted per-call cost)
    def quant_only(c, i):
        v2 = jax.tree.map(lambda t: t, variables)
        v2["params"]["Conv_0"] = jax.tree.map(
            lambda t: t + eps * i.astype(t.dtype) * 0, v2["params"]["Conv_0"])
        # perturb one trunk weight so the quantize can't be CSE'd across i
        blk = v2["params"]["ResBlock_0"]["Conv_0"]
        blk["kernel"] = blk["kernel"] + eps * i.astype(jnp.float32)
        qt2 = quantize_trunk(v2, model.num_blocks)
        return c + qt2.w_scale.sum() * 0 + qt2.bias.sum() * 0 \
            + qt2.w_int8.astype(jnp.float32).sum() * 0

    t_q = timed("quantize_trunk (if unhoisted)", quant_only,
                jnp.zeros((8, 128), jnp.float32))

    # trunk alone per kernel x bg
    for kernel in args.kernels:
        for bg in args.bgs:
            def trunk_only(c, i, bg=bg, kernel=kernel):
                h = c + (eps * i.astype(jnp.float32)).astype(jnp.bfloat16)
                out = fused_trunk_int8(
                    h, qt.w_int8, qt.w_scale, qt.bias, model.num_blocks,
                    block_games=bg, interpret=interpret, kernel=kernel)
                return out

            timed(f"trunk int8_{kernel} bg={bg}", trunk_only, h0)

    # heads alone: (B,8,8,128) -> (log_probs, value)
    def heads_only(c, i):
        params = variables["params"]
        stats = variables["batch_stats"]
        h = c + (eps * i.astype(jnp.float32)).astype(jnp.bfloat16)

        def bn_eval(prefix, v):
            bn, bn_s = params[prefix], stats[prefix]
            g = bn["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
            return v.astype(jnp.float32) * g + (bn["bias"] - bn_s["mean"] * g)

        def conv1x1(name, v):
            w = params[name]["kernel"].astype(jnp.bfloat16)
            return jnp.einsum("bhwc,ck->bhwk", v.astype(jnp.bfloat16), w[0, 0])

        p = jnp.maximum(bn_eval("BatchNorm_1", conv1x1("Conv_1", h)), 0.0)
        p = p.reshape(p.shape[0], -1)
        dp = params["Dense_0"]
        logits = (p.astype(jnp.bfloat16) @ dp["kernel"].astype(jnp.bfloat16)
                  ).astype(jnp.float32) + dp["bias"]
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        v = jnp.maximum(bn_eval("BatchNorm_2", conv1x1("Conv_2", h)), 0.0)
        v = v.reshape(v.shape[0], -1)
        d1, d2 = params["Dense_1"], params["Dense_2"]
        v = jnp.maximum(
            (v.astype(jnp.bfloat16) @ d1["kernel"].astype(jnp.bfloat16))
            .astype(jnp.float32) + d1["bias"], 0.0)
        v = (v.astype(jnp.bfloat16) @ d2["kernel"].astype(jnp.bfloat16)
             ).astype(jnp.float32) + d2["bias"]
        value = jnp.tanh(v)
        return c + (log_probs.sum() + value.sum()).astype(jnp.bfloat16) * 0

    t_heads = timed("heads (XLA 1x1 convs + dense)", heads_only, h0)

    # full forward, fused variants and XLA bf16
    rows = [(f"full fused {v}", (lambda v=v: lambda vr, x: fi[v](vr, x))())
            for v in args.full_variants]
    rows.append(("full XLA bf16", apply_eval(model)))
    for name, net in rows:
        def full_fwd(c, i, net=net):
            x = c + eps * i.astype(jnp.float32)
            lp, v = net(variables, x)
            return c + (lp.sum() + v.sum()) * 0

        timed(name, full_fwd, x0)

    print(f"\nB={B}, chain R={R}, best of {args.repeats}; "
          f"stem={t_stem*1e3:.3f} heads={t_heads*1e3:.3f} "
          f"quant={t_q*1e3:.3f} ms")


if __name__ == "__main__":
    main()

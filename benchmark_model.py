#!/usr/bin/env python
"""Network throughput benchmark (counterpart of reference
``benchmark_model.py``): inference throughput across batch sizes 1-256 for
bf16 (the AMP equivalent) and f32 compute, plus device memory stats where
the backend exposes them (``/root/reference/benchmark_model.py:15-144``)."""

import argparse
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--blocks", type=int, default=10)
    parser.add_argument("--filters", type=int, default=128)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--repeats", type=int, default=10)
    parser.add_argument("--fused", action="store_true",
                        help="also measure the fused Pallas inference trunk")
    parser.add_argument("--fused-variants", nargs="+",
                        default=["matmul9", "wide", "int8", "int8_xla"],
                        help="trunk variants to measure with --fused: "
                             "matmul9 (9 small matmuls), wide (one "
                             "(M,C)@(C,9C) matmul per conv), int8 (Pallas "
                             "int8, 2x MXU peak), int8_xla (lax-only int8)")
    parser.add_argument("--block-games", type=int, default=0,
                        help="games per Pallas grid block (0 = per-variant "
                             "default)")
    parser.add_argument("--chain", type=int, default=16,
                        help="forwards chained inside one jit call (amortizes "
                             "dispatch/tunnel latency)")
    parser.add_argument(
        "--batches", type=int, nargs="+",
        default=[1, 8, 32, 64, 128, 256, 1024, 4096],
    )
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from othello_reinforcement_learning_test_tpu.utils import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax.numpy as jnp

    from othello_reinforcement_learning_test_tpu.models import (
        OthelloResNet,
        init_variables,
        param_count,
    )

    dev = jax.devices()[0]
    print(f"device: {dev}")

    # Fixed per-call overhead (dispatch + D2H read — ~24 ms over the axon
    # tunnel, ~50 us locally): measured with a null program of the same
    # call structure and subtracted from every row, otherwise a 16-chain
    # call at B=4096 reads ~1.5 ms/forward too slow. Reported alongside.
    @jax.jit
    def _null(x):
        def body(c, _):
            s = (x + c).sum()
            return s * 1e-9, s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=args.chain)
        return outs.sum()

    xn = jnp.zeros((8,), jnp.float32)
    float(_null(xn))
    t0 = time.perf_counter()
    null_reps = max(args.repeats, 5)
    for _ in range(null_reps):
        float(_null(xn))
    null_call = (time.perf_counter() - t0) / null_reps
    print(f"per-call dispatch overhead: {null_call * 1e3:.2f} ms "
          f"(subtracted from each row)")

    def report(b, dt_raw):
        dt = dt_raw - null_call / args.chain
        if dt <= 0.1 * dt_raw:
            # corrected time is inside measurement jitter of the dispatch
            # overhead — an on-device boards/s figure would be meaningless
            print(
                f"batch {b:5d}: dispatch-dominated "
                f"({dt_raw * 1e3:7.2f} ms raw, x{args.chain} chained; "
                f"raise --chain to resolve)"
            )
            return
        print(
            f"batch {b:5d}: {b / dt:12,.0f} boards/sec "
            f"({dt * 1e3:7.2f} ms/batch on-device, "
            f"{dt_raw * 1e3:7.2f} ms raw, x{args.chain} chained)"
        )

    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        model = OthelloResNet(
            num_blocks=args.blocks, num_filters=args.filters, dtype=dtype
        )
        variables = init_variables(model, jax.random.PRNGKey(0))
        if dtype_name == "bf16":
            print(
                f"model: {args.blocks} blocks x {args.filters} filters "
                f"({param_count(variables['params']):,} params)"
            )
        print(f"--- compute dtype {dtype_name} ---")

        chain = args.chain

        @jax.jit
        def fwd(v, x):
            # chain forwards inside one program so per-call dispatch latency
            # amortizes; inputs perturbed by the carry to defeat CSE
            def body(carry, _):
                lp, val = model.apply(v, x + carry, train=False)
                out = lp.sum() + val.sum()
                return out * 1e-9, out

            _, outs = jax.lax.scan(body, jnp.float32(0), None, length=chain)
            return outs.sum()

        for b in args.batches:
            x = jnp.zeros((b, 8, 8, 3), jnp.float32)
            try:
                float(fwd(variables, x))  # compile + warmup
                t0 = time.perf_counter()
                for _ in range(args.repeats):
                    float(fwd(variables, x))
                dt = (time.perf_counter() - t0) / (args.repeats * chain)
                report(b, dt)
            except Exception as e:  # noqa: BLE001 — OOM etc (reference
                # catches OOM the same way, benchmark_model.py:97-102)
                print(f"batch {b:5d}: failed ({type(e).__name__}: {e})")

    if args.fused:
        from othello_reinforcement_learning_test_tpu.models.pallas_resnet import (
            FusedInference,
        )

        model = OthelloResNet(num_blocks=args.blocks, num_filters=args.filters)
        variables = init_variables(model, jax.random.PRNGKey(0))
        chain = args.chain

        for variant in args.fused_variants:
            fused = FusedInference(
                model,
                interpret=dev.platform != "tpu" and variant != "int8_xla",
                variant=variant, block_games=args.block_games,
            )

            @jax.jit
            def fwd_fused(v, x, fused=fused):
                def body(carry, _):
                    lp, val = fused(v, x + carry)
                    out = lp.sum() + val.sum()
                    return out * 1e-9, out

                _, outs = jax.lax.scan(
                    body, jnp.float32(0), None, length=chain
                )
                return outs.sum()

            print(f"--- fused trunk variant {variant} "
                  f"(eval mode, block_games={fused.block_games}) ---")
            for b in args.batches:
                x = jnp.zeros((b, 8, 8, 3), jnp.float32)
                try:
                    float(fwd_fused(variables, x))
                    t0 = time.perf_counter()
                    for _ in range(args.repeats):
                        float(fwd_fused(variables, x))
                    dt = (time.perf_counter() - t0) / (args.repeats * chain)
                    report(b, dt)
                except Exception as e:  # noqa: BLE001
                    print(f"batch {b:5d}: failed ({type(e).__name__}: {e})")

    try:
        stats = dev.memory_stats()
        if stats:
            print(
                f"device memory: in-use "
                f"{stats.get('bytes_in_use', 0) / 2**20:.1f} MiB, "
                f"peak {stats.get('peak_bytes_in_use', 0) / 2**20:.1f} MiB"
            )
    except Exception:  # noqa: BLE001 — backend without memory stats
        pass


if __name__ == "__main__":
    main()

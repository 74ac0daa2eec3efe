#!/usr/bin/env python
"""Bitboard engine benchmark (counterpart of reference ``benchmark.py``).

Measures random-vs-random playout throughput plus per-operation
microbenchmarks, with the reference's >=5,000 games/sec pass bar
(``/root/reference/benchmark.py:42-125``). Covers all three engines:

- native C++ host engine (the reference's Cython comparable)
- batched JAX engine on the default device (TPU when present)
- batched JAX engine pinned to CPU (``--platform cpu``)
"""

import argparse
import time


def bench_native(n_games: int) -> None:
    from othello_reinforcement_learning_test_tpu.ops import native

    if not native.available():
        print("native engine unavailable (no C++ toolchain)")
        return
    print("=== native C++ engine (host, single core) ===")
    native.random_playout_benchmark(200, seed=0)  # warmup
    out = native.random_playout_benchmark(n_games, seed=1)
    print(
        f"games: {out['games']}  time: {out['seconds']:.3f}s  "
        f"games/sec: {out['games_per_sec']:,.0f}  "
        f"moves/sec: {out['moves_per_sec']:,.0f}  "
        f"avg moves: {out['moves'] / out['games']:.1f}"
    )
    print(
        f"black wins: {out['black_wins']}  white wins: {out['white_wins']}  "
        f"draws: {out['draws']}"
    )
    bar = 5000
    status = "PASS" if out["games_per_sec"] >= bar else "FAIL"
    print(f"reference pass bar ({bar:,} games/sec): {status}")

    # per-operation microbenchmark (reference benchmark.py:98-125)
    b = native.NativeBoard()
    n = 100_000
    t0 = time.perf_counter()
    for _ in range(n):
        b.get_legal_moves_bits()
    t_legal = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        b.copy()
    t_copy = time.perf_counter() - t0
    print(
        f"microbench ({n:,} calls): legal_moves {n / t_legal:,.0f}/s, "
        f"copy {n / t_copy:,.0f}/s"
    )


def bench_jax(batch: int, repeats: int) -> None:
    import jax

    from othello_reinforcement_learning_test_tpu.utils import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax.numpy as jnp

    from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine

    print(f"=== batched JAX engine on {jax.devices()[0]} (batch {batch:,}) ===")
    engine = get_engine(8, "reference")
    T = 132

    @jax.jit
    def play(key):
        s = engine.initial_state((batch,))

        def cond(c):
            s, key, t, steps = c
            return (~engine.is_terminal(s)).any() & (t < T)

        def body(c):
            s, key, t, steps = c
            key, sub = jax.random.split(key)
            live = ~engine.is_terminal(s)
            mask = engine.legal_actions(s)
            a = jax.random.categorical(
                sub, jnp.where(mask, 0.0, -jnp.inf), axis=-1
            ).astype(jnp.int32)
            nxt, _ = engine.step(s, a)
            s = jax.tree.map(
                lambda n, o: jnp.where(
                    live.reshape(live.shape + (1,) * (n.ndim - live.ndim)), n, o
                ),
                nxt,
                s,
            )
            return s, key, t + 1, steps + live.sum()

        s, _, _, steps = jax.lax.while_loop(cond, body, (s, key, 0, jnp.int32(0)))
        return steps

    int(play(jax.random.PRNGKey(0)))  # warmup + compile
    best = 0.0
    for r in range(repeats):
        t0 = time.perf_counter()
        steps = int(play(jax.random.PRNGKey(r + 1)))
        dt = time.perf_counter() - t0
        best = max(best, batch / dt)
        last_steps, last_dt = steps, dt
    print(
        f"games/sec: {best:,.0f}   env-steps/sec: {last_steps / last_dt:,.0f}  "
        f"(wall {last_dt:.3f}s)"
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--games", type=int, default=10000,
                        help="native playout count")
    parser.add_argument("--batch", type=int, default=65536,
                        help="JAX lockstep batch")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--platform", default=None, help="force jax platform")
    parser.add_argument("--skip-jax", action="store_true")
    args = parser.parse_args()

    bench_native(args.games)
    if not args.skip_jax:
        if args.platform:
            import jax

            jax.config.update("jax_platforms", args.platform)
        print()
        bench_jax(args.batch, args.repeats)


if __name__ == "__main__":
    main()

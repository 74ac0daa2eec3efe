#!/usr/bin/env python
"""Headline benchmark: batched random self-play throughput on one chip.

Mirrors the reference's ``benchmark.py`` workload (random vs random games to
termination, ``/root/reference/benchmark.py:16-95``) — the reference's
Cython engine claims 10,000+ games/sec on a laptop CPU core
(BASELINE.md). Here the whole workload is ONE jitted XLA program stepping
thousands of games in lockstep on the device.

Prints exactly one JSON line:
  {"metric": "selfplay_games_per_sec", "value": N, "unit": "games/s",
   "vs_baseline": N / 10000, ...extras}
"""

import argparse
import json
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=262144, help="games in lockstep")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--platform", type=str, default=None,
                        help="force jax platform (e.g. cpu)")
    parser.add_argument("--size", type=int, default=8)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine

    dev = jax.devices()[0]
    engine = get_engine(args.size, "reference")
    B = args.batch
    T = 2 * args.size * args.size + 4

    @jax.jit
    def play(key):
        s = engine.initial_state((B,))
        mask0, term0, _ = engine.observe(s)

        def cond(carry):
            s, mask, term, key, t, steps = carry
            return (~term).any() & (t < T)

        def body(carry):
            # one observation (2 flood passes) + one flip resolution per step;
            # legality/terminality carried between iterations
            s, mask, term, key, t, steps = carry
            key, sub = jax.random.split(key)
            live = ~term
            a = jax.random.categorical(
                sub, jnp.where(mask, 0.0, -jnp.inf), axis=-1
            ).astype(jnp.int32)
            nxt, _ = engine.step(s, a, pass_legal=mask[..., engine.pass_action])
            s = jax.tree.map(
                lambda n, o: jnp.where(
                    live.reshape(live.shape + (1,) * (n.ndim - live.ndim)), n, o
                ),
                nxt,
                s,
            )
            mask, term, _ = engine.observe(s)
            return s, mask, term, key, t + 1, steps + live.sum()

        s, _, _, _, t, steps = jax.lax.while_loop(
            cond, body, (s, mask0, term0, key, 0, jnp.int32(0))
        )
        return engine.winner(s), steps, s.move_count

    # warmup / compile
    w, steps, moves = play(jax.random.PRNGKey(0))
    jax.block_until_ready(w)
    int(steps)

    best_gps = 0.0
    best = None
    for r in range(args.repeats):
        t0 = time.perf_counter()
        w, steps, moves = play(jax.random.PRNGKey(r + 1))
        # force a real device->host transfer so async dispatch layers can't
        # report completion early (int() reads the scalar result)
        steps = int(steps)
        jax.block_until_ready(w)
        dt = time.perf_counter() - t0
        games_ps = B / dt
        if games_ps > best_gps:
            best_gps = games_ps
            best = (dt, steps, float(jnp.mean(moves)))

    dt, env_steps, avg_moves = best
    out = {
        "metric": "selfplay_games_per_sec",
        "value": round(best_gps, 1),
        "unit": "games/s",
        "vs_baseline": round(best_gps / 10000.0, 3),
        "env_steps_per_sec": round(env_steps / dt, 1),
        "batch": B,
        "avg_moves": round(avg_moves, 2),
        "device": str(dev),
        "wall_s": round(dt, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Headline benchmark on one chip. Prints exactly one JSON line.

Modes:
  random (default) — batched random self-play to termination, the reference
      ``benchmark.py`` workload (``/root/reference/benchmark.py:16-95``;
      its Cython engine claims 10k+ games/sec on a laptop CPU —
      vs_baseline is measured against that 10k figure).
  mcts — batched AlphaZero self-play (array-tree MCTS + ResNet evals),
      the real training workload; reports games/s, env-steps/s and NN-backed
      simulation throughput.
  train — one full training iteration (self-play -> buffer -> SGD steps) in
      the default_8x8.yaml regime (100 games, 25 sims, 10x128 net); the
      reference does this in ~5 minutes on an RTX 4050 (README.md:293-294),
      vs_baseline compares wall time against those 300 s.
"""

import argparse
import json
import sys
import time


def _force_read(x) -> int:
    """Round-trip a scalar to the host so async dispatch layers can't report
    completion early."""
    return int(x)


def bench_random(args, jax, jnp, engine):
    B = args.batch
    T = 2 * args.size * args.size + 4

    if args.pallas:
        return bench_random_pallas(args, jax, jnp, engine)

    @jax.jit
    def play(key):
        s = engine.initial_state((B,))
        mask0, term0, _ = engine.observe(s)

        def cond(carry):
            s, mask, term, key, t, steps = carry
            return (~term).any() & (t < T)

        def body(carry):
            # one observation (2 flood passes) + one flip resolution per step
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

    w, steps, moves = play(jax.random.PRNGKey(0))
    _force_read(steps)

    best_gps, best = 0.0, None
    for r in range(args.repeats):
        t0 = time.perf_counter()
        w, steps, moves = play(jax.random.PRNGKey(r + 1))
        steps = _force_read(steps)
        dt = time.perf_counter() - t0
        if B / dt > best_gps:
            best_gps = B / dt
            best = (dt, steps, float(jnp.mean(moves)))

    dt, env_steps, avg_moves = best
    return {
        "metric": "selfplay_games_per_sec",
        "value": round(best_gps, 1),
        "unit": "games/s",
        "vs_baseline": round(best_gps / 10000.0, 3),
        "env_steps_per_sec": round(env_steps / dt, 1),
        "batch": B,
        "avg_moves": round(avg_moves, 2),
        "wall_s": round(dt, 4),
    }


def bench_random_pallas(args, jax, jnp, engine):
    """Random self-play through the fused Pallas step kernel."""
    from othello_reinforcement_learning_test_tpu.ops.pallas_step import (
        pack_boards,
        play_random_games,
    )

    B = args.batch
    s = engine.initial_state((B,))
    packed = pack_boards(s.me, s.opp)
    interpret = jax.devices()[0].platform != "tpu"

    def run(seed):
        return play_random_games(
            packed, jnp.int32(seed), max_plies=2 * args.size**2 + 4,
            size=engine.size, rules=engine.rules, interpret=interpret,
        )

    final, steps, plies = run(0)
    _force_read(steps)

    best_gps, best = 0.0, None
    for r in range(args.repeats):
        t0 = time.perf_counter()
        final, steps, plies = run(r + 1)
        steps = _force_read(steps)
        dt = time.perf_counter() - t0
        if B / dt > best_gps:
            best_gps = B / dt
            best = (dt, steps)

    dt, env_steps = best
    return {
        "metric": "selfplay_games_per_sec",
        "value": round(best_gps, 1),
        "unit": "games/s",
        "vs_baseline": round(best_gps / 10000.0, 3),
        "env_steps_per_sec": round(env_steps / dt, 1),
        "batch": B,
        "kernel": "pallas_fused_step" + (" (interpret)" if interpret else ""),
        "wall_s": round(dt, 4),
    }


def bench_mcts(args, jax, jnp, engine):
    from othello_reinforcement_learning_test_tpu.models import (
        OthelloResNet,
        init_variables,
    )
    from othello_reinforcement_learning_test_tpu.train import apply_eval, play_games

    B = args.batch
    sims = args.simulations
    model = OthelloResNet(num_blocks=args.blocks, num_filters=args.filters)
    variables = init_variables(model, jax.random.PRNGKey(0))

    if args.net_variant == "xla":
        apply_fn = apply_eval(model)
    else:
        # fused Pallas inference trunk (TPU): int8 measures +37% boards/s
        # over XLA bf16 at B=4096 (see results/nn_inference_decomposition.md)
        from othello_reinforcement_learning_test_tpu.models.pallas_resnet import (
            FusedInference,
        )
        apply_fn = FusedInference(model, variant=args.net_variant)

    def run(seed):
        traj = play_games(
            engine,
            apply_fn,
            variables,
            jax.random.PRNGKey(seed),
            num_games=B,
            num_simulations=sims,
            temperature_threshold=15,
        )
        return traj

    traj = run(0)
    _force_read(traj.num_moves.sum())

    best = None
    for r in range(args.repeats):
        t0 = time.perf_counter()
        traj = run(r + 1)
        total_moves = _force_read(traj.num_moves.sum())
        dt = time.perf_counter() - t0
        gps = B / dt
        if best is None or gps > best[0]:
            best = (gps, dt, total_moves, int(traj.num_moves.max()))

    gps, dt, total_moves, max_moves = best
    env_steps = total_moves / dt
    return {
        "metric": "mcts_selfplay_games_per_sec",
        "value": round(gps, 2),
        "unit": "games/s",
        # reference trains 100 games/iter in ~300 s => ~0.33 games/s
        "vs_baseline": round(gps / (100.0 / 300.0), 1),
        "env_steps_per_sec": round(env_steps, 1),
        "nn_sims_per_sec": round(env_steps * sims, 1),
        "batch": B,
        "num_simulations": sims,
        "model": f"{args.blocks}x{args.filters}",
        "net_variant": args.net_variant,
        "wall_s": round(dt, 3),
        # lockstep tail diagnostic: the loop runs max_moves plies while
        # throughput counts mean moves — the gap is the tail-waste factor
        # (results/nn_inference_decomposition.md round 4)
        "max_moves": max_moves,
        "avg_moves": round(total_moves / B, 1),
    }


def bench_train(args, jax, jnp, engine):
    from othello_reinforcement_learning_test_tpu.train import AlphaZeroTrainer
    from othello_reinforcement_learning_test_tpu.utils import load_config

    cfg = load_config()
    cfg["training"].update(
        num_iterations=1,
        self_play_episodes_per_iter=args.batch,
        batch_size=256,
        train_epochs_per_iter=10,
        replay_buffer_size=100_000,
        checkpoint_interval=10_000,
    )
    cfg["model"].update(num_blocks=args.blocks, num_filters=args.filters)
    cfg["mcts"]["num_simulations"] = args.simulations
    if args.net_variant != "xla":
        cfg["system"]["self_play_net_variant"] = args.net_variant
    import tempfile

    d = tempfile.mkdtemp()
    cfg["paths"]["checkpoint_dir"] = d + "/m"
    cfg["paths"]["log_dir"] = d + "/l"
    trainer = AlphaZeroTrainer(cfg, log_cb=None)

    # warmup iteration compiles everything
    trainer._train_iteration(0, args.batch, 3, [], [])
    # steady-state iteration (self-play -> buffer -> 10 SGD steps; the
    # reference's ~300 s/iteration is also a steady-state figure — its
    # checkpoint lands every 10 iterations, trainer.py:224-232. Round 3
    # timed train(1), whose terminal final_model checkpoint save dominated
    # the measurement.)
    t0 = time.perf_counter()
    trainer._train_iteration(1, args.batch, 3, [], [])
    dt = time.perf_counter() - t0
    return {
        "metric": "train_iteration_seconds",
        "value": round(dt, 3),
        "unit": "s/iteration",
        # reference: ~300 s/iteration on RTX 4050 (README.md:293-294)
        "vs_baseline": round(300.0 / dt, 1),
        "episodes": args.batch,
        "num_simulations": args.simulations,
        "model": f"{args.blocks}x{args.filters}",
        "net_variant": args.net_variant,
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["all", "random", "mcts", "train"],
                        default="all",
                        help="'all' (default) runs random+mcts+train and "
                             "emits one combined JSON line so the driver-"
                             "captured artifact records the real workloads, "
                             "not just the random-mode toy (round-5 VERDICT "
                             "item 3)")
    parser.add_argument("--batch", type=int, default=None,
                        help="games in lockstep (defaults per mode)")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--size", type=int, default=8)
    parser.add_argument("--simulations", type=int, default=25)
    parser.add_argument("--net-variant", default="xla",
                        choices=["xla", "matmul9", "int8", "int8_dx3",
                                 "int8_xla"],
                        help="mcts mode: network inference path (xla bf16, "
                             "fused Pallas bf16 trunk, fused Pallas int8)")
    parser.add_argument("--blocks", type=int, default=10)
    parser.add_argument("--filters", type=int, default=128)
    parser.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="random mode: use the fused Pallas step kernel "
                             "(default: on for TPU, off otherwise)")
    args = parser.parse_args()
    import jax

    tpu_probe = None
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    else:
        # The tunneled TPU plugin in this image hangs INDEFINITELY (no
        # exception) when the tunnel is down, which would wedge the whole
        # bench at jax.devices(). Probe the default backend in a throwaway
        # subprocess with a hard timeout; on failure fall back to CPU so
        # the bench always emits its JSON line (device field says which).
        import subprocess

        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=120,
            )
            ok = probe.returncode == 0 and probe.stdout.strip()
            tpu_probe = probe.stdout.strip() if ok else "init-failed"
        except subprocess.TimeoutExpired:
            tpu_probe = "timeout"
        if tpu_probe in ("timeout", "init-failed"):
            print(f"default-backend probe {tpu_probe}; falling back to cpu",
                  file=sys.stderr)
            jax.config.update("jax_platforms", "cpu")

    from othello_reinforcement_learning_test_tpu.utils import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    on_tpu = jax.devices()[0].platform == "tpu"
    if args.pallas is None:
        args.pallas = on_tpu
    import copy

    def resolve(mode):
        """Per-mode defaults for batch / net-variant (used by 'all')."""
        a = copy.copy(args)
        a.mode = mode
        if a.batch is None:
            a.batch = {
                # Pallas fused step keeps scaling past 1M lockstep games
                # (B=4M measures ~+20% games/s over B=1M on v5e)
                "random": 4194304 if a.pallas else 262144,
                "mcts": 1024,
                "train": 100,
            }[mode]
        return a

    import jax.numpy as jnp

    from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine

    engine = get_engine(args.size, "reference")
    fns = {"random": bench_random, "mcts": bench_mcts, "train": bench_train}
    if args.mode == "all":
        # mcts runs the measured-best inference path for the platform
        # (int8_dx3 fused Pallas trunk on TPU — 282 g/s at B=1024, see
        # results/nn_inference_decomposition.md; XLA bf16 elsewhere)
        # unless the user forced a variant explicitly
        modes = {}
        for mode in ("random", "mcts", "train"):
            a = resolve(mode)
            if mode == "mcts" and on_tpu and args.net_variant == "xla" \
                    and "--net-variant" not in sys.argv:
                a.net_variant = "int8_dx3"
            modes[mode] = fns[mode](a, jax, jnp, engine)
        # headline = the real training workload (MCTS self-play games/s);
        # the per-mode sub-objects carry their own vs_baseline
        out = {
            "metric": "alphazero_suite_mcts_games_per_sec",
            "value": modes["mcts"]["value"],
            "unit": "games/s",
            "vs_baseline": modes["mcts"]["vs_baseline"],
            "modes": modes,
        }
    else:
        out = fns[args.mode](resolve(args.mode), jax, jnp, engine)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())

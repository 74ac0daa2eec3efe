#!/usr/bin/env python
"""Learning-curve harness: evaluate every checkpoint in a directory against
Random and Greedy baselines and emit a curve JSON + console table.

This is the evidence artifact for learning-curve parity with the reference
regime (BASELINE.md: win rate vs Greedy over training; the reference's
illustrative numbers are 75% vs Random / 65% vs Greedy at iteration 100 with
100-sim eval, README.md:142-148).
"""

import argparse
import json
import os
import re
from datetime import datetime


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--games", type=int, default=32)
    parser.add_argument("--simulations", type=int, default=50)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--device", choices=["auto", "cpu"], default="auto")
    parser.add_argument("--anchor-checkpoint", default=None,
                        help="also evaluate every checkpoint against this "
                             "fixed MCTS checkpoint (strength anchor)")
    parser.add_argument("--minimax-depth", type=int, default=0,
                        help="also evaluate vs the native C++ alpha-beta "
                             "anchor at this depth (0 = off; host-callback "
                             "player — use --device cpu on a tunneled TPU)")
    parser.add_argument("--opening-random-plies", type=int, default=4,
                        help="randomize the first k plies so deterministic "
                             "player pairs produce diverse games")
    parser.add_argument("--output", default=None)
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from othello_reinforcement_learning_test_tpu.utils import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from othello_reinforcement_learning_test_tpu.evaluation import (
        GreedyPlayer,
        MCTSPlayer,
        RandomPlayer,
        evaluate_player,
    )  # noqa: F401

    ckpts = []
    for e in sorted(os.listdir(args.checkpoint_dir)):
        path = os.path.join(args.checkpoint_dir, e)
        if not os.path.isdir(path):
            continue
        m = re.match(r"checkpoint_iter_(\d+)", e)
        if m:
            ckpts.append((int(m.group(1)), path))
    if not ckpts:
        raise SystemExit(f"no checkpoints under {args.checkpoint_dir}")

    curve = []
    rng = jax.random.PRNGKey(args.seed)
    anchor = None
    if args.anchor_checkpoint:
        anchor = MCTSPlayer.from_checkpoint(
            args.anchor_checkpoint, num_simulations=args.simulations
        )
        anchor.name = "Anchor"
    minimax = None
    if args.minimax_depth:
        from othello_reinforcement_learning_test_tpu.evaluation import (
            NativeMinimaxPlayer,
        )
    header = f"{'iter':>6} {'vs Random':>10} {'vs Greedy':>10}"
    if anchor:
        header += f" {'vs Anchor':>10}"
    if args.minimax_depth:
        header += f" {'vs Minimax':>10}"
    print(header)
    player = None
    for iteration, path in ckpts:
        player = MCTSPlayer.from_checkpoint(
            path, num_simulations=args.simulations,
            engine=None if player is None else player.engine,
        )
        engine = player.engine
        row = {"iteration": iteration, "checkpoint": path}
        opponents = [(RandomPlayer(engine), "random"), (GreedyPlayer(engine), "greedy")]
        if anchor is not None:
            opponents.append((anchor, "anchor"))
        if args.minimax_depth:
            if minimax is None:
                minimax = NativeMinimaxPlayer(engine, depth=args.minimax_depth)
            opponents.append((minimax, "minimax"))
        for opponent, name in opponents:
            rng, sub = jax.random.split(rng)
            out = evaluate_player(
                player, opponent, engine, num_games=args.games, rng=sub,
                opening_random_plies=args.opening_random_plies,
            )
            row[f"win_rate_vs_{name}"] = out["win_rate"]
            row[f"avg_score_vs_{name}"] = out["avg_score"]
        curve.append(row)
        line = (
            f"{iteration:>6} {row['win_rate_vs_random']:>9.1%} "
            f"{row['win_rate_vs_greedy']:>9.1%}"
        )
        if anchor is not None:
            line += f" {row['win_rate_vs_anchor']:>9.1%}"
        if args.minimax_depth:
            line += f" {row['win_rate_vs_minimax']:>9.1%}"
        print(line)

    out_path = args.output or os.path.join(
        args.checkpoint_dir,
        f"learning_curve_{datetime.now().strftime('%Y%m%d_%H%M%S')}.json",
    )
    with open(out_path, "w") as f:
        json.dump(
            {
                "checkpoint_dir": args.checkpoint_dir,
                "games": args.games,
                "simulations": args.simulations,
                "curve": curve,
            },
            f,
            indent=2,
        )
    print(f"curve saved to {out_path}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""AI strength benchmark (counterpart of reference ``benchmark_ai.py``).

Evaluates a checkpoint against Random and Greedy baselines with W-L-D,
score stats and JSON artifacts (``/root/reference/benchmark_ai.py:20-153``).
All games of a match run batched in one jitted loop.
"""

import argparse
import json
import os
from datetime import datetime


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--games", type=int, default=50)
    parser.add_argument("--simulations", type=int, default=100)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--output-dir", default="data/benchmark")
    parser.add_argument("--opening-random-plies", type=int, default=4,
                        help="randomize first k plies for the headline row "
                             "(deterministic pairs quantize win rates to "
                             "{0,50,100}%% — see evaluation/arena.py)")
    parser.add_argument("--skip-deterministic", action="store_true",
                        help="omit the reference-faithful deterministic row")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from othello_reinforcement_learning_test_tpu.utils import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from othello_reinforcement_learning_test_tpu.evaluation import (
        Arena,
        GreedyPlayer,
        MCTSPlayer,
        RandomPlayer,
    )

    player = MCTSPlayer.from_checkpoint(
        args.checkpoint, num_simulations=args.simulations
    )
    engine = player.engine
    arena = Arena(engine, verbose=True)
    rng = jax.random.PRNGKey(args.seed)

    report = {
        "checkpoint": args.checkpoint,
        "timestamp": datetime.now().isoformat(),
        "simulations": args.simulations,
        "games_per_opponent": args.games,
        "opening_random_plies": args.opening_random_plies,
        "results": {},
        "deterministic_results": {},
    }
    # Two rows per opponent: randomized openings (the headline — diverse
    # games) and, unless skipped, the reference-faithful deterministic pair
    # (which quantizes win rates to {0, 50, 100}% for deterministic players;
    # kept so the two regimes can't be conflated).
    regimes = [("results", args.opening_random_plies)]
    if not args.skip_deterministic and args.opening_random_plies != 0:
        regimes.append(("deterministic_results", 0))
    for opponent in (RandomPlayer(engine), GreedyPlayer(engine)):
        for key, plies in regimes:
            rng, sub = jax.random.split(rng)
            s = arena.play_matches(
                player, opponent, args.games, sub,
                opening_random_plies=plies,
            )
            scores = [r.player1_score for r in s.results]
            report[key][opponent.name] = {
                "wins": s.wins,
                "losses": s.losses,
                "draws": s.draws,
                "win_rate": s.win_rate,
                "avg_score": s.avg_score,
                "score_min": min(scores),
                "score_max": max(scores),
                "avg_moves": s.avg_moves,
            }

    os.makedirs(args.output_dir, exist_ok=True)
    stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    path = os.path.join(args.output_dir, f"benchmark_{stamp}.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nreport saved to {path}")


if __name__ == "__main__":
    main()

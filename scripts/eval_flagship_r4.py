#!/usr/bin/env python
"""Evaluate the round-4 flagship run (data/models/tpu9_flagship_r4)
against the committed round-3 flagship and the standard opponents, on one
protocol (100 sims, 4 random opening plies, colors alternating).

Usage: python scripts/eval_flagship_r4.py [--ckpt PATH] [--games 200]
Prints one JSON line per matchup.
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt",
                    default="data/models/tpu9_flagship_r4/final_model")
    ap.add_argument("--games", type=int, default=200)
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from othello_reinforcement_learning_test_tpu.evaluation.arena import Arena
    from othello_reinforcement_learning_test_tpu.evaluation.players import (
        GreedyPlayer, MCTSPlayer, RandomPlayer)
    from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine

    eng = get_engine(8, "reference")
    new = MCTSPlayer.from_checkpoint(args.ckpt, engine=eng,
                                     num_simulations=args.sims)
    arena = Arena(eng)
    opponents = [
        ("net-500iter", MCTSPlayer.from_checkpoint(
            str(REPO / "results" / "model_10x128_500iter"), engine=eng,
            num_simulations=args.sims)),
        ("net-600iter-gated", MCTSPlayer.from_checkpoint(
            str(REPO / "results" / "model_10x128_600iter_gated"), engine=eng,
            num_simulations=args.sims)),
        ("net-strong500", MCTSPlayer.from_checkpoint(
            str(REPO / "results" / "model_strong_8x8_500iter"), engine=eng,
            num_simulations=args.sims)),
        ("greedy", GreedyPlayer(eng)),
        ("random", RandomPlayer(eng)),
    ]
    for i, (name, opp) in enumerate(opponents):
        n = args.games if name.startswith("net") else 100
        s = arena.play_matches(new, opp, n, jax.random.PRNGKey(100 + i),
                               opening_random_plies=4)
        print(json.dumps({
            "opponent": name, "wins": s.wins, "losses": s.losses,
            "draws": s.draws,
            "decisive_win_rate": round(
                s.wins / max(s.wins + s.losses, 1), 4),
        }), flush=True)


if __name__ == "__main__":
    main()

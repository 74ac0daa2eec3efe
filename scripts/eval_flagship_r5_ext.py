#!/usr/bin/env python
"""Saturation probe eval: the flagship-r5 extension checkpoint (iter 1200,
resumed across the round-5 TPU-tunnel outage from the committed iter-1000
final) vs the committed flagship-r5 final, on the standard head-to-head
protocol (100 sims, 4 random opening plies, colors alternating).

Reference analog: /root/reference/src/eval/arena.py:235-271 (per-pair
match play); this probe answers VERDICT r4 item 7's residual question —
is the r5 recipe saturated at 1000 iterations?

Usage: python scripts/eval_flagship_r5_ext.py [--ckpt PATH] [--games 300]
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
                    default="data/models/tpu13_flagship_r5_ext2/final_model")
    ap.add_argument("--games", type=int, default=300)
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from othello_reinforcement_learning_test_tpu.evaluation.arena import Arena
    from othello_reinforcement_learning_test_tpu.evaluation.players import (
        MCTSPlayer)
    from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine

    eng = get_engine(8, "reference")
    new = MCTSPlayer.from_checkpoint(args.ckpt, engine=eng,
                                     num_simulations=args.sims)
    arena = Arena(eng)
    opponents = [
        ("net-flagship-r5", MCTSPlayer.from_checkpoint(
            str(REPO / "results" / "model_10x128_1000iter_flagship_r5"),
            engine=eng, num_simulations=args.sims)),
        ("net-flagship-r4", MCTSPlayer.from_checkpoint(
            str(REPO / "results" / "model_10x128_1000iter_flagship_r4"),
            engine=eng, num_simulations=args.sims)),
    ]
    for i, (name, opp) in enumerate(opponents):
        s = arena.play_matches(new, opp, args.games,
                               jax.random.PRNGKey(500 + i),
                               opening_random_plies=4)
        n = s.wins + s.losses + s.draws
        dec = s.wins + s.losses
        wr = s.wins / dec if dec else 0.0
        print(json.dumps({
            "opponent": name, "wins": s.wins, "losses": s.losses,
            "draws": s.draws, "decisive_winrate": round(wr, 4),
            "games": n,
        }), flush=True)


if __name__ == "__main__":
    main()

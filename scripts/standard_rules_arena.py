#!/usr/bin/env python
"""Round-robin arena under ``game.rules: standard`` for the round-5
symmetry-augmentation ablation (VERDICT r4 item 4).

The main Elo ladder plays the quirky *reference* rule set (that is what
the reference's artifacts speak), but symmetry augmentation is only sound
under D4-symmetric rules — so the ablation pair
(``run_500iter_symbase.yaml`` / ``run_500iter_symaug.yaml``, identical but
for ``augment_symmetries``) is measured in its own standard-rules arena:
head-to-head plus the classical anchors (Random / Greedy / native minimax,
which all take the rules parameter). Reference analog: the stubbed
``augment_data_with_symmetries`` (``/root/reference/src/train/
self_play.py:166-212``, SURVEY quirk #8) — the intended lever, never
measured there.

Usage:
  python scripts/standard_rules_arena.py --phase tpu   # NN pairs
  python scripts/standard_rules_arena.py --phase cpu   # minimax pairs
  python scripts/standard_rules_arena.py --fit         # report
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zlib
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CHECKPOINTS = {
    "sym-base": "results/model_10x128_500iter_symbase",
    "sym-aug": "results/model_10x128_500iter_symaug",
}
MINIMAX = {"minimax-d2": 2, "minimax-d4": 4, "minimax-d6": 6}
SIMS = 100
OUT = REPO / "results" / "symmetry_ablation.json"


def make_player(name, engine):
    from othello_reinforcement_learning_test_tpu.evaluation.players import (
        GreedyPlayer, MCTSPlayer, NativeMinimaxPlayer, RandomPlayer)

    if name == "random":
        return RandomPlayer(engine)
    if name == "greedy":
        return GreedyPlayer(engine)
    if name in MINIMAX:
        return NativeMinimaxPlayer(engine, depth=MINIMAX[name],
                                   exact_empties=10)
    return MCTSPlayer.from_checkpoint(
        str(REPO / CHECKPOINTS[name]), engine=engine, num_simulations=SIMS)


def play(pairs, games, out_path):
    import jax

    from othello_reinforcement_learning_test_tpu.evaluation.arena import Arena
    from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine

    engine = get_engine(8, "standard")
    arena = Arena(engine)
    results = {"pairs": {}}
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    players = {}

    def get(name):
        if name not in players:
            players[name] = make_player(name, engine)
        return players[name]

    for a, b in pairs:
        key = f"{a}|{b}"
        if results["pairs"].get(key, {}).get("n", 0) >= games:
            print(f"{key}: cached", flush=True)
            continue
        t0 = time.time()
        s = arena.play_matches(get(a), get(b), games,
                               jax.random.PRNGKey(zlib.crc32(key.encode())),
                               opening_random_plies=4)
        row = {"wins_a": s.wins, "wins_b": s.losses, "draws": s.draws,
               "n": games, "wall_s": round(time.time() - t0, 1)}
        print(f"{key}: {s.wins}W-{s.losses}L-{s.draws}D [{row['wall_s']}s]",
              flush=True)
        cur = {"pairs": {}}
        if os.path.exists(out_path):
            cur = json.load(open(out_path))
        cur["pairs"][key] = row
        results = cur
        with open(out_path, "w") as f:
            json.dump(cur, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["tpu", "cpu"], default=None)
    ap.add_argument("--games", type=int, default=120,
                    help="head-to-head games (anchor pairs use --games too)")
    ap.add_argument("--connect-games", type=int, default=24)
    ap.add_argument("--out", default=str(OUT))
    args = ap.parse_args()

    if args.phase == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.phase == "tpu":
        pairs = [("sym-aug", "sym-base")]
        pairs += [(n, a) for n in CHECKPOINTS for a in ("random", "greedy")]
        play(pairs, args.games, args.out)
    elif args.phase == "cpu":
        pairs = [(n, m) for n in CHECKPOINTS for m in MINIMAX]
        play(pairs, args.connect_games, args.out)


if __name__ == "__main__":
    main()

"""Measured learning-curve parity vs REFERENCE-TRAINED weights.

BASELINE.md's last argued-not-measured target: "learning curve parity with
the reference within seed variance". This harness evaluates checkpoints from
two matched downscaled training runs of EACH system — the reference itself,
trained on CPU via ``refbuild/`` (``refbuild/configs/parity_seed*.yaml``),
and this repo (``configs/parity_4x32.yaml``) — under one protocol:

- identical regime: 4 blocks x 32 filters, 40 iterations x 20 episodes x
  10 train sims, batch 64, lr 1e-3, buffer 20k, temp threshold 15 (the
  reference's own hyperparameter names, values mirrored key for key);
- curve points every 5 iterations: win rate vs Greedy over ``--games`` games
  at 50 eval sims (mcts.num_simulations_eval), 4 random opening plies for
  game diversity, same eval seeds for every point;
- reference checkpoints enter through the ``.pt`` weight bridge
  (``models/torch_bridge.py``) — the same import path users take — and play
  inside the identical batched arena, so the ONLY difference between the
  two curves is the weights the two training systems produced;
- head-to-head: final models of both systems, per seed, in one arena.

Usage:
    python scripts/reference_parity.py [--games 100] [--h2h-games 200]
                                       [--device auto|cpu]

Writes results/reference_parity.json incrementally.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = [5, 10, 15, 20, 25, 30, 35, 40]
SEEDS = [42, 123]  # default; extend with --seeds (round 4 added 7, 2024)


def ckpt_path(system: str, seed: int, iteration: int) -> str:
    if system == "reference":
        return os.path.join(
            REPO, "refbuild", "data", "models", f"parity_seed{seed}",
            f"checkpoint_iter_{iteration}.pt",
        )
    return os.path.join(
        REPO, "data", "models", f"parity_seed{seed}_repo",
        f"checkpoint_iter_{iteration:06d}",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=100)
    ap.add_argument("--h2h-games", type=int, default=200)
    ap.add_argument("--simulations", type=int, default=50)
    ap.add_argument("--device", choices=["auto", "cpu"], default="auto")
    ap.add_argument("--seeds", type=int, nargs="+", default=SEEDS,
                    help="seeds to (re)evaluate; existing JSON entries for "
                         "other seeds are preserved (merge, not overwrite)")
    ap.add_argument("--out", default=os.path.join(
        REPO, "results", "reference_parity.json"))
    args = ap.parse_args()
    seeds = args.seeds
    import jax

    if args.device == "cpu":
        # env vars cannot override this image's sitecustomize platform
        # registration (see tests/conftest.py) — force via jax.config
        jax.config.update("jax_platforms", "cpu")

    from othello_reinforcement_learning_test_tpu.evaluation import (
        GreedyPlayer,
        MCTSPlayer,
        evaluate_player,
    )
    from othello_reinforcement_learning_test_tpu.evaluation.arena import Arena
    from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine

    engine = get_engine(8, "reference")
    greedy = GreedyPlayer(engine)

    out = {
        "protocol": {
            "regime": "4 blocks x 32 filters, 40 iters x 20 episodes x "
                      "10 train sims, batch 64, lr 1e-3, buffer 20k",
            "eval": f"{args.games} games vs Greedy, "
                    f"{args.simulations} sims, 4 random opening plies",
            "h2h": f"{args.h2h_games} games, same settings",
            "device": str(jax.devices()[0]),
        },
        "curves": {},
        "head_to_head": {},
    }
    if os.path.exists(args.out):  # merge: keep previously evaluated seeds
        with open(args.out) as f:
            prev = json.load(f)
        out["curves"].update(prev.get("curves", {}))
        out["head_to_head"].update(prev.get("head_to_head", {}))

    def save():
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    for system in ("reference", "repo"):
        for seed in seeds:
            key = f"{system}_seed{seed}"
            out["curves"][key] = []
            for it in ITERS:
                path = ckpt_path(system, seed, it)
                if not os.path.exists(path):
                    print(f"missing {path}; skipping", flush=True)
                    continue
                t0 = time.time()
                player = MCTSPlayer.from_checkpoint(
                    path, engine=engine, num_simulations=args.simulations
                )
                res = evaluate_player(
                    player, greedy, engine, num_games=args.games,
                    rng=jax.random.PRNGKey(1000 + it),
                    opening_random_plies=4,
                )
                point = {
                    "iteration": it,
                    "win_rate": res["win_rate"],
                    "wins": res.get("wins"),
                    "losses": res.get("losses"),
                    "draws": res.get("draws"),
                    "avg_score": res["avg_score"],
                    "eval_seconds": round(time.time() - t0, 1),
                }
                out["curves"][key].append(point)
                print(f"{key} iter {it}: {res['win_rate']:.1%} vs Greedy "
                      f"[{point['eval_seconds']}s]", flush=True)
                save()

    # head-to-head: final models (iteration 40), repo as player1
    for seed in seeds:
        repo_p = MCTSPlayer.from_checkpoint(
            ckpt_path("repo", seed, 40), engine=engine,
            num_simulations=args.simulations,
        )
        ref_p = MCTSPlayer.from_checkpoint(
            ckpt_path("reference", seed, 40), engine=engine,
            num_simulations=args.simulations,
        )
        arena = Arena(engine)
        s = arena.play_matches(
            repo_p, ref_p, args.h2h_games, jax.random.PRNGKey(77 + seed),
            opening_random_plies=4,
        )
        out["head_to_head"][f"seed{seed}"] = {
            "repo_wins": s.wins, "reference_wins": s.losses,
            "draws": s.draws, "repo_win_rate": s.win_rate,
            "decisive_win_rate": s.wins / max(s.wins + s.losses, 1),
        }
        print(f"h2h seed{seed}: repo {s.wins}W-{s.losses}L-{s.draws}D "
              f"({s.win_rate:.1%})", flush=True)
        save()

    print(json.dumps(out["head_to_head"], indent=1))


if __name__ == "__main__":
    main()

"""Reciprocal strength evaluation in the REFERENCE'S OWN Arena.

The parity study (``results/reference_parity.md``) evaluates both systems'
checkpoints inside THIS repo's batched arena; a skeptic can object that the
repo's arena might favor the repo's models. This harness closes that gap:
the final parity models play head-to-head inside the reference's own
``Arena``/``MCTSPlayer``/``OthelloBitboard``
(``/root/reference/src/eval/arena.py:68-202``), running unmodified via
``refbuild/``. Repo checkpoints enter through the ``.pt`` export bridge —
the same artifact a reference user would load.

The reference arena has no opening randomization (deterministic MCTS
players at temperature 0 would replay the same two games), so both players
are wrapped to play ``--opening-plies`` seeded-random legal moves first —
the same 4-ply opening diversity the repo-side study uses. The wrapper
touches only move CHOICE in the opening; all game mechanics, search, and
scoring are the reference's own code.

Usage:
    python scripts/reciprocal_arena.py [--seeds 7 2024] [--games 100]
                                       [--simulations 50]

Writes results/reciprocal_arena.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

DRIVER = '''
"""Driver executed with cwd=refbuild: plays repo-exported vs reference
checkpoints inside the reference's own Arena (written by
scripts/reciprocal_arena.py; not part of the reference)."""
import json
import random
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))

import torch  # noqa: E402

from src.eval.arena import Arena  # noqa: E402
from src.eval.players import MCTSPlayer, Player  # noqa: E402


class RandomOpeningPlayer(Player):
    """Plays seeded-random legal moves for the first ``plies`` placements,
    then delegates to the wrapped player (opening diversity only; the
    wrapped player's search is untouched)."""

    def __init__(self, inner, plies, rng):
        super().__init__(f"open{plies}+{inner.name}")
        self.inner = inner
        self.plies = plies
        self.rng = rng

    def get_action(self, board):
        # number of placements so far = stones on board - 4
        black, white = board.get_stone_counts()
        if black + white - 4 < self.plies:
            return self.rng.choice(board.get_legal_moves())
        return self.inner.get_action(board)

    def reset(self):
        self.inner.reset()


def main():
    repo_pt, ref_pt, games, sims, seed, out = sys.argv[1:7]
    games, sims, seed = int(games), int(sims), int(seed)
    device = torch.device("cpu")
    repo_p = MCTSPlayer.from_checkpoint(repo_pt, device, num_simulations=sims)
    repo_p.name = "repo"
    ref_p = MCTSPlayer.from_checkpoint(ref_pt, device, num_simulations=sims)
    ref_p.name = "reference"
    rng = random.Random(seed)
    p1 = RandomOpeningPlayer(repo_p, 4, rng)
    p2 = RandomOpeningPlayer(ref_p, 4, rng)
    arena = Arena(verbose=False)
    results = arena.play_matches(p1, p2, num_games=games)
    wins = sum(1 for r in results if r.winner == 1)
    losses = sum(1 for r in results if r.winner == -1)
    draws = sum(1 for r in results if r.winner == 0)
    with open(out, "w") as f:
        json.dump({"repo_wins": wins, "reference_wins": losses,
                   "draws": draws, "games": games,
                   "decisive_win_rate": wins / max(wins + losses, 1)}, f)
    print(f"repo {wins}W-{losses}L-{draws}D", flush=True)


if __name__ == "__main__":
    main()
'''


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[7, 2024])
    ap.add_argument("--games", type=int, default=100)
    ap.add_argument("--simulations", type=int, default=50)
    ap.add_argument("--out", default=str(
        REPO / "results" / "reciprocal_arena.json"))
    args = ap.parse_args()

    import setup_refbuild

    refbuild = setup_refbuild.build()
    driver = refbuild / "run_reciprocal.py"
    driver.write_text(DRIVER)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("OMP_NUM_THREADS", "4")

    out = {"protocol": {
        "arena": "reference's own Arena/MCTSPlayer/OthelloBitboard "
                 "(refbuild), 4 seeded-random opening plies per side, "
                 "colors alternate per game",
        "repo_entry": "final parity model exported via "
                      "`main.py export --format reference-pt`",
        "games_per_seed": args.games,
        "simulations": args.simulations,
    }, "seeds": {}}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out["seeds"].update(json.load(f).get("seeds", {}))

    for seed in args.seeds:
        repo_ckpt = REPO / "data" / "models" / f"parity_seed{seed}_repo" / \
            "final_model"
        ref_ckpt = refbuild / "data" / "models" / f"parity_seed{seed}" / \
            "final_model.pt"
        export = REPO / "data" / "export" / f"parity_seed{seed}_repo.pt"
        export.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            [sys.executable, "main.py", "export",
             "--checkpoint", str(repo_ckpt), "--out", str(export),
             "--format", "reference-pt"],
            cwd=REPO, env=env, check=True,
        )
        result_file = refbuild / "data" / f"reciprocal_seed{seed}.json"
        t0 = time.time()
        print(f"[seed {seed}] {args.games} games in the reference arena...",
              flush=True)
        subprocess.run(
            [sys.executable, "run_reciprocal.py", str(export), str(ref_ckpt),
             str(args.games), str(args.simulations), str(seed),
             str(result_file)],
            cwd=refbuild, env=env, check=True,
        )
        with open(result_file) as f:
            res = json.load(f)
        res["wall_s"] = round(time.time() - t0, 1)
        out["seeds"][f"seed{seed}"] = res
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[seed {seed}] {res}", flush=True)


if __name__ == "__main__":
    main()

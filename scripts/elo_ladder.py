#!/usr/bin/env python
"""One rating table to rule the strength claims (VERDICT r3 item 6).

The shipped models all sit at ~100% vs Random/Greedy, so those rows no
longer discriminate. This harness plays a round-robin among the committed
checkpoints and the classical anchors under ONE protocol — fixed
simulations, 4 random opening plies, colors alternating per game — and
fits an anchored Bradley-Terry model (draws scored 0.5) with bootstrap
uncertainties. Reference analog: ``benchmark_ai.py`` / ``evaluate_player``
(``/root/reference/src/eval/arena.py:235-271``) — pairwise, ad-hoc, no
common scale.

Phases (the host-callback minimax players cannot compile over the axon
TPU tunnel, so the ladder splits by backend):
  --phase tpu   pairs among {random, greedy, checkpoints} (fast, batched)
  --phase cpu   pairs involving Minimax d2/d4/d6 (JAX_PLATFORMS=cpu;
                NN-vs-minimax connection pairs use --connect-games)
  --fit         Bradley-Terry fit + results/elo_ladder.md

All results merge incrementally into results/elo_ladder.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CHECKPOINTS = {
    "net-500iter": "results/model_10x128_500iter",
    "net-600iter-gated": "results/model_10x128_600iter_gated",
    "net-1000iter-default": "results/model_10x128_1000iter_default",
    # round-5: the same canonical default_8x8 regime with
    # lr_schedule: constant — the reference's ACTUAL LR behavior (it never
    # steps its StepLR scheduler), isolating the schedule divergence
    "net-1000iter-default-constlr":
        "results/model_10x128_1000iter_default_constlr",
    "net-strong500": "results/model_strong_8x8_500iter",
    # round-4 flagship: the 500iter recipe scaled 2x (1000 iters x 512
    # games x 64 sims) on the round-4 stack
    "net-flagship-r4": "results/model_10x128_1000iter_flagship_r4",
    # round-5 ablation: the 500iter recipe with prioritized replay ON,
    # everything else (incl. seed) identical to net-500iter — the
    # controlled pair for VERDICT r4 item 5
    "net-500iter-prioritized": "results/model_10x128_500iter_prioritized",
    # round-5 flagship: the r4 recipe scaled to 1024 games/iteration
    # (1000 iters x 1024 games x 64 sims, buffer 800k, 24 SGD steps/iter)
    "net-flagship-r5": "results/model_10x128_1000iter_flagship_r5",
}
# matched-budget parity finals (round-3/4 parity study, 4 blocks x 32
# filters x 40 iterations): the reference's own trained checkpoints imported
# over the .pt bridge + the repo's finals exported to the same format —
# putting "repo vs reference at matched budget" on this one scale
# (VERDICT r4 item 6). Artifacts: results/parity_models/, provenance in
# results/reference_parity.md.
PARITY_SEEDS = (7, 77, 99, 2024)
PARITY = {}
for _s in PARITY_SEEDS:
    PARITY[f"ref-parity-s{_s}"] = f"results/parity_models/ref_seed{_s}.pt"
    PARITY[f"repo-parity-s{_s}"] = f"results/parity_models/repo_seed{_s}.pt"
ANCHORS = ["random", "greedy"]
# d8 added round 5 so the top of the scale is anchored, not extrapolated
# (the strongest round-4 anchor, d6, sat ~300 Elo below the ladder top)
MINIMAX = {"minimax-d2": 2, "minimax-d4": 4, "minimax-d6": 6,
           "minimax-d8": 8}
# top-subgraph replay (round 5): enough games/pair that adjacent rows
# separate at 95% or declare a tie with CI half-width <= 40
TOP = ["net-flagship-r5", "net-flagship-r4", "net-500iter",
       "net-600iter-gated"]
SIMS = 100
ELO_PER_NAT = 400.0 / 2.302585092994046  # natural rating -> Elo points


def load_results(path):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"protocol": {
        "games": "see per-pair n",
        "simulations": SIMS,
        "opening_random_plies": 4,
        "colors": "alternate per game",
    }, "pairs": {}}


def make_player(name, engine):
    import jax  # noqa: F401

    from othello_reinforcement_learning_test_tpu.evaluation.players import (
        GreedyPlayer, MCTSPlayer, NativeMinimaxPlayer, RandomPlayer)

    if name == "random":
        return RandomPlayer(engine)
    if name == "greedy":
        return GreedyPlayer(engine)
    if name in MINIMAX:
        return NativeMinimaxPlayer(engine, depth=MINIMAX[name],
                                   exact_empties=10)
    path = CHECKPOINTS.get(name) or PARITY[name]
    return MCTSPlayer.from_checkpoint(
        str(REPO / path), engine=engine, num_simulations=SIMS)


def play_phase(pairs, games, out_path):
    import jax

    from othello_reinforcement_learning_test_tpu.evaluation.arena import Arena
    from othello_reinforcement_learning_test_tpu.ops.bitboard import get_engine

    engine = get_engine(8, "reference")
    arena = Arena(engine)
    results = load_results(out_path)
    players = {}

    def get(name):
        if name not in players:
            players[name] = make_player(name, engine)
        return players[name]

    for a, b in pairs:
        key = f"{a}|{b}"
        if key in results["pairs"] and results["pairs"][key]["n"] >= games:
            print(f"{key}: cached", flush=True)
            continue
        t0 = time.time()
        import zlib
        seed = zlib.crc32(key.encode())  # stable across runs/processes
        s = arena.play_matches(get(a), get(b), games,
                               jax.random.PRNGKey(seed),
                               opening_random_plies=4)
        results["pairs"][key] = {
            "wins_a": s.wins, "wins_b": s.losses, "draws": s.draws,
            "n": games, "wall_s": round(time.time() - t0, 1),
        }
        print(f"{key}: {s.wins}W-{s.losses}L-{s.draws}D "
              f"[{results['pairs'][key]['wall_s']}s]", flush=True)
        # merge-on-save: reload before writing so two phases running
        # concurrently (e.g. a long CPU phase + a quick TPU phase) don't
        # clobber each other's freshly played pairs
        cur = load_results(out_path)
        cur["pairs"].update(results["pairs"])
        results["pairs"] = cur["pairs"]
        with open(out_path, "w") as f:
            json.dump(cur, f, indent=1)


def bt_fit(pairs, names, anchor="random", iters=5000, lr=0.5,
           prior_draws=1.0, tol=1e-6):
    """Anchored Bradley-Terry fit on game scores (draw = 0.5) by gradient
    ascent; returns natural-log ratings with anchor pinned at 0.

    ``prior_draws`` adds that many pseudo-draws to every observed pair
    (half a win each way). Without it the MLE is unbounded for undefeated
    players (several pairs here are 100-0), and the reported gaps/CIs would
    be an artifact of the iteration cap rather than the data (round-5
    ADVICE fix). Iterates to convergence (max |gradient|/games < ``tol``)
    instead of a fixed count; raises if the cap is hit unconverged."""
    import numpy as np

    idx = {n: i for i, n in enumerate(names)}
    # per-pair aggregated (score_a, n), regularized with the draw prior
    rows = []
    for key, p in pairs.items():
        a, b = key.split("|")
        if a not in idx or b not in idx:
            continue
        score_a = p["wins_a"] + 0.5 * p["draws"] + 0.5 * prior_draws
        rows.append((idx[a], idx[b], score_a, p["n"] + prior_draws))
    # Zermelo/MM iteration in strength space (w = e^r): monotone in the
    # likelihood and converges orders of magnitude faster than gradient
    # ascent on this graph. w_i <- S_i / sum_j n_ij / (w_i + w_j), where
    # S_i is i's total (prior-regularized) score — well-defined because the
    # draw prior keeps every S_i strictly inside (0, n_i).
    w = np.ones(len(names))
    score = np.zeros(len(names))
    for ia, ib, sa, n in rows:
        score[ia] += sa
        score[ib] += n - sa
    for it in range(iters):
        denom = np.zeros(len(names))
        for ia, ib, sa, n in rows:
            d = n / (w[ia] + w[ib])
            denom[ia] += d
            denom[ib] += d
        w_new = score / np.maximum(denom, 1e-300)
        w_new /= w_new[idx[anchor]]
        delta = np.abs(np.log(w_new) - np.log(w)).max()
        w = w_new
        if delta < tol:
            break
    else:
        raise RuntimeError(
            f"bt_fit did not converge in {iters} iterations "
            f"(last max |delta log-strength| = {delta:.2e})")
    r = np.log(w)
    r -= r[idx[anchor]]
    return r, idx, rows


def fit_and_report(out_path, md_path):
    import numpy as np

    results = load_results(out_path)
    names = sorted({n for key in results["pairs"] for n in key.split("|")})
    r, idx, rows = bt_fit(results["pairs"], names)

    # bootstrap over games within each pair (resample outcomes)
    rng = np.random.default_rng(0)
    boots = []
    for _ in range(200):
        fake = {}
        for key, p in results["pairs"].items():
            n = p["n"]
            probs = np.array([p["wins_a"], p["draws"], p["wins_b"]],
                             float) / n
            draw = rng.multinomial(n, probs)
            fake[key] = {"wins_a": int(draw[0]), "draws": int(draw[1]),
                         "wins_b": int(draw[2]), "n": n}
        rb, _, _ = bt_fit(fake, names)
        boots.append(rb)
    boots = np.array(boots)
    lo = np.percentile(boots, 2.5, axis=0)
    hi = np.percentile(boots, 97.5, axis=0)

    table = sorted(
        ((n, r[idx[n]] * ELO_PER_NAT, lo[idx[n]] * ELO_PER_NAT,
          hi[idx[n]] * ELO_PER_NAT) for n in names),
        key=lambda t: -t[1])

    # adjacent-row separation: per-player CIs are correlated (every
    # bootstrap refit moves the whole scale), so separation is judged on
    # the paired bootstrap of the rating DIFFERENCE, not on CI overlap
    sep = []
    for (na, ea, *_), (nb, eb, *_) in zip(table, table[1:]):
        d = (boots[:, idx[na]] - boots[:, idx[nb]]) * ELO_PER_NAT
        dlo, dhi = np.percentile(d, 2.5), np.percentile(d, 97.5)
        sep.append((na, nb, ea - eb, dlo, dhi,
                    "separated" if dlo > 0 else "tied"))
    results["ratings"] = {
        n: {"elo_vs_random": round(e, 1),
            "ci95": [round(a, 1), round(b, 1)]}
        for n, e, a, b in table
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)

    lines = [
        "# Elo ladder — committed checkpoints + classical anchors",
        "",
        "Anchored Bradley-Terry fit (Random = 0 Elo, draws scored 0.5) over",
        f"the round-robin in `results/elo_ladder.json` ({SIMS} sims for NN",
        "players, 4 random opening plies, colors alternating; 95% CI by",
        "bootstrap over game outcomes, 200 resamples). Replaces the",
        "saturated 100%-vs-Greedy rows as the headline strength metric",
        "(VERDICT r3 item 6). Reference analog: per-pair `evaluate_player`",
        "(`/root/reference/src/eval/arena.py:235-271`), no common scale.",
        "",
        "| player | Elo (vs Random) | 95% CI |",
        "|---|---|---|",
    ]
    for n, e, a, b in table:
        lines.append(f"| {n} | {e:+.0f} | [{a:+.0f}, {b:+.0f}] |")
    lines += [
        "",
        "Adjacent-row separation (paired bootstrap of the rating",
        "difference — per-player CIs are correlated, so CI overlap is NOT",
        "the separation test):",
        "",
        "| pair | ΔElo | 95% CI of Δ | verdict |",
        "|---|---|---|---|",
    ]
    for na, nb, de, dlo, dhi, verdict in sep:
        lines.append(
            f"| {na} − {nb} | {de:+.0f} | [{dlo:+.0f}, {dhi:+.0f}] "
            f"| {verdict} |")
    lines += [
        "",
        "Fit: Zermelo/MM with a 1-pseudo-draw-per-pair prior (without it",
        "the MLE is unbounded for undefeated players; the prior shrinks",
        "all ratings slightly toward their opponents). NN-vs-minimax",
        "connection pairs run on the CPU backend (host-callback players",
        "cannot compile over the axon TPU tunnel).",
        "",
    ]
    Path(md_path).write_text("\n".join(lines))
    for n, e, a, b in table:
        print(f"{n:24s} {e:+7.0f}  [{a:+.0f}, {b:+.0f}]")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase",
                    choices=["tpu", "cpu", "top", "parity"], default=None)
    ap.add_argument("--fit", action="store_true")
    ap.add_argument("--games", type=int, default=60)
    ap.add_argument("--connect-games", type=int, default=24,
                    help="games per NN-vs-minimax pair (CPU-bound)")
    ap.add_argument("--out", default=str(REPO / "results" / "elo_ladder.json"))
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                    help="force a JAX platform (default: cpu for the "
                         "cpu/parity phases, the image default otherwise)")
    args = ap.parse_args()

    if args.platform == "cpu" or (
            args.platform is None and args.phase in ("cpu", "parity")):
        # FORCE cpu via jax.config (env vars cannot override this image's
        # sitecustomize, which registers the axon platform at interpreter
        # start — see tests/conftest.py); host-callback players cannot
        # compile over the axon TPU tunnel. The parity phase defaults to
        # cpu too: its 4x32 models are light and this keeps the chip free
        # for training runs.
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.phase == "tpu":
        fast = ANCHORS + list(CHECKPOINTS)
        pairs = [(a, b) for i, a in enumerate(fast) for b in fast[i + 1:]]
        play_phase(pairs, args.games, args.out)
    elif args.phase == "top":
        # round-5 separation replay: the adjacent-top pairs at high n
        pairs = [(a, b) for i, a in enumerate(TOP) for b in TOP[i + 1:]]
        play_phase(pairs, args.games, args.out)
    elif args.phase == "parity":
        # matched-budget parity finals: head-to-head per seed + anchors
        pairs = [(f"ref-parity-s{s}", f"repo-parity-s{s}")
                 for s in PARITY_SEEDS]
        pairs += [(n, a) for n in PARITY for a in ANCHORS]
        play_phase(pairs, args.games, args.out)
    elif args.phase == "cpu":
        mm = list(MINIMAX)
        cheap = [(a, b) for a in mm for b in ANCHORS]
        cheap += [(a, b) for i, a in enumerate(mm) for b in mm[i + 1:]]
        play_phase(cheap, args.games, args.out)
        # NN connection pairs: every checkpoint vs d4; flagships vs d2/d6/d8
        conn = [(n, "minimax-d4") for n in CHECKPOINTS]
        conn += [("net-500iter", "minimax-d2"), ("net-500iter", "minimax-d6"),
                 ("net-flagship-r4", "minimax-d6"),
                 ("net-flagship-r4", "minimax-d8"),
                 ("net-500iter", "minimax-d8")]
        play_phase(conn, args.connect_games, args.out)
    if args.fit:
        fit_and_report(args.out, str(REPO / "results" / "elo_ladder.md"))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-MOVE glue decomposition of the self-play loop (round 4).

profile_forward_parts.py covers the forward; profile_mcts_parts.py covers
the per-simulation tree ops. What remains per lockstep ply is the move
glue: root Dirichlet noise (gamma sampling), the two visit-count->policy
transforms, categorical action sampling, the five trajectory writes, and
the game step. This script times each in isolation (chained scan +
null-subtraction methodology) and also reports the actual lockstep ply
count P (max game length over the batch), which sets the tail-waste
factor P / mean_moves.

Usage: python scripts/profile_move_glue.py [--batch 1024]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    import jax

    if args.platform:
        # env vars cannot override sitecustomize's platform registration
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from othello_reinforcement_learning_test_tpu.models import (
        OthelloResNet, init_variables)
    from othello_reinforcement_learning_test_tpu.ops.bitboard import (
        OthelloEngine)
    from othello_reinforcement_learning_test_tpu.search import mcts
    from othello_reinforcement_learning_test_tpu.train import apply_eval
    from othello_reinforcement_learning_test_tpu.train.self_play import (
        max_game_length, play_games)

    B, R = args.batch, args.reps
    engine = OthelloEngine(size=8)
    T = max_game_length(8)
    A = engine.num_actions

    boards = engine.initial_state((B,))
    legal, term, win, feats = engine.observe(boards, with_features=True)
    counts = jax.random.uniform(jax.random.PRNGKey(3), (B, A)) * legal * 20
    prior = mcts.masked_probs(jnp.log(counts + 1e-9), legal)
    eps = jnp.float32(1e-7)
    overhead = [0.0]

    def timed(name, fn, init):
        @jax.jit
        def run(init):
            def body(c, i):
                return fn(c, i), ()
            out, _ = jax.lax.scan(body, init, jnp.arange(R))
            return jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda t: t.astype(jnp.float32).sum(), out))

        float(run(init))
        best = 1e9
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(run(init))
            best = min(best, time.perf_counter() - t0)
        per = (best - overhead[0]) / R
        print(f"{name:34s}: {per*1e6:9.1f} us   (raw {best/R*1e6:.1f})",
              flush=True)
        return per

    t_null = timed("null (per-call overhead)",
                   lambda c, i: c + eps * i.astype(jnp.float32),
                   jnp.zeros((8, 128), jnp.float32))
    overhead[0] = t_null * R

    # 1. root Dirichlet noise (gamma sampling dominates)
    def noise(c, i):
        key = jax.random.fold_in(jax.random.PRNGKey(0), i)
        p = mcts.add_dirichlet_noise(key, c, legal, 0.3, 0.25)
        return p

    t_noise = timed("dirichlet noise (gamma B*A)", noise, prior)

    # 2. action_probs_from_counts x2 (training pi + action temperature)
    def probs2(c, i):
        cc = c + eps * i.astype(jnp.float32)
        pi = mcts.action_probs_from_counts(cc, legal, 1.0)
        temp = jnp.where(boards.move_count < 15, 1.0, 0.0).astype(jnp.float32)
        ap2 = mcts.action_probs_from_counts(cc, legal, temp)
        return c + (pi + ap2) * 0

    t_probs = timed("action_probs x2", probs2, counts)

    # 3. categorical sampling
    def cat(c, i):
        key = jax.random.fold_in(jax.random.PRNGKey(1), i)
        act = jax.random.categorical(
            key, jnp.log(c + 1e-12), axis=-1).astype(jnp.int32)
        return c + act[:, None].astype(jnp.float32) * 0

    t_cat = timed("categorical sample", cat, prior + 1e-3)

    # 4. trajectory writes (5 dynamic_update_slice on (B,T,...) carries)
    tr = (jnp.zeros((B, T, 2), jnp.uint32), jnp.zeros((B, T, 2), jnp.uint32),
          jnp.zeros((B, T, A), jnp.float32), jnp.zeros((B, T), jnp.int32),
          jnp.zeros((B, T), jnp.bool_))

    def writes(c, i):
        t_me, t_opp, t_pi, t_par, t_mask = c
        t = i % T
        live = legal[:, 0] | True
        lv = live[:, None]
        t_me = t_me.at[:, t].set(jnp.where(lv, boards.me, 0))
        t_opp = t_opp.at[:, t].set(jnp.where(lv, boards.opp, 0))
        t_pi = t_pi.at[:, t].set(jnp.where(lv, prior + eps * i.astype(
            jnp.float32), 0.0))
        t_par = t_par.at[:, t].set(jnp.where(live, boards.move_count % 2, 0))
        t_mask = t_mask.at[:, t].set(live)
        return (t_me, t_opp, t_pi, t_par, t_mask)

    t_wr = timed("trajectory writes x5", writes, tr)

    # 5. game step + liveness blend
    def step(c, i):
        b = c
        act = jnp.argmax(prior + eps * i.astype(jnp.float32), axis=-1
                         ).astype(jnp.int32)
        nxt, _ = engine.step(b, act, pass_legal=legal[..., engine.pass_action])
        live = ~term
        b = jax.tree.map(
            lambda n, o: jnp.where(
                live.reshape(live.shape + (1,) * (n.ndim - live.ndim)), n, o),
            nxt, b)
        return b

    t_step = timed("engine.step + blend", step, boards)

    total = t_noise + t_probs + t_cat + t_wr + t_step
    print(f"{'sum of move glue':34s}: {total*1e6:9.1f} us/ply")

    # actual lockstep ply count P at this batch (tail-waste factor)
    model = OthelloResNet(num_blocks=1, num_filters=8)
    variables = init_variables(model, jax.random.PRNGKey(0))
    traj = play_games(engine, apply_eval(model), variables,
                      jax.random.PRNGKey(5), num_games=B, num_simulations=2,
                      temperature_threshold=15)
    moves = jax.device_get(traj.num_moves)
    print(f"game lengths at B={B}: mean {moves.mean():.1f}, "
          f"max (lockstep P) {moves.max()}, "
          f"tail factor {moves.max() / moves.mean():.3f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-op decomposition of the MCTS sim step (VERDICT r2 item 3a).

Builds a realistic mid-search tree (12 of 25 sims done, real net), then
times each component of ``sim_body`` in isolation, scan-chained inside one
jit with an iteration-dependent perturbation so XLA can't CSE the calls.

Usage: python scripts/profile_mcts_parts.py [--batch 1024] [--reps 200]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--sims", type=int, default=25)
    ap.add_argument("--warm-sims", type=int, default=12)
    ap.add_argument("--reps", type=int, default=400, help="chain length")
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
        Board, OthelloEngine)
    from othello_reinforcement_learning_test_tpu.search import mcts
    from othello_reinforcement_learning_test_tpu.train import apply_eval

    B, sims = args.batch, args.sims
    engine = OthelloEngine(size=8)
    model = OthelloResNet(num_blocks=10, num_filters=128)
    variables = init_variables(model, jax.random.PRNGKey(0))
    net = lambda x: apply_eval(model)(variables, x)  # noqa: E731

    n_slots = sims + 1
    A = engine.num_actions

    # ---- build a mid-search tree (warm_sims expansions done) ----
    @jax.jit
    def build_tree():
        boards = engine.initial_state((B,))
        legal0, term0, win0, feats = engine.observe(boards, with_features=True)
        log_p, v0 = net(feats)
        prior0 = mcts.masked_probs(log_p, legal0)
        root_value0 = jnp.where(term0, win0.astype(jnp.float32), v0[..., 0])
        tree = mcts._init_tree(B, n_slots, A, boards.me, boards.opp, prior0,
                               legal0, term0, win0, root_value0)

        def sim(i, tree):
            sel = mcts._select(tree, 1.0)
            m_parent = mcts._node_mask(sel.parent, n_slots)
            parent_board = Board(
                me=mcts._take(tree.board_me, m_parent),
                opp=mcts._take(tree.board_opp, m_parent),
                move_count=jnp.zeros((B,), jnp.int32),
                passed=jnp.zeros((B,), jnp.bool_),
            )
            ppl = mcts._take(tree.legal, m_parent)[:, engine.pass_action]
            child_board, _ = engine.step(parent_board, sel.action,
                                         pass_legal=ppl)
            cl, ct, cw, feats = engine.observe(child_board,
                                               with_features=True)
            log_p, v = net(feats)
            cp = mcts.masked_probs(log_p, cl)
            return mcts._expand_and_backup(
                tree, sel, child_board.me, child_board.opp, cp, cl, ct, cw,
                v[..., 0])

        tree = jax.lax.fori_loop(0, args.warm_sims, sim, tree)
        sel = mcts._select(tree, 1.0)
        m_parent = mcts._node_mask(sel.parent, n_slots)
        parent_board = Board(
            me=mcts._take(tree.board_me, m_parent),
            opp=mcts._take(tree.board_opp, m_parent),
            move_count=jnp.zeros((B,), jnp.int32),
            passed=jnp.zeros((B,), jnp.bool_),
        )
        ppl = mcts._take(tree.legal, m_parent)[:, engine.pass_action]
        child_board, _ = engine.step(parent_board, sel.action, pass_legal=ppl)
        cl, ct, cw, feats = engine.observe(child_board, with_features=True)
        log_p, v = net(feats)
        cp = mcts.masked_probs(log_p, cl)
        return tree, sel, child_board, cl, ct, cw, cp, v[..., 0], feats

    (tree, sel, child_board, cl, ct, cw, cp, nv, feats) = jax.block_until_ready(
        build_tree())

    R = args.reps
    eps = jnp.float32(1e-7)
    overhead = [0.0]

    def timed(name, make_step, init):
        """make_step(carry, i) -> carry with a data dependence on i.

        Reported per-step time subtracts the fixed per-call cost (dispatch +
        the axon-tunnel round trip, ~25 ms) measured by the null row — the
        same null-program correction benchmark_model.py applies."""
        @jax.jit
        def run(init):
            def body(carry, i):
                return make_step(carry, i), ()
            out, _ = jax.lax.scan(body, init, jnp.arange(R))
            leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "sum")]
            return sum(x.sum().astype(jnp.float32) for x in leaves)

        float(run(init))  # compile + force a real D2H read
        best = 1e9
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(run(init))
            best = min(best, time.perf_counter() - t0)
        per = (best - overhead[0]) / R
        print(f"{name:24s}: {per*1e6:9.1f} us/step   "
              f"(raw {best/R*1e6:.1f})")
        return per

    # null row: same call/read structure, trivial body -> fixed overhead
    import jax.random as jr
    null0 = jr.normal(jr.PRNGKey(2), (B, A), jnp.float32)
    t_null = timed("null (per-call overhead)", lambda c, i: c + eps * i, null0)
    overhead[0] = t_null * R

    # 1. select — perturb child_value_sum, which _puct_best actually READS
    # (round-4 fix: perturbing value_sum let XLA hoist the whole dense
    # PUCT argmax out of the scan, under-reporting select by ~50x)
    def step_select(carry, i):
        t = carry
        t = t.replace(child_value_sum=t.child_value_sum + eps * i)
        s = mcts._select(t, 1.0)
        # fold the selection back so it's consumed
        return t.replace(visit=t.visit + (s.path_len[:, None] * 0))

    t_sel = timed("select walk", step_select, tree)

    # 2. parent gather + env.step + observe(features)
    def step_env(carry, i):
        t, brd = carry
        s = sel._replace(parent=(sel.parent + i * 0))
        m_parent = mcts._node_mask(s.parent, n_slots)
        pb = Board(
            me=mcts._take(t.board_me, m_parent) + i.astype(jnp.uint32) * 0,
            opp=mcts._take(t.board_opp, m_parent),
            move_count=jnp.zeros((B,), jnp.int32),
            passed=jnp.zeros((B,), jnp.bool_),
        )
        ppl = mcts._take(t.legal, m_parent)[:, engine.pass_action]
        cb, _ = engine.step(pb, s.action, pass_legal=ppl)
        clg, ctm, cwn, f = engine.observe(cb, with_features=True)
        t = t.replace(term_value=t.term_value + jnp.sum(f) * 0
                      + jnp.sum(clg) * 0)
        return (t, cb)

    t_env = timed("parent gather+step+obs", step_env, (tree, child_board))

    # 3. masked_probs on fixed logits
    log_p0, _ = net(feats)

    def step_mp(carry, i):
        lp = carry
        p = mcts.masked_probs(lp + eps * i, cl)
        return lp + jnp.sum(p) * 0

    t_mp = timed("masked_probs", step_mp, log_p0)

    # 4. expand_and_backup
    def step_eb(carry, i):
        t = carry
        t2 = mcts._expand_and_backup(
            t.replace(value_sum=t.value_sum + eps * i), sel,
            child_board.me, child_board.opp, cp, cl, ct, cw, nv)
        # keep carry shape: feed back updated stats but reset num_nodes so
        # slots don't run out across R iterations
        return t2.replace(num_nodes=t.num_nodes)

    t_eb = timed("expand+backup", step_eb, tree)

    total = t_sel + t_env + t_mp + t_eb
    print(f"{'sum of parts':24s}: {total*1e6:9.1f} us/step")
    print(f"(profile_mcts.py tree+env measured the whole sim glue; "
          f"B={B}, warm tree at {args.warm_sims}/{sims} sims)")


if __name__ == "__main__":
    main()

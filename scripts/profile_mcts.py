#!/usr/bin/env python
"""Decompose the MCTS self-play sim step on the real chip (VERDICT r2 item 3a).

Measures, at the training operating point (B games, 25 sims, 10x128 net):
  1. full search wall (root eval + sims x [select + env.step/observe +
     forward + expand/backup]),
  2. tree+env only (forward replaced by a free constant-returning net),
  3. forward only (chained apply over the same feature shapes),
and derives the tree/glue share. K searches are chained inside one jit
(lax.scan over seeds) so the ~25 ms axon per-call overhead amortizes out,
same methodology as benchmark_model.py.

Usage: python scripts/profile_mcts.py [--batch 1024] [--sims 25] [--chain 4]
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
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--blocks", type=int, default=10)
    ap.add_argument("--filters", type=int, default=128)
    ap.add_argument("--net-variant", default="int8",
                    choices=["xla", "int8", "matmul9"])
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import os
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax
    import jax.numpy as jnp

    from othello_reinforcement_learning_test_tpu.models import (
        OthelloResNet, init_variables)
    from othello_reinforcement_learning_test_tpu.ops.bitboard import OthelloEngine
    from othello_reinforcement_learning_test_tpu.search import mcts
    from othello_reinforcement_learning_test_tpu.train import apply_eval

    B, sims, K = args.batch, args.sims, args.chain
    engine = OthelloEngine(size=8)
    model = OthelloResNet(num_blocks=args.blocks, num_filters=args.filters)
    variables = init_variables(model, jax.random.PRNGKey(0))

    if args.net_variant == "xla":
        apply_fn = apply_eval(model)
    else:
        from othello_reinforcement_learning_test_tpu.models.pallas_resnet import (
            FusedInference)
        apply_fn = FusedInference(model, variant=args.net_variant)

    A = engine.num_actions

    def dummy_net(x):
        # free net: constants with the right shapes; XLA folds it away
        m = x.shape[0]
        return (jnp.zeros((m, A), jnp.float32), jnp.full((m, 1), 0.1))

    boards0 = engine.initial_state((B,))

    def chained_search(net):
        def one(carry, seed):
            # fold the previous result in so scan iterations can't be CSE'd
            boards = carry
            res = mcts.search(engine, net, boards, seed,
                              num_simulations=sims, add_noise=True)
            act = mcts.best_action(res.visit_counts, res.legal)
            nxt, _ = engine.step(boards, act,
                                 pass_legal=res.legal[..., engine.pass_action])
            # reset finished games to keep shapes/liveness stable-ish
            boards = jax.tree.map(
                lambda n, o: jnp.where(
                    res.root_terminal.reshape(
                        res.root_terminal.shape + (1,) * (n.ndim - 1)), o, n),
                nxt, boards)
            return boards, res.root_value.sum()

        @jax.jit
        def run(keys):
            boards, vals = jax.lax.scan(one, boards0, keys)
            return vals.sum(), boards.move_count.sum()

        return run

    def time_fn(run):
        keys = jax.random.split(jax.random.PRNGKey(1), K)
        v, _ = run(keys)  # compile
        float(v)
        best = 1e9
        for r in range(args.repeats):
            keys = jax.random.split(jax.random.PRNGKey(r + 2), K)
            t0 = time.perf_counter()
            v, mc = run(keys)
            float(v)
            dt = time.perf_counter() - t0
            best = min(best, dt)
        return best / K  # seconds per search (sims+1 forwards, sims sim-steps)

    real_net = lambda x: apply_fn(variables, x)  # noqa: E731

    t_full = time_fn(chained_search(real_net))
    t_tree = time_fn(chained_search(dummy_net))

    # forward-only: same chain structure over a fixed feature batch
    _, _, _, feats0 = engine.observe(boards0, with_features=True)

    @jax.jit
    def fwd_chain(feats):
        def one(f, _):
            lp, v = real_net(f)
            # cheap dependency so the scan can't collapse
            f2 = f + (v.mean() * 0)
            return f2, lp.sum()
        _, s = jax.lax.scan(one, feats, None, length=(sims + 1) * K)
        return s.sum()

    float(fwd_chain(feats0))
    best = 1e9
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        float(fwd_chain(feats0))
        best = min(best, time.perf_counter() - t0)
    t_fwd = best / K  # per (sims+1) forwards

    n_fwd = sims + 1
    per_sim_full = t_full / n_fwd
    per_sim_fwd = t_fwd / n_fwd
    per_sim_tree = t_tree / n_fwd
    print(f"config: B={B} sims={sims} net={args.blocks}x{args.filters} "
          f"variant={args.net_variant} chain={K}")
    print(f"full search      : {t_full*1e3:8.2f} ms "
          f"({per_sim_full*1e3:.3f} ms/fwd-step, "
          f"{B*n_fwd/t_full/1e3:.0f}k sims/s)")
    print(f"tree+env only    : {t_tree*1e3:8.2f} ms "
          f"({per_sim_tree*1e3:.3f} ms/fwd-step)")
    print(f"forward only     : {t_fwd*1e3:8.2f} ms "
          f"({per_sim_fwd*1e3:.3f} ms/fwd-step, "
          f"{B*n_fwd/t_fwd/1e3:.0f}k boards/s)")
    print(f"tree+env share   : {100*(1 - t_fwd/t_full):.1f}% of full "
          f"(additive check: tree {t_tree*1e3:.1f} + fwd {t_fwd*1e3:.1f} "
          f"= {(t_tree+t_fwd)*1e3:.1f} vs full {t_full*1e3:.1f})")
    print(f"ceiling fraction : {t_fwd/t_full*100:.1f}% of forward-only "
          f"throughput (target >=85%)")


if __name__ == "__main__":
    main()

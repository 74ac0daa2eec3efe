"""Fully on-device batched self-play.

Replaces both reference self-play paths — the sequential per-game worker
(``/root/reference/src/train/self_play.py``) and the lockstep
"parallel" worker with batched GPU inference
(``src/train/parallel_self_play.py:218-407``) — with ONE jitted program that
steps N games in lockstep: every move runs the batched array-tree MCTS
(one network call per simulation for all games), samples actions with the
temperature schedule, records (board, pi, parity) per ply, and on completion
assigns game outcomes to every step.

Semantics per reference:
- temperature 1.0 while ``move_count < temperature_threshold`` else 0.0
  (self_play.py:86-87); stochastic sampling vs argmax (self_play.py:107-113).
- recorded training policy is the temperature-1.0 visit distribution, like
  the reference's parallel worker (parallel_self_play.py:366-382; its
  sequential worker stores the temp-adjusted distribution — SURVEY.md §7
  quirk #5; we standardize on the canonical visit distribution).
- step value = final winner from that step's mover perspective. We compute
  the parity correctly from the terminal side to move (the reference assumes
  the terminal mover is Black and sign-flips odd-parity games — quirk #1;
  divergence documented).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.bitboard import OthelloEngine
from ..search import mcts


class Trajectory(NamedTuple):
    """Self-play results, (B, T, ...) arrays; ``mask`` marks real plies."""

    me: jnp.ndarray  # (B, T, 2) uint32 — board of the side to move
    opp: jnp.ndarray  # (B, T, 2) uint32
    pi: jnp.ndarray  # (B, T, A) float32 — MCTS visit distribution
    value: jnp.ndarray  # (B, T) float32 — outcome from the mover's view
    mask: jnp.ndarray  # (B, T) bool
    final_me_count: jnp.ndarray  # (B,) int32
    final_opp_count: jnp.ndarray  # (B,) int32
    winner_black: jnp.ndarray  # (B,) int32 — +1 black wins / -1 white / 0 draw
    num_moves: jnp.ndarray  # (B,) int32


def max_game_length(size: int) -> int:
    """Static ply cap: every placement may be preceded by a pass, plus the
    closing double-pass."""
    return 2 * size * size + 4


def auto_cond_interval(process_count: int = None, platform: str = None) -> int:
    """Transport-aware default for ``cond_interval`` (used when the config
    leaves ``self_play.cond_interval`` unset / "auto").

    k=1 single-process and on TPU meshes: the lockstep liveness conds ride
    ICI and cost microseconds, so decimation buys nothing. k=4 on
    multi-process non-TPU transports (Gloo over TCP, DCN), where each cond
    is a latency-bound scalar all-reduce: measured +15.4% self-play
    throughput at N=4 processes on the CPU/Gloo harness, bit-identical
    results for any k (results/multihost_scaling.md). The config key
    remains an explicit override."""
    if process_count is None:
        process_count = jax.process_count()
    if platform is None:
        platform = jax.devices()[0].platform
    if process_count <= 1 or platform == "tpu":
        return 1
    return 4


@functools.partial(
    jax.jit,
    static_argnames=(
        "engine",
        "apply_fn",
        "num_games",
        "num_simulations",
        "temperature_threshold",
        "add_noise",
        "mesh",
        "cond_interval",
        "reuse_root_eval",
    ),
)
def play_games(
    engine: OthelloEngine,
    apply_fn,
    variables,
    rng: jax.Array,
    num_games: int,
    num_simulations: int,
    c_puct: float = 1.0,
    dirichlet_alpha: float = 0.3,
    dirichlet_epsilon: float = 0.25,
    temperature_threshold: int = 15,
    add_noise: bool = True,
    mesh=None,
    cond_interval: int = 1,
    reuse_root_eval: bool = True,
) -> Trajectory:
    """Play ``num_games`` complete games in lockstep; fully jitted.

    ``apply_fn(variables, x) -> (log_probs, value)`` must be a stable
    (hashable) function — e.g. a module-level wrapper over ``model.apply`` —
    so jit caches across calls while ``variables`` stays a traced pytree.

    ``cond_interval`` (static, default 1): evaluate the lockstep liveness
    conds — the outer game loop's ``live.any()`` here and the PUCT walk cond
    inside the search, each a scalar cross-shard all-reduce under a dp
    mesh — once every k iterations instead of every iteration. The loop
    bodies are masked no-ops for finished games (trajectory writes and board
    updates are gated on ``live``; out-of-range ``t`` scatters drop), so the
    result is bit-identical for any k; only up to k-1 trailing no-op
    iterations of wasted compute are added per loop. Useful when the
    transport's small-message latency dominates (Gloo/DCN) — measured in
    results/multihost_scaling.md; on ICI the conds are us-cheap and k=1 is
    fine.
    """
    # Root-eval reuse relies on the sampled action's child being expanded,
    # which only holds when at least one simulation ran (the -inf masking in
    # the action sampler then can't pick an unvisited action). With 0 sims
    # the sampler falls back to uniform-over-legal and extract_root_cache
    # would return a zeroed cache that poisons every later search — so the
    # invariant is enforced here rather than assumed (round-5 ADVICE fix).
    if num_simulations < 1:
        raise ValueError(
            f"play_games requires num_simulations >= 1 (got {num_simulations}); "
            "root-eval reuse depends on the chosen action's child being expanded"
        )
    B = num_games
    net = lambda x: apply_fn(variables, x)  # noqa: E731
    T = max_game_length(engine.size)
    A = engine.num_actions

    boards0 = engine.initial_state((B,))
    traj_me = jnp.zeros((B, T, 2), jnp.uint32)
    traj_opp = jnp.zeros((B, T, 2), jnp.uint32)
    traj_pi = jnp.zeros((B, T, A), jnp.float32)
    traj_parity = jnp.zeros((B, T), jnp.int32)
    traj_mask = jnp.zeros((B, T), jnp.bool_)

    if mesh is not None:
        # data-parallel: shard the independent games axis across the mesh;
        # the whole lockstep loop then partitions under SPMD (params stay
        # replicated — see parallel.mesh).
        from ..parallel.mesh import replicate, shard_leading

        boards0 = shard_leading(boards0, mesh)
        traj_me, traj_opp, traj_pi, traj_parity, traj_mask = shard_leading(
            (traj_me, traj_opp, traj_pi, traj_parity, traj_mask), mesh
        )
        variables = replicate(variables, mesh)

    # root-eval reuse (round 4): the root evaluation of ply t+1 is the
    # chosen child's cached evaluation from ply t's search tree — the
    # network is deterministic, so seeding the loop with ONE root forward
    # here and reusing the tree cache thereafter is bit-identical to
    # re-evaluating every root, and saves 1 of num_simulations+1 forwards
    # per ply (the forward is ~95% of the sim step at B=1024 —
    # results/nn_inference_decomposition.md round 4).
    if reuse_root_eval:
        legal_r, term_r, win_r, feats_r = engine.observe(
            boards0, with_features=True)
        log_p_r, v_r = net(feats_r)
        win_rf = win_r.astype(jnp.float32)
        cache0 = mcts.RootCache(
            prior=mcts.masked_probs(log_p_r, legal_r),
            value=jnp.where(term_r, win_rf, v_r[..., 0]),
            legal=legal_r,
            terminal=term_r,
            winner=win_rf,
        )
    else:
        A_ = A
        cache0 = mcts.RootCache(
            prior=jnp.zeros((B, A_), jnp.float32),
            value=jnp.zeros((B,), jnp.float32),
            legal=jnp.zeros((B, A_), jnp.bool_),
            terminal=jnp.zeros((B,), jnp.bool_),
            winner=jnp.zeros((B,), jnp.float32),
        )
    if mesh is not None:
        from ..parallel.mesh import shard_leading

        cache0 = mcts.RootCache(*shard_leading(tuple(cache0), mesh))

    def cond(carry):
        boards, cache, any_live, _, _, _, _, _, _, t = carry
        return any_live & (t < T)

    def body(carry):
        boards, cache, _, rng, t_me, t_opp, t_pi, t_par, t_mask, t = carry
        rng, k_search, k_act = jax.random.split(rng, 3)

        res, tree = mcts.search(
            engine,
            net,
            boards,
            k_search,
            num_simulations=num_simulations,
            c_puct=c_puct,
            dirichlet_alpha=dirichlet_alpha,
            dirichlet_epsilon=dirichlet_epsilon,
            add_noise=add_noise,
            cond_interval=cond_interval,
            root_cache=cache if reuse_root_eval else None,
            return_tree=True,
        )
        # liveness comes for free from the search's root observation (the
        # separate is_terminal flood this replaced cost 2 extra flood passes)
        live = ~res.root_terminal
        # canonical training target: visit distribution (temperature 1)
        pi = mcts.action_probs_from_counts(res.visit_counts, res.legal, 1.0)
        # action temperature schedule
        temp = jnp.where(
            boards.move_count < temperature_threshold, 1.0, 0.0
        ).astype(jnp.float32)
        act_probs = mcts.action_probs_from_counts(res.visit_counts, res.legal, temp)
        # exact zero-probability masking (-inf logits): a zero-visit action
        # can NEVER be sampled, which also guarantees the chosen action's
        # child is expanded — the invariant root-eval reuse relies on (the
        # old +1e-12 smoothing left a ~e^-24 tail on zero-visit actions)
        action = jax.random.categorical(
            k_act,
            jnp.where(act_probs > 0,
                      jnp.log(jnp.maximum(act_probs, 1e-30)), -jnp.inf),
            axis=-1,
        ).astype(jnp.int32)

        lv = live[:, None]
        t_me = t_me.at[:, t].set(jnp.where(lv, boards.me, 0))
        t_opp = t_opp.at[:, t].set(jnp.where(lv, boards.opp, 0))
        t_pi = t_pi.at[:, t].set(jnp.where(lv, pi, 0.0))
        t_par = t_par.at[:, t].set(jnp.where(live, boards.move_count % 2, 0))
        t_mask = t_mask.at[:, t].set(live)

        nxt, _ = engine.step(
            boards, action, pass_legal=res.legal[..., engine.pass_action]
        )
        boards = jax.tree.map(
            lambda n, o: jnp.where(
                live.reshape(live.shape + (1,) * (n.ndim - live.ndim)), n, o
            ),
            nxt,
            boards,
        )
        if reuse_root_eval:
            new_cache = mcts.extract_root_cache(tree, action)
            # dead games keep their (terminal=True) cache so they stay dead
            cache = jax.tree.map(
                lambda n, o: jnp.where(
                    live.reshape(live.shape + (1,) * (n.ndim - live.ndim)),
                    n, o),
                new_cache, cache,
            )
        return (boards, cache, live.any(), rng, t_me, t_opp, t_pi, t_par,
                t_mask, t + 1)

    if cond_interval > 1:
        inner = body

        def body(carry):  # noqa: F811 — k moves per liveness check
            return jax.lax.fori_loop(
                0, cond_interval, lambda _, c: inner(c), carry)

    boards, _, _, _, t_me, t_opp, t_pi, t_par, t_mask, _ = jax.lax.while_loop(
        cond,
        body,
        (
            boards0,
            cache0,
            jnp.bool_(True),
            rng,
            traj_me,
            traj_opp,
            traj_pi,
            traj_parity,
            traj_mask,
            0,
        ),
    )

    # outcome assignment: winner from final side-to-move, re-expressed per step
    w_final = engine.winner(boards)  # (B,) from final mover's perspective
    final_parity = boards.move_count % 2
    same_parity = (t_par == final_parity[:, None]).astype(jnp.float32)
    value = w_final[:, None].astype(jnp.float32) * (2.0 * same_parity - 1.0)
    value = jnp.where(t_mask, value, 0.0)

    c_me, c_opp = engine.stone_counts(boards)
    # black == the side whose parity is 0 at the end
    winner_black = jnp.where(final_parity == 0, w_final, -w_final)

    return Trajectory(
        me=t_me,
        opp=t_opp,
        pi=t_pi,
        value=value,
        mask=t_mask,
        final_me_count=c_me,
        final_opp_count=c_opp,
        winner_black=winner_black,
        num_moves=boards.move_count,
    )


class SelfPlayWorker:
    """Object facade with the reference worker API
    (``/root/reference/src/train/self_play.py:25,52,137`` and the parallel
    worker ``parallel_self_play.py:218,282``): ``execute_episode`` /
    ``execute_episodes``. All episodes run batched in lockstep on device."""

    def __init__(
        self,
        engine: OthelloEngine,
        apply_fn,
        variables,
        num_simulations: int = 25,
        c_puct: float = 1.0,
        dirichlet_alpha: float = 0.3,
        dirichlet_epsilon: float = 0.25,
        temperature_threshold: int = 15,
    ):
        self.engine = engine
        self.apply_fn = apply_fn
        self.variables = variables
        self.num_simulations = num_simulations
        self.c_puct = c_puct
        self.dirichlet_alpha = dirichlet_alpha
        self.dirichlet_epsilon = dirichlet_epsilon
        self.temperature_threshold = temperature_threshold

    def execute_episodes(self, num_episodes: int, rng: jax.Array,
                         add_noise: bool = True) -> Trajectory:
        return play_games(
            self.engine,
            self.apply_fn,
            self.variables,
            rng,
            num_games=num_episodes,
            num_simulations=self.num_simulations,
            c_puct=self.c_puct,
            dirichlet_alpha=self.dirichlet_alpha,
            dirichlet_epsilon=self.dirichlet_epsilon,
            temperature_threshold=self.temperature_threshold,
            add_noise=add_noise,
        )

    def execute_episode(self, rng: jax.Array, add_noise: bool = True) -> Trajectory:
        return self.execute_episodes(1, rng, add_noise=add_noise)

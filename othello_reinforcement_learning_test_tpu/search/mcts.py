"""Array-tree batched MCTS (mctx-style), TPU-native.

Replaces the reference's Python object-tree search
(``/root/reference/src/mcts/node.py``, ``src/mcts/mcts.py``) and its lockstep
"BatchMCTS" (``src/train/parallel_self_play.py:31-216``) with a single
fixed-shape array program: every game carries a node pool of
``num_simulations + 1`` slots, selection/expansion/backup are pure batched
DENSE batched array ops, and **all leaf evaluations across all games batch
into one network call per simulation** — the whole search jit-compiles into
one XLA program (no per-node Python, no batch-1 inference).

AlphaZero search semantics match the reference feature-for-feature: PUCT
selection with c_puct, priors from the policy net masked to legal actions
with uniform fallback (node.py:62-89), optional root Dirichlet noise mixed as
``(1-eps)*p + eps*eta`` over legal actions (mcts.py:210-228), terminal leaves
valued by the true game winner (mcts.py:127-130), sign-flipping backup
(mcts.py:152-172), and visit-count policies with temperature
(node.py:147-182).

Deliberate divergences from reference quirks (SURVEY.md §7):

- Canonical PUCT: the parent maximizes ``-Q(child) + U`` (value from the
  *parent's* perspective). The reference maximizes ``+Q(child)`` — the
  opponent's value estimate (its quirk #2).
- Root statistics are updated by every backup (reference never updates the
  root, its quirk #3), so ``root_value`` is meaningful and U-terms at the
  root behave canonically.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.bitboard import Board, OthelloEngine

# The search walks the tree with fixed-size path buffers; depth can never
# exceed the number of expanded nodes.
NO_CHILD = jnp.int32(-1)


class Tree(struct.PyTreeNode):
    """Batched node pools: every leaf carries a leading (B,) games axis.

    ``N`` = num_simulations + 1 slots per game; slot 0 is the root.
    """

    board_me: jnp.ndarray  # (B, N, 2) uint32
    board_opp: jnp.ndarray  # (B, N, 2) uint32
    visit: jnp.ndarray  # (B, N) int32
    value_sum: jnp.ndarray  # (B, N) float32 — from the node's own perspective
    prior: jnp.ndarray  # (B, N, A) float32
    children: jnp.ndarray  # (B, N, A) int32, NO_CHILD when absent
    # per-edge statistics stored AT THE PARENT so selection is one contiguous
    # row read instead of A scattered gathers through `children`; values are
    # from the CHILD's own perspective.
    child_visit: jnp.ndarray  # (B, N, A) int32
    child_value_sum: jnp.ndarray  # (B, N, A) float32
    legal: jnp.ndarray  # (B, N, A) bool
    terminal: jnp.ndarray  # (B, N) bool
    term_value: jnp.ndarray  # (B, N) float32 — game winner at terminal nodes
    # raw leaf evaluation (NN value, or winner at terminals) — cached so a
    # follow-up search rooted at this node can skip its root forward
    # entirely (root-eval reuse, round 4: one of the 26 forwards per
    # self-play ply)
    nn_value: jnp.ndarray  # (B, N) float32
    num_nodes: jnp.ndarray  # (B,) int32


class SearchResult(NamedTuple):
    visit_counts: jnp.ndarray  # (B, A) float32 — root child visit counts
    root_value: jnp.ndarray  # (B,) float32 — mean value at root (mover view)
    q_values: jnp.ndarray  # (B, A) float32 — per-action Q, mover perspective
    legal: jnp.ndarray  # (B, A) bool
    root_terminal: jnp.ndarray  # (B,) bool — roots that are finished games


class RootCache(NamedTuple):
    """Cached root evaluation for ``search(root_cache=...)`` — exactly the
    quantities the fresh root path computes from ``observe`` + one network
    call, extracted instead from the previous search's tree at the chosen
    child (``extract_root_cache``). The network is deterministic, so reuse
    is bit-identical to re-evaluating and saves one forward per ply (1 of
    26 at 25 sims — the forward is ~95% of the sim step, round-4
    decomposition in results/nn_inference_decomposition.md)."""

    prior: jnp.ndarray  # (B, A) float32 — masked_probs, noise NOT applied
    value: jnp.ndarray  # (B,) float32 — NN value (winner at terminals)
    legal: jnp.ndarray  # (B, A) bool
    terminal: jnp.ndarray  # (B,) bool
    winner: jnp.ndarray  # (B,) float32


def extract_root_cache(tree: Tree, action: jnp.ndarray) -> RootCache:
    """RootCache for the position reached by playing ``action`` at the
    root: a dense gather of the chosen child's cached rows. Only valid for
    actions whose child is expanded (any action with >= 1 root visit);
    unexpanded actions map to slot NO_CHILD and return zeros."""
    n_slots = tree.visit.shape[1]
    child_idx = _take_lane(tree.children[:, 0], action)  # (B,)
    m = _node_mask(child_idx, n_slots)
    return RootCache(
        prior=_take(tree.prior, m),
        value=_take(tree.nn_value, m),
        legal=_take(tree.legal, m),
        terminal=_take(tree.terminal, m),
        winner=_take(tree.term_value, m),
    )


class _Selection(NamedTuple):
    parent: jnp.ndarray  # (B,) int32 — node to expand from (or terminal node)
    action: jnp.ndarray  # (B,) int32
    path: jnp.ndarray  # (B, N) int32 — visited nodes, -1 padded
    path_action: jnp.ndarray  # (B, N) int32 — action taken FROM path[i]
    path_len: jnp.ndarray  # (B,) int32
    is_term_leaf: jnp.ndarray  # (B,) bool — stopped at existing terminal


def masked_probs(log_probs: jnp.ndarray, legal: jnp.ndarray) -> jnp.ndarray:
    """exp(log_probs) masked to legal actions and renormalized, uniform over
    legal as fallback when the mass vanishes (reference node.py:62-89)."""
    probs = jnp.exp(log_probs) * legal
    total = probs.sum(axis=-1, keepdims=True)
    n_legal = jnp.maximum(legal.sum(axis=-1, keepdims=True), 1)
    uniform = legal / n_legal
    return jnp.where(total > 1e-8, probs / jnp.maximum(total, 1e-8), uniform)


def add_dirichlet_noise(
    rng: jax.Array, prior: jnp.ndarray, legal: jnp.ndarray, alpha: float, eps: float
) -> jnp.ndarray:
    """Mix root prior with Dirichlet noise over legal actions
    (reference mcts.py:210-228)."""
    gamma = jax.random.gamma(rng, alpha, shape=prior.shape)
    gamma = gamma * legal
    noise = gamma / jnp.maximum(gamma.sum(axis=-1, keepdims=True), 1e-8)
    return jnp.where(legal, (1.0 - eps) * prior + eps * noise, 0.0)


def _node_mask(node: jnp.ndarray, n_slots: int) -> jnp.ndarray:
    """(B, N) bool one-hot row mask for per-game node indices.

    TPU has no fast irregular gather: a vmapped ``arr[node]`` lowers to a
    scattered HBM gather measured at ~30x the linear-read cost at B=4096
    (results/mcts_dense_tree.md). Every per-game row read/write below is
    therefore a DENSE one-hot contraction/blend — linear sweeps that run at
    full VPU/MXU bandwidth and scale linearly in B."""
    return jnp.arange(n_slots, dtype=node.dtype)[None, :] == node[:, None]


def _take(arr: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Gather rows ``arr[b, node[b], ...]`` given the (B, N) mask."""
    m = mask.reshape(mask.shape + (1,) * (arr.ndim - 2))
    if arr.dtype == jnp.bool_:
        return jnp.any(arr & m, axis=1)
    return jnp.sum(jnp.where(m, arr, jnp.zeros((), arr.dtype)), axis=1)


def _take_lane(row: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Select ``row[b, idx[b]]`` from (B, A) densely along the lane dim."""
    mask = jnp.arange(row.shape[1], dtype=idx.dtype)[None, :] == idx[:, None]
    if row.dtype == jnp.bool_:
        return jnp.any(row & mask, axis=1)
    return jnp.sum(jnp.where(mask, row, jnp.zeros((), row.dtype)), axis=1)


def _blend_at(arr: jnp.ndarray, pos: jnp.ndarray, val: jnp.ndarray,
              pred: jnp.ndarray) -> jnp.ndarray:
    """Write ``val[b]`` at ``arr[b, pos[b]]`` where ``pred[b]`` (dense)."""
    mask = _node_mask(pos, arr.shape[1]) & pred[:, None]
    return jnp.where(mask, val[:, None], arr)


def _puct_best(tree: Tree, c_puct: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-node best PUCT action and its child index, for EVERY node at once:
    (B, N) ``act_star`` / ``child_star`` (NO_CHILD where unexpanded).

    The tree is immutable during one selection pass (no virtual loss in the
    one-leaf-per-simulation design), so the PUCT argmax at each node is a
    loop invariant — computing it densely up front turns the walk loop's
    per-iteration reads from five (B, N, A) tensors into two (B, N) ones
    (~65x fewer bytes per iteration; the canonical scores formula itself is
    unchanged, so selection is bit-identical)."""
    c_visit = tree.child_visit
    # edge values are stored from the child's own (opponent) perspective
    q = jnp.where(c_visit > 0,
                  -tree.child_value_sum / jnp.maximum(c_visit, 1), 0.0)
    visit = tree.visit.astype(jnp.float32)
    u = (
        c_puct
        * tree.prior
        * jnp.sqrt(jnp.maximum(visit, 1.0))[:, :, None]
        / (1.0 + c_visit.astype(jnp.float32))
    )
    scores = jnp.where(tree.legal, q + u, -jnp.inf)
    act_star = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (B, N)
    A = tree.prior.shape[-1]
    oh = jnp.arange(A, dtype=jnp.int32)[None, None, :] == act_star[:, :, None]
    child_star = jnp.sum(jnp.where(oh, tree.children, 0), axis=-1)
    return act_star, child_star


def _select(tree: Tree, c_puct: float, cond_interval: int = 1) -> _Selection:
    """Walk every game from its root via PUCT until an unexpanded edge or a
    terminal node, in lockstep (the loop runs max-depth-over-batch times).

    ``cond_interval`` (static): evaluate the lockstep liveness cond — a
    scalar cross-shard all-reduce under a dp mesh — once every k walk steps
    instead of every step. The body is a masked no-op for finished walkers
    (every update is gated on ``walking``), so extra trailing iterations
    change nothing: results are bit-identical to k=1
    (tests/test_train.py::TestSelfPlay::test_cond_interval_bit_identical). On
    latency-bound transports (Gloo/DCN) this trades <= k-1 no-op VPU sweeps
    for ~k x fewer synchronization rounds; measured in
    results/multihost_scaling.md."""
    B, n_slots = tree.visit.shape
    path0 = jnp.full((B, n_slots), -1, jnp.int32).at[:, 0].set(0)
    pact0 = jnp.full((B, n_slots), -1, jnp.int32)
    act_star, child_star = _puct_best(tree, c_puct)

    def cond(carry):
        node, action, path, pact, depth, stop_term = carry
        return jnp.any(~stop_term & (action == NO_CHILD))

    def body(carry):
        node, action, path, pact, depth, stop_term = carry
        walking = ~stop_term & (action == NO_CHILD)
        mask = _node_mask(node, n_slots)
        act = _take(act_star, mask)
        child = _take(child_star, mask)
        descend = walking & (child != NO_CHILD)
        # the edge taken from this node (recorded for per-edge backup; the
        # final unexpanded edge is recorded by the caller after expansion)
        pact = _blend_at(pact, depth, act, descend)
        nxt = jnp.where(descend, child, node)
        depth2 = depth + descend.astype(jnp.int32)
        path = _blend_at(path, depth2, nxt, descend)
        term_nxt = _take(tree.terminal, _node_mask(nxt, n_slots))
        stop_term = jnp.where(walking, descend & term_nxt, stop_term)
        # when we descend into an existing non-terminal child, continue
        # (action reset to NO_CHILD); otherwise we found the edge to expand
        action = jnp.where(walking, jnp.where(descend, NO_CHILD, act), action)
        return nxt, action, path, pact, depth2, stop_term

    if cond_interval > 1:
        inner = body

        def body(carry):  # noqa: F811 — k sub-steps per cond evaluation
            return jax.lax.fori_loop(
                0, cond_interval, lambda _, c: inner(c), carry)

    node0 = jnp.zeros((B,), jnp.int32)
    node, action, path, pact, depth, stop_term = jax.lax.while_loop(
        cond,
        body,
        (node0, jnp.full((B,), NO_CHILD), path0, pact0,
         jnp.zeros((B,), jnp.int32), tree.terminal[:, 0]),
    )
    is_term = stop_term | (action == NO_CHILD)
    return _Selection(
        parent=node,
        action=jnp.where(is_term, jnp.int32(0), action),
        path=path,
        path_action=pact,
        path_len=depth + 1,
        is_term_leaf=is_term,
    )


def _expand_and_backup(
    tree: Tree,
    sel: _Selection,
    child_me: jnp.ndarray,
    child_opp: jnp.ndarray,
    child_prior: jnp.ndarray,
    child_legal: jnp.ndarray,
    child_terminal: jnp.ndarray,
    child_winner: jnp.ndarray,
    nn_value: jnp.ndarray,
) -> Tree:
    """Write the new leaf (unless the walk stopped on an existing terminal
    node) and back up its value with alternating signs along the path.

    All writes are dense one-hot blends; the per-edge backup is a one-hot
    outer product (``bpn,bpa->bna``) that rides the MXU instead of a
    two-index scatter."""
    B, n_slots = tree.visit.shape
    A = tree.prior.shape[-1]
    new_idx = tree.num_nodes  # (B,)
    expand = ~sel.is_term_leaf

    m_new = _node_mask(new_idx, n_slots) & expand[:, None]  # (B, N)

    def wr(arr, value):
        m = m_new.reshape(m_new.shape + (1,) * (arr.ndim - 2))
        v = value.reshape(value.shape[:1] + (1,) + value.shape[1:])
        return jnp.where(m, v, arr)

    # raw evaluation of the new leaf (NN value, or true winner at terminal
    # children) — also cached in the tree for root-eval reuse
    raw_value = jnp.where(
        child_terminal, child_winner.astype(jnp.float32), nn_value)
    leaf_value = jnp.where(
        sel.is_term_leaf,
        _take(tree.term_value, _node_mask(sel.parent, n_slots)),
        raw_value,
    )

    m_edge = (
        (_node_mask(sel.parent, n_slots) & expand[:, None])[:, :, None]
        & _node_mask(sel.action, A)[:, None, :]
    )  # (B, N, A) — the parent->new-leaf edge
    tree = tree.replace(
        board_me=wr(tree.board_me, child_me),
        board_opp=wr(tree.board_opp, child_opp),
        prior=wr(tree.prior, child_prior),
        legal=wr(tree.legal, child_legal),
        terminal=wr(tree.terminal, child_terminal),
        term_value=wr(tree.term_value, child_winner.astype(jnp.float32)),
        nn_value=wr(tree.nn_value, raw_value),
        children=jnp.where(m_edge, new_idx[:, None, None], tree.children),
        num_nodes=tree.num_nodes + expand.astype(jnp.int32),
    )

    # Full backup path: selection path plus the new leaf when expanding.
    path = _blend_at(sel.path, sel.path_len, new_idx, expand)
    pact = _blend_at(sel.path_action, sel.path_len - 1, sel.action, expand)
    path_len = sel.path_len + expand.astype(jnp.int32)

    idx = jnp.arange(n_slots, dtype=jnp.int32)[None, :]  # path positions
    on_path = idx < path_len[:, None]
    # leaf sits at depth path_len-1; value alternates sign walking up
    parity = (path_len[:, None] - 1 - idx) % 2
    signed = jnp.where(on_path,
                       jnp.where(parity == 0, leaf_value[:, None],
                                 -leaf_value[:, None]), 0.0)
    safe = jnp.where(on_path, path, 0)
    # (B, P, N): position p holds the one-hot of the node at that depth.
    # A node appears AT MOST ONCE on a path, so every "sum over p" below
    # selects a single element — exact in plain f32 elementwise reduces, no
    # MXU/HIGHEST einsum needed (the (B,P,N)x(B,P,A) outer-product einsums
    # this replaced were 4x the whole remaining sim-step cost: 323 us/sim of
    # padded tiny batched matmuls + dtype relayouts, results/mcts_dense_tree.md).
    node_oh = (safe[:, :, None] == idx[:, None, :]) & on_path[:, :, None]
    visit = tree.visit + node_oh.astype(jnp.int32).sum(axis=1)
    value_sum = tree.value_sum + jnp.sum(
        node_oh * signed[:, :, None], axis=1)
    # per-edge stats: edge (path[i], pact[i]) leads to path[i+1]; it stores
    # the value from the CHILD's perspective (signed at depth i+1).
    # Instead of scattering (node, action) pairs into (B, N, A), compute per
    # NODE the action taken from it on this path and the child-signed value
    # ((B, N) reduces), then blend with an elementwise lane one-hot.
    on_edge = idx < (path_len - 1)[:, None]
    child_signed = jnp.where(
        on_edge,
        jnp.where((path_len[:, None] - 2 - idx) % 2 == 0, leaf_value[:, None],
                  -leaf_value[:, None]), 0.0)
    e_oh = node_oh & on_edge[:, :, None]  # (B, P, N)
    act_safe = jnp.where(on_edge, pact, 0)
    act_from = jnp.sum(e_oh * act_safe[:, :, None], axis=1)  # (B, N) int32
    csigned = jnp.sum(e_oh * child_signed[:, :, None], axis=1)  # (B, N) f32
    edge_on = jnp.any(e_oh, axis=1)  # (B, N) — node has an out-edge on path
    edge_mask = edge_on[:, :, None] & (
        jnp.arange(A, dtype=jnp.int32)[None, None, :] == act_from[:, :, None]
    )  # (B, N, A)
    child_visit = tree.child_visit + edge_mask.astype(jnp.int32)
    child_value_sum = tree.child_value_sum + jnp.where(
        edge_mask, csigned[:, :, None], 0.0)
    return tree.replace(
        visit=visit,
        value_sum=value_sum,
        child_visit=child_visit,
        child_value_sum=child_value_sum,
    )


def _init_tree(
    B: int,
    n_slots: int,
    num_actions: int,
    me: jnp.ndarray,
    opp: jnp.ndarray,
    prior: jnp.ndarray,
    legal: jnp.ndarray,
    terminal: jnp.ndarray,
    winner: jnp.ndarray,
    value: jnp.ndarray,
) -> Tree:
    """Batched node pools; root data written at slot 0 (static index)."""
    tree = Tree(
        board_me=jnp.zeros((B, n_slots, 2), jnp.uint32).at[:, 0].set(me),
        board_opp=jnp.zeros((B, n_slots, 2), jnp.uint32).at[:, 0].set(opp),
        visit=jnp.zeros((B, n_slots), jnp.int32).at[:, 0].set(1),
        value_sum=jnp.zeros((B, n_slots), jnp.float32).at[:, 0].set(value),
        prior=jnp.zeros((B, n_slots, num_actions), jnp.float32)
        .at[:, 0].set(prior),
        children=jnp.full((B, n_slots, num_actions), NO_CHILD),
        child_visit=jnp.zeros((B, n_slots, num_actions), jnp.int32),
        child_value_sum=jnp.zeros((B, n_slots, num_actions), jnp.float32),
        legal=jnp.zeros((B, n_slots, num_actions), jnp.bool_)
        .at[:, 0].set(legal),
        terminal=jnp.zeros((B, n_slots), jnp.bool_).at[:, 0].set(terminal),
        term_value=jnp.zeros((B, n_slots), jnp.float32)
        .at[:, 0].set(winner.astype(jnp.float32)),
        nn_value=jnp.zeros((B, n_slots), jnp.float32).at[:, 0].set(value),
        num_nodes=jnp.ones((B,), jnp.int32),
    )
    return tree


def search(
    engine: OthelloEngine,
    apply_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    boards: Board,
    rng: jax.Array,
    num_simulations: int,
    c_puct: float = 1.0,
    dirichlet_alpha: float = 0.3,
    dirichlet_epsilon: float = 0.25,
    add_noise: bool = False,
    cond_interval: int = 1,
    root_cache: RootCache = None,
    return_tree: bool = False,
):
    """Run batched MCTS from a batch of root boards. Returns a
    ``SearchResult`` (or ``(SearchResult, Tree)`` with ``return_tree``).

    ``apply_fn``: (B, S, S, 3) -> (log_probs (B, A), value (B, 1)); typically
    a closure over network variables in eval mode. ``cond_interval`` (static)
    decimates the select walk's liveness cond (see ``_select``); results are
    bit-identical for any k. ``root_cache`` supplies the root evaluation
    from a previous search's tree (``extract_root_cache``), skipping the
    root observe + forward — bit-identical (the network is deterministic)
    and one forward cheaper per call.
    """
    num_actions = engine.num_actions
    n_slots = num_simulations + 1
    batch = boards.move_count.shape
    assert len(batch) == 1, "search expects a single batch axis"
    B = batch[0]

    if root_cache is None:
        legal0, term0, win0, feats = engine.observe(boards, with_features=True)
        log_p, v0 = apply_fn(feats)
        prior0 = masked_probs(log_p, legal0)
        win0 = win0.astype(jnp.float32)
        root_value0 = jnp.where(term0, win0, v0[..., 0])
    else:
        prior0, root_value0, legal0, term0, win0 = root_cache
    if add_noise:
        rng, sub = jax.random.split(rng)
        prior0 = add_dirichlet_noise(
            sub, prior0, legal0, dirichlet_alpha, dirichlet_epsilon
        )

    tree = _init_tree(
        B, n_slots, num_actions,
        boards.me, boards.opp, prior0, legal0, term0, win0, root_value0
    )

    def sim_body(_, carry):
        tree, rng = carry
        sel = _select(tree, c_puct, cond_interval=cond_interval)

        m_parent = _node_mask(sel.parent, n_slots)
        parent_board = Board(
            me=_take(tree.board_me, m_parent),
            opp=_take(tree.board_opp, m_parent),
            move_count=jnp.zeros((B,), jnp.int32),
            passed=jnp.zeros((B,), jnp.bool_),
        )
        # pass-legality at the parent is already cached in the tree, so step
        # can skip its legal-move flood entirely
        parent_pass_legal = _take(tree.legal, m_parent)[:, engine.pass_action]
        child_board, _ = engine.step(
            parent_board, sel.action, pass_legal=parent_pass_legal
        )
        child_legal, child_term, child_win, feats = engine.observe(
            child_board, with_features=True
        )
        log_p, v = apply_fn(feats)
        child_prior = masked_probs(log_p, child_legal)

        tree = _expand_and_backup(
            tree,
            sel,
            child_board.me,
            child_board.opp,
            child_prior,
            child_legal,
            child_term,
            child_win,
            v[..., 0],
        )
        return tree, rng

    tree, _ = jax.lax.fori_loop(0, num_simulations, sim_body, (tree, rng))

    root_cv = tree.child_visit[:, 0]
    counts = root_cv.astype(jnp.float32)
    q_values = jnp.where(
        root_cv > 0,
        -tree.child_value_sum[:, 0] / jnp.maximum(root_cv, 1),
        0.0,
    )
    root_value = tree.value_sum[:, 0] / jnp.maximum(tree.visit[:, 0], 1)
    result = SearchResult(
        visit_counts=counts,
        root_value=root_value,
        q_values=q_values,
        legal=legal0,
        root_terminal=term0,
    )
    if return_tree:
        return result, tree
    return result


def action_probs_from_counts(
    counts: jnp.ndarray, legal: jnp.ndarray, temperature: jnp.ndarray
) -> jnp.ndarray:
    """Visit counts -> action distribution with temperature
    (reference node.py:147-182): t=0 gives a one-hot argmax; otherwise
    ``counts**(1/t)`` renormalized. ``temperature`` may be a traced scalar or
    a (B,) vector."""
    temperature = jnp.asarray(temperature, jnp.float32)
    t = jnp.broadcast_to(temperature, counts.shape[:-1])[..., None]
    counts = jnp.where(legal, counts, 0.0)
    # one-hot over max count (ties -> lowest index, like np.argmax)
    best = jnp.argmax(counts, axis=-1)
    onehot = jax.nn.one_hot(best, counts.shape[-1], dtype=jnp.float32)
    safe_t = jnp.maximum(t, 1e-3)
    # normalize by the max count before powering: bases <= 1 cannot overflow
    # float32 at small temperatures (counts**(1/t) would blow up below
    # t ~ 0.07); non-max entries underflow toward 0, degrading gracefully
    # into the argmax one-hot
    cmax = jnp.maximum(counts.max(axis=-1, keepdims=True), 1e-9)
    powered = jnp.power(jnp.maximum(counts, 0.0) / cmax, 1.0 / safe_t)
    total = powered.sum(-1, keepdims=True)
    n_legal = jnp.maximum(legal.sum(-1, keepdims=True), 1)
    uniform = legal / n_legal
    powered = jnp.where(total > 0, powered / jnp.maximum(total, 1e-8), uniform)
    return jnp.where(t <= 1e-4, onehot, powered)


def best_action(counts: jnp.ndarray, legal: jnp.ndarray) -> jnp.ndarray:
    """Deterministic argmax action over visit counts, restricted to legal
    (reference mcts.py:257-296)."""
    masked = jnp.where(legal, counts, -1.0)
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)


def action_evaluations(result: SearchResult) -> jnp.ndarray:
    """Per-action evaluations scaled to [0, 100] for hint UIs
    (reference mcts.py:298-362). Q is reported from the mover's perspective;
    unvisited/illegal actions get -1."""
    visited = (result.visit_counts > 0) & result.legal
    scaled = jnp.round((result.q_values + 1.0) * 50.0)
    return jnp.where(visited, scaled, -1.0)


class MCTS:
    """Object facade with the reference search API
    (``/root/reference/src/mcts/mcts.py:49,230,257,298``): ``search`` /
    ``get_action_probs`` / ``get_best_action`` / ``get_action_evaluations``,
    operating on batched boards. Thin wrapper over the functional API."""

    def __init__(
        self,
        engine: OthelloEngine,
        apply_fn: Callable,
        variables,
        num_simulations: int = 25,
        c_puct: float = 1.0,
        dirichlet_alpha: float = 0.3,
        dirichlet_epsilon: float = 0.25,
    ):
        self.engine = engine
        self.apply_fn = apply_fn
        self.variables = variables
        self.num_simulations = num_simulations
        self.c_puct = c_puct
        self.dirichlet_alpha = dirichlet_alpha
        self.dirichlet_epsilon = dirichlet_epsilon

    def search(self, boards: Board, rng: jax.Array,
               add_noise: bool = False) -> SearchResult:
        return search(
            self.engine,
            lambda x: self.apply_fn(self.variables, x),
            boards,
            rng,
            num_simulations=self.num_simulations,
            c_puct=self.c_puct,
            dirichlet_alpha=self.dirichlet_alpha,
            dirichlet_epsilon=self.dirichlet_epsilon,
            add_noise=add_noise,
        )

    def get_action_probs(self, boards: Board, rng: jax.Array,
                         temperature: float = 1.0,
                         add_noise: bool = False) -> jnp.ndarray:
        res = self.search(boards, rng, add_noise=add_noise)
        return action_probs_from_counts(res.visit_counts, res.legal, temperature)

    def get_best_action(self, boards: Board, rng: jax.Array) -> jnp.ndarray:
        res = self.search(boards, rng, add_noise=False)
        return best_action(res.visit_counts, res.legal)

    def get_action_evaluations(self, boards: Board, rng: jax.Array) -> jnp.ndarray:
        """Per-action 0-100 evaluations for hint UIs (-1 = unvisited)."""
        return action_evaluations(self.search(boards, rng, add_noise=False))

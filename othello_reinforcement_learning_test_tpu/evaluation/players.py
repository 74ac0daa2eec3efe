"""Players: vectorized policies over batched boards.

Counterpart of the reference's ``Player`` hierarchy
(``/root/reference/src/eval/players.py:20-303``), redesigned batch-first: a
player maps a whole batch of boards to a batch of actions so arenas run
thousands of games in lockstep on device. A host-side ``HumanPlayer`` serves
the interactive CLI front-end (single game).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.resnet import OthelloResNet
from ..ops import bits
from ..ops.bitboard import Board, OthelloEngine
from ..search import mcts


class Player:
    """Batched policy: ``act(rng, boards) -> (B,) int32 actions``.

    ``act`` must be jax-traceable so arena loops can jit around it
    (exception: ``HumanPlayer``, host-only).

    ``stateless()`` optionally returns ``(fn, params)`` with a *stable,
    hashable* ``fn(params, rng, boards)`` so arenas can jit one match
    program per player-type pair and swap weights without recompiling
    (critical when evaluating many checkpoints).
    """

    name = "player"

    def act(self, rng: jax.Array, boards: Board) -> jnp.ndarray:
        raise NotImplementedError

    def stateless(self):
        """Default: wrap ``act``. The wrapper is created once per instance so
        arena jit caches keyed on it stay stable across calls (a fresh lambda
        per call would force a full match recompile every time)."""
        fn = getattr(self, "_stateless_fn", None)
        if fn is None:
            def fn(params, rng, boards, _self=self):
                return _self.act(rng, boards)

            self._stateless_fn = fn
        return self._stateless_fn, ()

    def reset(self) -> None:  # session hook (reference players.py:44-47)
        pass


@functools.lru_cache(maxsize=None)
def _random_act_fn(engine: OthelloEngine):
    def fn(params, rng, boards):
        legal = engine.legal_actions(boards)
        logits = jnp.where(legal, 0.0, -jnp.inf)
        return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)

    return fn


@functools.lru_cache(maxsize=None)
def _greedy_act_fn(engine: OthelloEngine):
    def fn(params, rng, boards):
        legal = engine.legal_actions(boards)
        n_sq = engine.pass_action
        actions = jnp.arange(n_sq, dtype=jnp.int32)

        def flips_for_action(a):
            move = bits.bit(
                engine.action_to_bitpos(jnp.full(boards.move_count.shape, a))
            )
            return bits.popcount(engine.flips(boards.me, boards.opp, move))

        flip_counts = jax.vmap(flips_for_action, out_axes=-1)(actions)
        gains = jnp.where(legal[..., :n_sq], flip_counts + 1, -1)
        best_sq = jnp.argmax(gains, axis=-1).astype(jnp.int32)
        must_pass = legal[..., n_sq]
        return jnp.where(must_pass, jnp.int32(engine.pass_action), best_sq)

    return fn


@functools.lru_cache(maxsize=None)
def _mcts_act_fn(engine: OthelloEngine, apply_fn, num_simulations: int,
                 c_puct: float):
    def fn(variables, rng, boards):
        res = mcts.search(
            engine,
            lambda x: apply_fn(variables, x),
            boards,
            rng,
            num_simulations=num_simulations,
            c_puct=c_puct,
            add_noise=False,
        )
        return mcts.best_action(res.visit_counts, res.legal)

    return fn


class RandomPlayer(Player):
    """Uniform over legal actions (reference players.py:50-67)."""

    name = "Random"

    def __init__(self, engine: OthelloEngine):
        self.engine = engine

    def act(self, rng: jax.Array, boards: Board) -> jnp.ndarray:
        return _random_act_fn(self.engine)((), rng, boards)

    def stateless(self):
        return _random_act_fn(self.engine), ()


class GreedyPlayer(Player):
    """Maximizes own stone count after the move (reference players.py:70-112).

    The mover's stones after playing square ``a`` are
    ``me | move | flips`` => count = popcount(me) + 1 + popcount(flips); we
    compute flips for all squares at once via vmap over the action axis.
    Ties break to the lowest action index like the reference's in-order scan.
    """

    name = "Greedy"

    def __init__(self, engine: OthelloEngine):
        self.engine = engine

    def act(self, rng: jax.Array, boards: Board) -> jnp.ndarray:
        return _greedy_act_fn(self.engine)((), rng, boards)

    def stateless(self):
        return _greedy_act_fn(self.engine), ()


class MCTSPlayer(Player):
    """Network + MCTS at temperature 0, no noise (reference players.py:115-223)."""

    name = "MCTS"

    def __init__(
        self,
        engine: OthelloEngine,
        apply_fn: Callable,
        variables: Dict,
        num_simulations: int = 50,
        c_puct: float = 1.0,
    ):
        self.engine = engine
        self.apply_fn = apply_fn
        self.variables = variables
        self.num_simulations = num_simulations
        self.c_puct = c_puct

    def act(self, rng: jax.Array, boards: Board) -> jnp.ndarray:
        fn, params = self.stateless()
        return fn(params, rng, boards)

    def stateless(self):
        return (
            _mcts_act_fn(
                self.engine, self.apply_fn, self.num_simulations, self.c_puct
            ),
            self.variables,
        )

    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        engine: Optional[OthelloEngine] = None,
        num_simulations: int = 50,
        c_puct: float = 1.0,
    ) -> "MCTSPlayer":
        """Load a trainer checkpoint; architecture comes from the config
        sidecar (the reference infers it from state-dict shapes,
        players.py:159-223 — we persist the config instead)."""
        from ..models.resnet import init_variables
        from ..ops.bitboard import get_engine
        from ..train import checkpoint as ckpt_lib
        from ..train.trainer import TrainState, apply_eval, make_optimizer

        cfg = ckpt_lib.load_config(path) or {}
        mc = cfg.get("model", {})
        size = int(cfg.get("game", {}).get("size", mc.get("board_size", 8)))
        rules = cfg.get("game", {}).get("rules", "reference")
        engine = engine or get_engine(size, rules)
        model = OthelloResNet(
            num_blocks=int(mc.get("num_blocks", 10)),
            num_filters=int(mc.get("num_filters", 128)),
            board_size=size,
        )
        variables = init_variables(model, jax.random.PRNGKey(0))
        tx = make_optimizer(cfg)
        template = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.int32(0),
            iteration=jnp.int32(0),
        )
        state = ckpt_lib.load_train_state(path, template)
        player = cls(
            engine,
            apply_eval(model),
            {"params": state.params, "batch_stats": state.batch_stats},
            num_simulations=num_simulations,
            c_puct=c_puct,
        )
        player.model = model
        player.train_state = state
        return player


class EdaxPlayer(Player):
    """Placeholder for an external Edax engine adapter.

    Like the reference (players.py:226-262), the subprocess protocol is NOT
    implemented and play always falls back to uniform random; the name makes
    that explicit so arena results can't silently masquerade as wins over a
    real Edax. ``binary_path`` is recorded for a future adapter."""

    name = "Edax(random-fallback)"

    def __init__(self, engine: OthelloEngine, binary_path: Optional[str] = None,
                 level: int = 5):
        self.engine = engine
        self.level = level
        self.binary = binary_path
        self._fallback = RandomPlayer(engine)

    def act(self, rng: jax.Array, boards: Board) -> jnp.ndarray:
        return self._fallback.act(rng, boards)

    def stateless(self):
        return self._fallback.stateless()


class HumanPlayer(Player):
    """stdin input for CLI play: accepts ``0-63``, ``row,col`` or ``pass``
    (reference players.py:265-303). Single game, host-side."""

    name = "Human"

    def __init__(self, engine: OthelloEngine, input_fn: Callable[[str], str] = input):
        self.engine = engine
        self.input_fn = input_fn

    def act(self, rng: jax.Array, boards: Board) -> jnp.ndarray:
        legal = np.asarray(self.engine.legal_actions(boards))
        assert legal.shape[0] == 1, "HumanPlayer plays one game at a time"
        legal_list = np.where(legal[0])[0].tolist()
        size = self.engine.size
        while True:
            try:
                raw = self.input_fn(
                    f"move (0-{size * size - 1}, row,col, or 'pass') {legal_list}: "
                ).strip().lower()
            except (EOFError, KeyboardInterrupt):
                print("\n(quit)")
                raise SystemExit(0) from None
            try:
                if raw in ("pass", "p"):
                    a = self.engine.pass_action
                elif "," in raw:
                    r, c = (int(x) for x in raw.split(","))
                    a = r * size + c
                else:
                    a = int(raw)
            except ValueError:
                print("invalid input")
                continue
            if a in legal_list:
                return jnp.asarray([a], jnp.int32)
            print("illegal move")

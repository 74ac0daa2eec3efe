"""Players: vectorized policies over batched boards.

Counterpart of the reference's ``Player`` hierarchy
(``/root/reference/src/eval/players.py:20-303``), redesigned batch-first: a
player maps a whole batch of boards to a batch of actions so arenas run
thousands of games in lockstep on device. A host-side ``HumanPlayer`` serves
the interactive CLI front-end (single game).
"""

from __future__ import annotations

import functools
import os
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
        players.py:159-223 — we persist the config instead).

        A ``.pt``/``.pth`` *file* is treated as a reference-format torch
        checkpoint and imported through the weight bridge
        (``models/torch_bridge.py``) — a model trained on the reference
        plays here unmodified, mirroring ``MCTSPlayer.from_checkpoint``'s
        shape inference (reference players.py:183-204)."""
        from ..models.resnet import init_variables
        from ..ops.bitboard import get_engine
        from ..train import checkpoint as ckpt_lib
        from ..train.trainer import TrainState, apply_eval, make_optimizer

        if os.path.isfile(path) and path.endswith((".pt", ".pth")):
            from ..models.torch_bridge import load_reference_checkpoint

            model, variables, cfg = load_reference_checkpoint(path)
            engine = engine or get_engine(
                model.board_size, cfg.get("game", {}).get("rules", "reference")
            )
            player = cls(
                engine,
                apply_eval(model),
                {
                    "params": variables["params"],
                    "batch_stats": variables["batch_stats"],
                },
                num_simulations=num_simulations,
                c_puct=c_puct,
            )
            player.model = model
            player.config = cfg  # the .pt's embedded config (re-export uses it)
            return player

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
        player.config = cfg
        return player


class _HostCallbackPlayer(Player):
    """Shared plumbing for players whose move choice runs on the host
    behind ``jax.experimental.io_callback`` (the Edax subprocess and the
    native alpha-beta engine): u32-pair -> u64 word packing, pass-only
    short-circuit (finished games in the lockstep arena never hit the
    engine), illegal-reply fallback to the first legal action, and the
    cached stateless closure.

    Subclasses implement ``_host_move(i, me_words, opp_words, move_count,
    legal) -> Optional[int]`` for one game; returning ``None``, a pass, or
    an illegal action falls back to the first legal action.

    io_callback programs compile on CPU and directly-attached TPU but not
    over a tunneled/remote PJRT backend — drive these players with
    ``--device cpu`` there."""

    engine: OthelloEngine

    def _host_move(self, i: int, me_words: np.ndarray, opp_words: np.ndarray,
                   move_count: np.ndarray, legal: np.ndarray) -> Optional[int]:
        raise NotImplementedError

    def _host_act(self, me, opp, move_count, legal) -> np.ndarray:
        me = np.asarray(me)
        opp = np.asarray(opp)
        move_count = np.asarray(move_count)
        legal = np.asarray(legal)
        B = me.shape[0]
        me_words = (me.astype(np.uint64)[:, 0]
                    | (me.astype(np.uint64)[:, 1] << np.uint64(32)))
        opp_words = (opp.astype(np.uint64)[:, 0]
                     | (opp.astype(np.uint64)[:, 1] << np.uint64(32)))
        pass_action = self.engine.pass_action
        actions = np.zeros((B,), np.int32)
        for i in range(B):
            if not legal[i, :pass_action].any():
                actions[i] = pass_action  # pass-only / finished game
                continue
            a = self._host_move(i, me_words, opp_words, move_count, legal)
            if a is None or a >= pass_action or not legal[i, a]:
                a = int(np.argmax(legal[i]))  # quirk guard: stay legal
            actions[i] = a
        return actions

    def act(self, rng: jax.Array, boards: Board) -> jnp.ndarray:
        fn, params = self.stateless()
        return fn(params, rng, boards)

    def stateless(self):
        fn = getattr(self, "_stateless_fn", None)
        if fn is None:
            from jax.experimental import io_callback

            engine = self.engine

            def fn(params, rng, boards, _self=self):
                legal = engine.legal_actions(boards)
                return io_callback(
                    _self._host_act,
                    jax.ShapeDtypeStruct(
                        (boards.move_count.shape[0],), jnp.int32
                    ),
                    boards.me, boards.opp, boards.move_count, legal,
                    ordered=True,
                )

            self._stateless_fn = fn
        return self._stateless_fn, ()


class EdaxPlayer(_HostCallbackPlayer):
    """External Edax engine adapter over a persistent console subprocess.

    Implements the subprocess protocol the reference declares but never
    finishes (``/root/reference/src/eval/players.py:226-262`` falls back to
    random unconditionally). The wire protocol (Edax console / GGS-style,
    one command per line):

    - ``setboard <cells> <turn>`` — ``cells`` is S*S chars row-major from
      a1, ``X`` black / ``O`` white / ``-`` empty; ``turn`` is ``X`` or ``O``.
    - ``go`` — engine answers a line matching ``Edax plays <MOVE>`` where
      MOVE is a coordinate like ``D3`` (column letter + 1-based row) or
      ``PS`` for pass.
    - ``quit`` — terminate.

    ``binary_path`` (or ``$EDAX_BINARY``, or ``edax`` on PATH) selects the
    engine; checked-in fakes speaking this protocol and a variant dialect
    drive the tests (``tests/fake_edax.py``, ``tests/fake_edax_variant.py``).
    When no binary is found, play falls back to uniform random and the
    player name says so, as in round 1.

    **Version/dialect assumptions** (no real Edax binary ships in this
    image, so these are encoded assumptions, configurable rather than
    hard-coded): the default flags ``-q -level N`` and the
    ``... plays <MOVE>`` reply line target the Edax 4.x console UI
    (`mode 2`-style play against stdin commands). Installations that differ
    can override both without code changes:

    - ``args=[...]`` / ``$EDAX_ARGS`` (shlex-split) replaces the full
      argument vector, e.g. ``-q --level 21 -book-usage off``;
    - ``reply_pattern=...`` / ``$EDAX_REPLY_PATTERN`` replaces the reply
      regex; group 1 must capture the move token. The built-in default
      already tolerates common variants: ``Edax plays D3``, ``move d3``,
      ``bestmove D3``, and ``PS``/``pass`` for passes.

    Batched boards are served one game at a time on the host behind
    ``jax.experimental.io_callback``, so the player still composes with the
    jitted lockstep arena. Replies are validated against the engine's legal
    mask; an illegal or unparseable reply falls back to the first legal
    action (never crashes a match).
    """

    DEFAULT_REPLY_PATTERN = (
        r"(?:plays|moves?|bestmove)\s+([A-Ha-h][1-8]|PS|pass)"
    )

    def __init__(self, engine: OthelloEngine, binary_path: Optional[str] = None,
                 level: int = 5, args: Optional[list] = None,
                 reply_pattern: Optional[str] = None):
        import re
        import shlex
        import shutil

        self.engine = engine
        self.level = int(level)
        self.binary = (
            binary_path
            or os.environ.get("EDAX_BINARY")
            or shutil.which("edax")
        )
        if args is None:
            env_args = os.environ.get("EDAX_ARGS")
            args = (shlex.split(env_args) if env_args
                    else ["-q", "-level", str(self.level)])
        elif isinstance(args, str):
            args = shlex.split(args)
        self.args = list(args)
        self._move_re = re.compile(
            reply_pattern
            or os.environ.get("EDAX_REPLY_PATTERN")
            or self.DEFAULT_REPLY_PATTERN,
            re.IGNORECASE,
        )
        self._proc = None
        if self.binary and os.path.exists(self.binary):
            self.name = f"Edax(L{self.level})"
            self._fallback = None
        else:
            self.binary = None
            self.name = "Edax(random-fallback)"
            self._fallback = RandomPlayer(engine)

    # -- subprocess management -------------------------------------------
    REPLY_TIMEOUT_S = 5.0

    def _ensure_proc(self):
        import queue
        import subprocess
        import threading

        if self._proc is not None and self._proc.poll() is None:
            return self._proc
        self._proc = subprocess.Popen(
            [self.binary, *self.args],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            bufsize=1,
        )
        # reader thread: readline() on a subprocess pipe blocks with no
        # timeout, so a misbehaving engine (replies garbage, then waits for
        # more input) would hang the match; lines flow through a queue the
        # querier polls with a deadline instead
        self._lines = queue.Queue()

        def _pump(proc, q):
            for line in proc.stdout:
                q.put(line)
            q.put(None)  # EOF marker

        self._reader = threading.Thread(
            target=_pump, args=(self._proc, self._lines), daemon=True
        )
        self._reader.start()
        return self._proc

    def _readline(self) -> Optional[str]:
        """Next stdout line or None on EOF/timeout."""
        import queue

        try:
            return self._lines.get(timeout=self.REPLY_TIMEOUT_S)
        except queue.Empty:
            return None

    def close(self) -> None:
        if self._proc is not None and self._proc.poll() is None:
            try:
                self._proc.stdin.write("quit\n")
                self._proc.stdin.flush()
                self._proc.wait(timeout=2)
            except Exception:
                self._proc.kill()
        self._proc = None

    reset = close  # new session -> fresh engine state

    def _query_move(self, cells: str, turn: str) -> Optional[int]:
        """One setboard/go round-trip -> action index or None on failure."""
        try:
            proc = self._ensure_proc()
            proc.stdin.write(f"setboard {cells} {turn}\ngo\n")
            proc.stdin.flush()
            for _ in range(64):  # skip banner/echo lines
                line = self._readline()
                if line is None:
                    return None
                m = self._move_re.search(line)
                if m:
                    tok = m.group(1).upper()
                    if tok in ("PS", "PASS"):
                        return self.engine.pass_action
                    col = ord(tok[0]) - ord("A")
                    row = int(tok[1]) - 1
                    if 0 <= row < self.engine.size and 0 <= col < self.engine.size:
                        return row * self.engine.size + col
                    return None
        except (BrokenPipeError, OSError):
            self.close()
        return None

    # -- host-side move choice (one game; see _HostCallbackPlayer) --------
    def _host_move(self, i, me_words, opp_words, move_count, legal):
        size = self.engine.size
        mover_black = int(move_count[i]) % 2 == 0
        me_ch, opp_ch = ("X", "O") if mover_black else ("O", "X")
        me_w, opp_w = int(me_words[i]), int(opp_words[i])
        chars = []
        for r in range(size):
            for c in range(size):
                b = r * 8 + c  # grid bit = row*8 + col
                if me_w >> b & 1:
                    chars.append(me_ch)
                elif opp_w >> b & 1:
                    chars.append(opp_ch)
                else:
                    chars.append("-")
        return self._query_move("".join(chars), me_ch)

    def act(self, rng: jax.Array, boards: Board) -> jnp.ndarray:
        if self.binary is None:
            return self._fallback.act(rng, boards)
        return super().act(rng, boards)

    def stateless(self):
        if self.binary is None:
            return self._fallback.stateless()
        return super().stateless()


class NativeMinimaxPlayer(_HostCallbackPlayer):
    """Strong classical baseline: the C++ alpha-beta engine
    (``csrc/othello_native.cpp`` ``oth_best_move``) behind the batched
    player API.

    This is the in-repo realization of what the reference's ``EdaxPlayer``
    stub reached for (``/root/reference/src/eval/players.py:226-262``, falls
    back to random) — a search-based anchor opponent far above Greedy, with
    no external binary. Midgame: negamax + alpha-beta at ``depth`` plies
    with mobility+positional eval and static-weight move ordering; endgame:
    exact disc-differential solve once ≤ ``exact_empties`` squares remain.
    Depth 4 beats Greedy 40-0 and Random ~95% (tests/test_minimax.py).

    Like EdaxPlayer, batched boards are served on the host (µs per
    position) through the shared ``_HostCallbackPlayer`` plumbing — see
    its docstring for the io_callback/backend caveats. 8x8 only (the
    native engine is uint64)."""

    def __init__(self, engine: OthelloEngine, depth: int = 4,
                 exact_empties: int = 12):
        if engine.size != 8:
            raise ValueError("NativeMinimaxPlayer requires an 8x8 engine")
        from ..ops import native

        native.load()  # build eagerly: fail at construction, not mid-match
        self.engine = engine
        self.depth = int(depth)
        self.exact_empties = int(exact_empties)
        self._native = native
        self.name = f"Minimax(d{self.depth}/e{self.exact_empties})"

    def _host_move(self, i, me_words, opp_words, move_count, legal):
        a, _ = self._native.best_move(
            int(me_words[i]), int(opp_words[i]), self.depth,
            self.exact_empties, self.engine.rules,
        )
        return a


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

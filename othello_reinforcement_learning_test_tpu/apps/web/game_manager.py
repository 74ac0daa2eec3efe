"""Headless game-session manager shared by the web and GUI front-ends.

Mirrors the reference ``GameManager``
(``/root/reference/src/web/game_manager.py:18-332``): one interactive game
session with history/undo, threaded AI moves with an illegal-action random
fallback, hint evaluations, model loading and a simulations knob clamped to
[10, 500]. State lives in the batched JAX engine with batch (1,); search runs
through the same jitted MCTS as training.
"""

from __future__ import annotations

import glob
import os
import threading
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import bits
from ...ops.bitboard import Board, OthelloEngine, get_engine
from ...search import mcts

MIN_SIMULATIONS = 10
MAX_SIMULATIONS = 500


def _is_state_dict_file(path: str) -> bool:
    """True for torch pickle checkpoints (``torch.save`` zip archives hold a
    ``data.pkl``), False for TorchScript exports (``torch.jit.save`` archives
    hold ``constants.pkl``/``code/`` instead) — the latter fail under
    ``torch.load(weights_only=True)`` so offering them in the model list
    would be a dead entry. Legacy non-zip pickles pass through as loadable."""
    import zipfile

    try:
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
        # both archive kinds carry data.pkl; only TorchScript adds
        # constants.pkl + a code/ tree
        return not any(
            n.endswith("constants.pkl") or "/code/" in n for n in names
        )
    except zipfile.BadZipFile:
        return True
    except OSError:
        return False


class GameManager:
    """Single interactive game session (thread-safe via a session lock)."""

    def __init__(self, engine: Optional[OthelloEngine] = None,
                 model_dir: str = "data/models"):
        self.engine = engine or get_engine(8, "reference")
        self.model_dir = model_dir
        self._lock = threading.RLock()
        self._player = None  # MCTSPlayer once a model is loaded
        self.model_path: Optional[str] = None
        self.ai_simulations = 100
        self.is_ai_thinking = False
        self.last_ai_move: Optional[int] = None
        self.last_error: Optional[str] = None
        self._rng = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
        self.new_game()

    # -- session -----------------------------------------------------------
    def new_game(self) -> Tuple[bool, Optional[str]]:
        """Reset the session; refused while the AI thread is running so a
        stale background move can't land on the fresh board."""
        with self._lock:
            if getattr(self, "is_ai_thinking", False):
                return False, "AI is thinking"
            self.board = self.engine.initial_state((1,))
            self.history: List[Board] = []
            self.last_move: Optional[int] = None
            self.last_ai_move = None
            self.last_error = None
            return True, None

    def _next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -- state views -------------------------------------------------------
    def board_array(self) -> List[List[int]]:
        """SxS ints: 0 empty, +1 black, -1 white. Black is the parity-0 mover
        (reference game_manager.py:270-289)."""
        s = self.engine.size
        me = np.asarray(bits.to_planes(self.board.me, jnp.int32))[0]
        opp = np.asarray(bits.to_planes(self.board.opp, jnp.int32))[0]
        black_is_me = int(self.board.move_count[0]) % 2 == 0
        black, white = (me, opp) if black_is_me else (opp, me)
        grid = [[0] * s for _ in range(s)]
        for r in range(s):
            for c in range(s):
                i = r * 8 + c
                grid[r][c] = 1 if black[i] else (-1 if white[i] else 0)
        return grid

    def current_player(self) -> int:
        """+1 black to move, -1 white."""
        return 1 if int(self.board.move_count[0]) % 2 == 0 else -1

    def legal_moves(self) -> List[int]:
        mask = np.asarray(self.engine.legal_actions(self.board))[0]
        return [int(a) for a in np.where(mask)[0]]

    def stone_counts(self) -> Tuple[int, int]:
        """(black, white)."""
        c_me, c_opp = self.engine.stone_counts(self.board)
        if self.current_player() == 1:
            return int(c_me[0]), int(c_opp[0])
        return int(c_opp[0]), int(c_me[0])

    def is_game_over(self) -> bool:
        return bool(self.engine.is_terminal(self.board)[0])

    def winner(self) -> Optional[int]:
        """+1 black, -1 white, 0 draw, None if running."""
        if not self.is_game_over():
            return None
        w = int(self.engine.winner(self.board)[0])
        return w if self.current_player() == 1 else -w

    def state_dict(self) -> Dict:
        black, white = self.stone_counts()
        return {
            "board": self.board_array(),
            "current_player": self.current_player(),
            "legal_moves": self.legal_moves(),
            "black_count": black,
            "white_count": white,
            "move_count": int(self.board.move_count[0]),
            "is_game_over": self.is_game_over(),
            "winner": self.winner(),
            "last_move": self.last_move,
            "last_ai_move": self.last_ai_move,
            "is_ai_thinking": self.is_ai_thinking,
            "model_loaded": self._player is not None,
            "model_path": self.model_path,
            "ai_simulations": self.ai_simulations,
            "can_undo": len(self.history) > 0,
            "board_size": self.engine.size,
        }

    # -- moves -------------------------------------------------------------
    def make_move(self, action: int) -> Tuple[bool, Optional[str]]:
        with self._lock:
            if self.is_ai_thinking:
                return False, "AI is thinking"
            if self.is_game_over():
                return False, "game is over"
            if action not in self.legal_moves():
                return False, f"illegal move {action}"
            self.history.append(self.board)
            self.board, ok = self.engine.step(
                self.board, jnp.asarray([action], jnp.int32)
            )
            self.last_move = int(action)
            return bool(ok[0]), None

    def undo(self) -> Tuple[bool, Optional[str]]:
        """Pop one ply (reference game_manager.py:96-109)."""
        with self._lock:
            if self.is_ai_thinking:
                return False, "AI is thinking"
            if not self.history:
                return False, "nothing to undo"
            self.board = self.history.pop()
            self.last_move = None
            return True, None

    # -- AI ----------------------------------------------------------------
    def load_model(self, path: str) -> Tuple[bool, Optional[str]]:
        from ...evaluation.players import MCTSPlayer

        with self._lock:
            if self.is_ai_thinking:
                return False, "AI is thinking"
        try:
            player = MCTSPlayer.from_checkpoint(
                path, engine=self.engine, num_simulations=self.ai_simulations
            )
        except Exception as e:  # noqa: BLE001 — surfaced to the client
            self.last_error = str(e)
            return False, str(e)
        with self._lock:
            self._player = player
            self.model_path = path
        return True, None

    def set_simulations(self, n: int) -> int:
        n = max(MIN_SIMULATIONS, min(MAX_SIMULATIONS, int(n)))
        with self._lock:
            self.ai_simulations = n
            if self._player is not None:
                self._player.num_simulations = n
        return n

    def list_models(self) -> List[str]:
        """Checkpoint directories under the model dir (the reference globs
        ``data/models/**/*.pt``, api.py:236-246; ours are orbax dirs), plus
        any reference-format ``.pt``/``.pth`` files — those load through the
        torch weight bridge, so reference-trained models are selectable in
        the web UI as-is."""
        out = []
        for p in sorted(glob.glob(os.path.join(self.model_dir, "**"),
                                  recursive=True)):
            if os.path.isdir(p) and (
                os.path.basename(p).startswith("checkpoint_")
                or os.path.basename(p) == "final_model"
                # arbitrarily-named orbax checkpoint dirs (e.g. the
                # committed results/model_* flagships): identified by the
                # orbax manifest inside. A bare .config.json sidecar with
                # no orbax data in the directory is NOT listed — selecting
                # it would only fail later at load time (round-5 fix).
                or os.path.exists(os.path.join(p, "_METADATA"))
                or os.path.exists(os.path.join(p, "manifest.ocdbt"))
            ):
                out.append(p)
            elif os.path.isfile(p) and p.endswith((".pt", ".pth")):
                if _is_state_dict_file(p):
                    out.append(p)
        # drop orbax-internal subdirectories of detected checkpoints
        # (ocdbt.process_*/ also carries a manifest)
        return [p for p in out
                if not any(p != q and p.startswith(q + os.sep) for q in out)]

    def execute_ai_move(self) -> Tuple[bool, Optional[str]]:
        """Synchronous AI move (callers may thread it); illegal-action
        fallback to a random legal move like the reference
        (game_manager.py:111-173)."""
        with self._lock:
            if self._player is None:
                return False, "no model loaded"
            if self.is_ai_thinking:
                return False, "AI is already thinking"
            if self.is_game_over():
                return False, "game is over"
            self.is_ai_thinking = True
        return self._compute_ai_move()

    def _compute_ai_move(self) -> Tuple[bool, Optional[str]]:
        """Assumes ``is_ai_thinking`` is already set; clears it when done."""
        self.last_error = None  # a new attempt clears stale errors
        try:
            action = int(np.asarray(self._player.act(self._next_rng(),
                                                     self.board))[0])
            legal = self.legal_moves()
            if action not in legal:
                action = int(np.random.default_rng().choice(legal))
            with self._lock:
                self.history.append(self.board)
                self.board, _ = self.engine.step(
                    self.board, jnp.asarray([action], jnp.int32)
                )
                self.last_move = action
                self.last_ai_move = action
            return True, None
        except Exception as e:  # noqa: BLE001
            self.last_error = str(e)
            return False, str(e)
        finally:
            self.is_ai_thinking = False

    def start_ai_move(self) -> Tuple[bool, Optional[str]]:
        """Async AI move: background thread + ``is_ai_thinking`` polling
        (reference api.py:118-168)."""
        with self._lock:
            if self._player is None:
                return False, "no model loaded"
            if self.is_ai_thinking:
                return False, "AI is already thinking"
            if self.is_game_over():
                return False, "game is over"
            self.is_ai_thinking = True

        threading.Thread(target=self._compute_ai_move, daemon=True).start()
        return True, None

    def hint(self) -> Dict[int, int]:
        """{action: 0-100 eval} for legal moves (reference
        game_manager.py:175-204; search at max(10, sims // 2) like the GUI,
        app.py:445-455). Snapshots the board under the lock so a concurrent
        AI move can't produce evaluations for a different position."""
        with self._lock:
            if self._player is None or self.is_ai_thinking:
                return {}
            board = self.board
        sims = max(10, self.ai_simulations // 2)
        res = mcts.search(
            self.engine,
            lambda x: self._player.apply_fn(self._player.variables, x),
            board,
            self._next_rng(),
            num_simulations=sims,
            add_noise=False,
        )
        ev = np.asarray(mcts.action_evaluations(res))[0]
        legal = np.asarray(self.engine.legal_actions(board))[0]
        return {int(a): int(ev[a]) for a in np.where(legal)[0] if ev[a] >= 0}

"""Command-line interface: ``train`` / ``eval`` / ``play``.

Same surface as the reference CLI (``/root/reference/main.py:273-336``) with
the same flags; differences (documented):

- ``train --resume`` actually resumes from a checkpoint (the reference's
  ``load_checkpoint`` is never wired, SURVEY.md §5).
- ``play`` is implemented (human vs AI in the terminal) — a stub in the
  reference (main.py:262-270).
- device selection is JAX-native: TPU/GPU/CPU chosen by the runtime;
  ``system.device: cpu`` forces host CPU.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from datetime import datetime
from typing import Optional

import jax


def _maybe_force_cpu(device: str) -> None:
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from .utils import enable_compilation_cache

    enable_compilation_cache()


def set_seed(seed: int) -> jax.Array:
    """Deterministic root key (the reference seeds torch/np/cuda,
    main.py:62-72; JAX is functional so the key is the seed)."""
    import numpy as np
    import random

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def train_command(args) -> None:
    from .utils import load_config

    # force the platform before importing the training stack — orbax/flax
    # imports may initialize jax backends, after which the platform is locked
    config = load_config(args.config)
    _maybe_force_cpu(config["system"].get("device", "auto"))

    # multi-host bring-up (flag- or env-gated) BEFORE any backend use: every
    # process runs this same command with its own --process-id; afterwards
    # jax.devices() spans all hosts and the trainer shards over them
    coordinator = args.coordinator or os.environ.get("OTHELLO_COORDINATOR")
    if coordinator:
        from .parallel import initialize_distributed

        num_processes = args.num_processes or int(
            os.environ.get("OTHELLO_NUM_PROCESSES", 0)
        )
        process_id = (
            args.process_id
            if args.process_id is not None
            else int(os.environ.get("OTHELLO_PROCESS_ID", -1))
        )
        if num_processes <= 0 or process_id < 0:
            raise SystemExit(
                "--coordinator requires --num-processes and --process-id "
                "(or OTHELLO_NUM_PROCESSES / OTHELLO_PROCESS_ID)"
            )
        initialize_distributed(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}"
            f" up, {jax.device_count()} global devices"
        )

    from .train.trainer import AlphaZeroTrainer
    from .train import checkpoint as ckpt_lib
    print("=" * 70)
    print("AlphaZero Training (TPU-native)")
    print("=" * 70)
    print(f"config: {args.config}")
    print(f"devices: {jax.devices()}")

    trainer = AlphaZeroTrainer(config)
    if args.resume:
        path = args.resume
        if path == "latest":
            path = ckpt_lib.latest_checkpoint(trainer.checkpoint_dir)
            if path is None:
                raise SystemExit("--resume latest: no checkpoint found")
        trainer.load_checkpoint(path)
    t0 = time.time()
    trainer.train()
    print(f"training done in {time.time() - t0:.1f}s")


def eval_command(args) -> None:
    _maybe_force_cpu(args.device)
    from .evaluation import GreedyPlayer, MCTSPlayer, RandomPlayer, evaluate_player

    if args.simulations is None:
        # honor mcts.num_simulations_eval from the checkpoint's config
        # sidecar (a key the reference defines but never reads - SURVEY section 2)
        from .train.checkpoint import load_config as _ckpt_config

        cfg = _ckpt_config(args.checkpoint) or {}
        args.simulations = int(
            cfg.get("mcts", {}).get("num_simulations_eval") or 50
        )

    print("=" * 70)
    print("Model Evaluation")
    print("=" * 70)
    print(f"checkpoint: {args.checkpoint}")
    print(f"games per opponent: {args.games}; simulations: {args.simulations}")

    try:
        player = MCTSPlayer.from_checkpoint(
            args.checkpoint, num_simulations=args.simulations
        )
    except FileNotFoundError as e:
        raise SystemExit(f"error: {e}") from None
    engine = player.engine
    rng = set_seed(args.seed)

    opponents = [RandomPlayer(engine), GreedyPlayer(engine)]
    if args.minimax_depth:
        # strong classical anchor (C++ alpha-beta; needs a compiler + 8x8)
        try:
            from .evaluation import NativeMinimaxPlayer

            opponents.append(
                NativeMinimaxPlayer(engine, depth=args.minimax_depth)
            )
        except Exception as e:  # noqa: BLE001 — no compiler / non-8x8
            print(f"minimax opponent unavailable: {e}")
    if args.edax:
        from .evaluation import EdaxPlayer

        binary = None if args.edax == "auto" else args.edax
        edax = EdaxPlayer(
            engine, binary_path=binary, level=args.edax_level,
            args=args.edax_args,
        )
        if edax.binary is None:
            print("edax binary not found ($EDAX_BINARY / PATH); skipping")
        else:
            opponents.append(edax)
    results_summary = {}
    for opponent in opponents:
        rng, sub = jax.random.split(rng)
        try:
            out = evaluate_player(
                player, opponent, engine, num_games=args.games, rng=sub,
                verbose=args.verbose,
                opening_random_plies=args.opening_random_plies,
            )
        except Exception as e:  # noqa: BLE001 — e.g. host-callback players
            # fail to compile over a tunneled PJRT backend; keep the
            # completed opponents' results instead of aborting the eval
            print(f"vs {opponent.name}: evaluation failed ({e})")
            results_summary[opponent.name] = {"error": str(e)}
            continue
        results_summary[opponent.name] = {
            "win_rate": out["win_rate"],
            "avg_score": out["avg_score"],
            "avg_moves": out["avg_moves"],
            "wins": out["wins"],
            "losses": out["losses"],
            "draws": out["draws"],
        }
        print(
            f"vs {opponent.name:8s}: {out['win_rate'] * 100:5.1f}% win rate "
            f"({out['wins']}W-{out['losses']}L-{out['draws']}D), "
            f"avg score {out['avg_score']:.1f}, avg moves {out['avg_moves']:.1f}"
        )

    if args.save_results:
        out_dir = "data/eval"
        os.makedirs(out_dir, exist_ok=True)
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        path = os.path.join(out_dir, f"eval_{stamp}.json")
        with open(path, "w") as f:
            json.dump(
                {
                    "checkpoint": args.checkpoint,
                    "timestamp": datetime.now().isoformat(),
                    "mcts_simulations": args.simulations,
                    "games_per_opponent": args.games,
                    "results": results_summary,
                },
                f,
                indent=2,
            )
        print(f"results saved to {path}")


def play_command(args) -> None:
    """Human vs AI in the terminal (implemented; reference stub main.py:262-270)."""
    from .utils.device import resolve_device

    # interactive: probe the accelerator, degrade to CPU if wedged
    _maybe_force_cpu(resolve_device(args.device))
    import numpy as np

    from .evaluation import HumanPlayer, MCTSPlayer
    from .search import mcts as mcts_lib

    try:
        player_ai = MCTSPlayer.from_checkpoint(
            args.checkpoint, num_simulations=args.simulations
        )
    except FileNotFoundError as e:
        raise SystemExit(f"error: {e}") from None
    engine = player_ai.engine
    human = HumanPlayer(engine)
    rng = set_seed(args.seed)

    human_is_black = args.color != "white"
    boards = engine.initial_state((1,))
    print("you are", "black ●" if human_is_black else "white ○")
    while not bool(engine.is_terminal(boards)[0]):
        mover_black = int(boards.move_count[0]) % 2 == 0
        print()
        print(engine.to_string(jax.tree.map(lambda x: x[0], boards)))
        c_me, c_opp = engine.stone_counts(boards)
        black = int(c_me[0]) if mover_black else int(c_opp[0])
        white = int(c_opp[0]) if mover_black else int(c_me[0])
        print(f"● {black} - ○ {white}   ({'●' if mover_black else '○'} to move)")
        rng, sub = jax.random.split(rng)
        if mover_black == human_is_black:
            action = human.act(sub, boards)
        else:
            action = player_ai.act(sub, boards)
            a = int(action[0])
            if a == engine.pass_action:
                print("AI passes")
            else:
                print(f"AI plays {a} ({a // engine.size},{a % engine.size})")
        boards, ok = engine.step(boards, action)
        if not bool(ok[0]):
            print("(move rejected)")
    print()
    print(engine.to_string(jax.tree.map(lambda x: x[0], boards)))
    mover_black = int(boards.move_count[0]) % 2 == 0
    w = int(engine.winner(boards)[0])
    w_black = w if mover_black else -w
    outcome = "draw" if w_black == 0 else ("black ● wins" if w_black > 0 else "white ○ wins")
    print(f"game over: {outcome}")


def export_command(args) -> None:
    """Export a trained checkpoint to interchange formats:

    - ``reference-pt``: a torch checkpoint with the reference trainer's
      exact dict shape and state-dict keys (reference trainer.py:374-383)
      — loadable by the reference's CLI/GUI/web unmodified;
    - ``torchscript``: traced torch module, reference NCHW I/O contract;
    - ``onnx``: the reference's unimplemented REMAINING_TASKS §3 item
      (needs the optional ``onnx`` package, like the reference's extra);
    - ``stablehlo``: the TPU-native serving artifact (``models/export.py``).

    The input may itself be a reference ``.pt`` file, so this command also
    converts reference checkpoints between formats.
    """
    _maybe_force_cpu("cpu")  # weight surgery + tracing is host-side work
    from .evaluation.players import MCTSPlayer
    from .train import checkpoint as ckpt_lib

    player = MCTSPlayer.from_checkpoint(args.checkpoint)
    variables = player.variables
    if args.format == "reference-pt":
        from .models.torch_bridge import save_reference_checkpoint

        # a reference-.pt input carries its config inside the file, not in an
        # orbax sidecar — from_checkpoint exposes whichever one it loaded
        cfg = getattr(player, "config", None) or ckpt_lib.load_config(
            args.checkpoint
        ) or {}
        save_reference_checkpoint(variables, args.out, config=cfg)
    elif args.format == "torchscript":
        from .models.torch_bridge import save_torchscript

        save_torchscript(variables, args.out, batch_size=args.batch_size)
    elif args.format == "onnx":
        from .models.torch_bridge import save_onnx

        save_onnx(variables, args.out, batch_size=args.batch_size)
    else:  # stablehlo
        from .models.export import save_stablehlo

        save_stablehlo(
            player.model, variables, args.out, batch_size=args.batch_size
        )
    print(f"exported {args.format} -> {args.out}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Othello AlphaZero (TPU) - CLI")
    sub = parser.add_subparsers(dest="command", help="Commands")

    p_train = sub.add_parser("train", help="Train the model")
    p_train.add_argument("--config", type=str, default="configs/default_8x8.yaml")
    p_train.add_argument(
        "--resume", type=str, default=None,
        help="checkpoint path or 'latest' to resume training",
    )
    p_train.add_argument(
        "--coordinator", type=str, default=None,
        help="multi-host: coordinator address host:port "
             "(or $OTHELLO_COORDINATOR); run one process per host",
    )
    p_train.add_argument("--num-processes", type=int, default=None)
    p_train.add_argument("--process-id", type=int, default=None)
    p_train.set_defaults(func=train_command)

    p_eval = sub.add_parser("eval", help="Evaluate the model")
    p_eval.add_argument("--checkpoint", type=str, required=True)
    p_eval.add_argument("--games", type=int, default=20)
    p_eval.add_argument("--simulations", type=int, default=None,
                    help="MCTS simulations per move (default: the checkpoint config mcts.num_simulations_eval, else 50)")
    p_eval.add_argument("--seed", type=int, default=42)
    p_eval.add_argument("--minimax-depth", type=int, default=0,
                        help="also evaluate vs the native C++ alpha-beta "
                             "anchor at this depth (0 = off)")
    p_eval.add_argument("--edax", nargs="?", const="auto", default=None,
                        metavar="BINARY",
                        help="add an Edax opponent; optional binary path "
                             "(default: $EDAX_BINARY or 'edax' on PATH)")
    p_eval.add_argument("--edax-level", type=int, default=5)
    p_eval.add_argument("--edax-args", type=str, default=None,
                        help="override the engine argv (shlex-split), e.g. "
                             "'-q --level 21 -book-usage off'")
    p_eval.add_argument("--opening-random-plies", type=int, default=0,
                        help="randomize the first k plies (game diversity "
                             "between deterministic players)")
    p_eval.add_argument("--device", choices=["auto", "cpu"], default="auto")
    p_eval.add_argument("--verbose", action="store_true")
    p_eval.add_argument("--save-results", action="store_true")
    p_eval.set_defaults(func=eval_command)

    p_play = sub.add_parser("play", help="Play against AI")
    p_play.add_argument("--checkpoint", type=str, required=True)
    p_play.add_argument("--simulations", type=int, default=100)
    p_play.add_argument("--color", choices=["black", "white"], default="black")
    p_play.add_argument("--seed", type=int, default=0)
    p_play.add_argument("--device", choices=["auto", "cpu"], default="auto")
    p_play.set_defaults(func=play_command)

    p_exp = sub.add_parser(
        "export",
        help="Export a checkpoint (reference .pt / TorchScript / ONNX / "
             "StableHLO)",
    )
    p_exp.add_argument("--checkpoint", type=str, required=True,
                       help="orbax checkpoint dir or a reference .pt file")
    p_exp.add_argument("--out", type=str, required=True)
    p_exp.add_argument(
        "--format",
        choices=["reference-pt", "torchscript", "onnx", "stablehlo"],
        default="reference-pt",
    )
    p_exp.add_argument("--batch-size", type=int, default=1,
                       help="static batch for torchscript/onnx/stablehlo")
    p_exp.set_defaults(func=export_command)

    return parser


def main(argv: Optional[list] = None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    if hasattr(args, "func"):
        args.func(args)
    else:
        parser.print_help()


if __name__ == "__main__":
    main()

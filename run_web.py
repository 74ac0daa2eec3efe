#!/usr/bin/env python
"""Web app entry point (counterpart of reference ``run_web.py:18-65``).

Serves the canvas client + REST API. Uses the stdlib threading HTTP server
by default; ``--asgi`` runs the FastAPI adapter under uvicorn when those are
installed.
"""

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description="Othello AlphaZero web app")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--model", default=None, help="checkpoint to preload")
    parser.add_argument("--model-dir", default="data/models")
    parser.add_argument("--simulations", type=int, default=100)
    parser.add_argument("--asgi", action="store_true",
                        help="serve via FastAPI/uvicorn if installed")
    parser.add_argument("--device", choices=["auto", "cpu"], default="auto")
    args = parser.parse_args()

    from othello_reinforcement_learning_test_tpu.utils.device import (
        apply_device,
        resolve_device,
    )

    # interactive server: health-check the accelerator (the TPU tunnel can
    # wedge); degrade to CPU rather than hang on the first request
    apply_device(resolve_device(args.device))

    from othello_reinforcement_learning_test_tpu.apps.web.game_manager import (
        GameManager,
    )

    gm = GameManager(model_dir=args.model_dir)
    gm.set_simulations(args.simulations)
    if args.model:
        ok, err = gm.load_model(args.model)
        print(f"model preload: {'ok' if ok else f'failed: {err}'}")

    if args.asgi:
        import uvicorn

        from othello_reinforcement_learning_test_tpu.apps.web.api import create_app

        uvicorn.run(create_app(gm), host=args.host, port=args.port)
        return

    from othello_reinforcement_learning_test_tpu.apps.web.server import make_server

    server, _ = make_server(args.host, args.port, gm=gm)
    print(f"serving on http://{args.host}:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()

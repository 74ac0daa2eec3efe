#!/usr/bin/env python
"""Desktop GUI entry point (counterpart of reference ``run_gui.py:13-40``)."""

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description="Othello AlphaZero GUI")
    parser.add_argument("--model", default=None, help="checkpoint to preload")
    parser.add_argument("--model-dir", default="data/models")
    parser.add_argument("--device", choices=["auto", "cpu"], default="auto")
    args = parser.parse_args()

    from othello_reinforcement_learning_test_tpu.utils.device import (
        apply_device,
        resolve_device,
    )

    # interactive app: health-check the accelerator; fall back to CPU
    # instead of freezing the UI on a wedged device
    apply_device(resolve_device(args.device))

    import tkinter as tk

    from othello_reinforcement_learning_test_tpu.apps.gui import OthelloApp

    root = tk.Tk()
    OthelloApp(root, model_path=args.model, model_dir=args.model_dir)
    root.mainloop()


if __name__ == "__main__":
    main()

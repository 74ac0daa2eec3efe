#!/usr/bin/env python
"""Desktop GUI entry point (counterpart of reference ``run_gui.py:13-40``)."""

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description="Othello AlphaZero GUI")
    parser.add_argument("--model", default=None, help="checkpoint to preload")
    parser.add_argument("--model-dir", default="data/models")
    args = parser.parse_args()

    import tkinter as tk

    from othello_reinforcement_learning_test_tpu.apps.gui import OthelloApp

    root = tk.Tk()
    OthelloApp(root, model_path=args.model, model_dir=args.model_dir)
    root.mainloop()


if __name__ == "__main__":
    main()

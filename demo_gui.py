#!/usr/bin/env python
"""GUI demo: opens the app and plays a few scripted moves so reviewers can
see the board/info wiring without interacting (counterpart of the
reference's ``demo_gui.py:28``)."""

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None)
    args = parser.parse_args()

    import tkinter as tk

    from othello_reinforcement_learning_test_tpu.apps.gui import OthelloApp

    root = tk.Tk()
    app = OthelloApp(root, model_path=args.model)

    moves = [19, 18, 26]  # D3, C3, C4

    def step(i=0):
        if i < len(moves):
            app._on_board_click(moves[i])
            root.after(800, step, i + 1)

    root.after(800, step)
    root.mainloop()


if __name__ == "__main__":
    main()

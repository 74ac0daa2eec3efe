#!/usr/bin/env python3
"""Variant-dialect fake Edax: same console protocol, different reply verb.

Where ``fake_edax.py`` answers ``Edax plays D3`` (the Edax 4.x console
form), this engine answers lowercase ``move d3`` after a noise line, and
``move pass`` for passes — proving ``EdaxPlayer``'s reply parser tolerates
dialect drift (VERDICT r2 item 8). Shares the independent rules
implementation with fake_edax.py.
"""

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from fake_edax import legal_moves  # noqa: E402


def main():
    board = None
    size = 8
    turn = "X"
    print("variant engine v0.1 ready", flush=True)  # banner noise
    for raw in sys.stdin:
        line = raw.strip()
        if not line:
            continue
        parts = line.split()
        cmd = parts[0].lower()
        if cmd == "quit":
            return
        if cmd == "setboard" and len(parts) >= 3:
            board = parts[1]
            size = int(math.isqrt(len(board)))
            turn = parts[2].upper()
            print("ok", flush=True)
        elif cmd == "go":
            print("thinking...", flush=True)  # noise before the reply
            if board is None:
                print("move pass", flush=True)
                continue
            me = turn
            opp = "O" if me == "X" else "X"
            moves = legal_moves(board, size, me, opp)
            if not moves:
                print("move pass", flush=True)
            else:
                r, c = moves[0]
                print(f"move {chr(ord('a') + c)}{r + 1}", flush=True)
        else:
            print(f"? {cmd}", flush=True)


if __name__ == "__main__":
    main()

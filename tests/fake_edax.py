#!/usr/bin/env python3
"""Fake Edax binary for adapter tests.

Speaks the console protocol ``EdaxPlayer`` implements (see
``othello_reinforcement_learning_test_tpu/evaluation/players.py``):

    setboard <cells> <turn>   cells: S*S chars row-major, X/O/-; turn: X|O
    go                        -> "Edax plays <MOVE>"  (e.g. D3, or PS = pass)
    quit

Plays the first legal move in row-major order under STANDARD Othello rules
(an intentionally independent ~40-line implementation — no imports from the
package under test). Deterministic, so tests can assert exact moves.
"""

import math
import sys


def legal_moves(cells, size, me, opp):
    dirs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    moves = []
    for r in range(size):
        for c in range(size):
            if cells[r * size + c] != "-":
                continue
            ok = False
            for dr, dc in dirs:
                rr, cc = r + dr, c + dc
                seen_opp = False
                while 0 <= rr < size and 0 <= cc < size:
                    ch = cells[rr * size + cc]
                    if ch == opp:
                        seen_opp = True
                    elif ch == me:
                        if seen_opp:
                            ok = True
                        break
                    else:
                        break
                    rr += dr
                    cc += dc
                if ok:
                    break
            if ok:
                moves.append((r, c))
    return moves


def main():
    board = None
    size = 8
    turn = "X"
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
            print("board set", flush=True)
        elif cmd == "go":
            if board is None:
                print("Edax plays PS", flush=True)
                continue
            me = turn
            opp = "O" if me == "X" else "X"
            moves = legal_moves(board, size, me, opp)
            if not moves:
                print("Edax plays PS", flush=True)
            else:
                r, c = moves[0]
                print(f"Edax plays {chr(ord('A') + c)}{r + 1}", flush=True)
        else:
            print(f"? {cmd}", flush=True)


if __name__ == "__main__":
    main()

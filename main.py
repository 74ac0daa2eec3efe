#!/usr/bin/env python
"""Top-level CLI entry point: ``python main.py {train,eval,play}``.

Same invocation surface as the reference (``/root/reference/main.py``)."""

from othello_reinforcement_learning_test_tpu.cli import main

if __name__ == "__main__":
    main()

"""TPU-native AlphaZero Othello framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
system ``Sylphy0052/Othello_Reinforcement_learning_test`` (see SURVEY.md):

- ``ops``        — batched bitboard game engine (uint32-pair uint64 emulation,
                   Kogge-Stone style flood fills, fully jit/vmap-able) plus a
                   host-side C++ engine for interactive frontends.
- ``models``     — dual-head policy/value ResNet (Flax), bf16 compute.
- ``search``     — array-tree batched MCTS (mctx-style, PUCT + Dirichlet noise).
- ``train``      — on-device self-play, replay buffer, SGD trainer, Orbax
                   checkpointing.
- ``parallel``   — device mesh / sharding helpers for multi-chip scaling.
- ``evaluation`` — players (Random/Greedy/MCTS) and batched arena.
- ``utils``      — config loading/validation, metrics.
- ``apps``       — FastAPI web app and Tk GUI frontends.
"""

__version__ = "0.1.0"

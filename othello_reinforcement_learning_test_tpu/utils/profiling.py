"""Profiling and tracing utilities.

The reference's observability is wall-clock spans + TensorBoard scalars
(``/root/reference/src/train/trainer.py:166-222``) and three standalone
benchmark scripts (SURVEY.md §5). TPU-native equivalents here:

- :class:`PhaseTimer` — per-phase wall timers with ``block_until_ready``
  fencing (async dispatch would otherwise attribute time to the wrong phase).
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-viewable device trace.
- :func:`speed_of_light` — roofline-style table for the core workloads:
  measured throughput next to simple bandwidth/FLOP bounds.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulates wall time per named phase; fences device work."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1),
            }
            for k in self.totals
        }

    def report(self) -> str:
        lines = ["phase              total      calls     mean"]
        for k, v in sorted(self.summary().items(),
                           key=lambda kv: -kv[1]["total_s"]):
            lines.append(
                f"{k:18s} {v['total_s']:8.2f}s {v['count']:8d} "
                f"{v['mean_s'] * 1e3:8.2f}ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Device trace via jax.profiler (view with TensorBoard's profile tab)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_flops_per_sec(device: Optional[jax.Device] = None) -> Optional[float]:
    """Peak bf16 FLOP/s for known TPU generations (speed-of-light anchor)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    peaks = {
        "tpu v5 lite": 394e12,  # v5e: 394 TFLOP/s bf16
        "tpu v5e": 394e12,
        "tpu v5p": 459e12,
        "tpu v4": 275e12,
        "tpu v6": 918e12,
    }
    for k, v in peaks.items():
        if k in kind:
            return v
    return None


def speed_of_light(
    env_steps_per_sec: float,
    net_boards_per_sec: float,
    model_flops_per_board: float,
    device: Optional[jax.Device] = None,
) -> str:
    """Compare measured throughput to simple upper bounds."""
    peak = device_flops_per_sec(device)
    lines = [f"device: {device or jax.devices()[0]}"]
    lines.append(f"env steps/s (measured):     {env_steps_per_sec:,.0f}")
    lines.append(f"net boards/s (measured):    {net_boards_per_sec:,.0f}")
    if peak:
        bound = peak / max(model_flops_per_board, 1.0)
        frac = net_boards_per_sec / bound if bound else 0.0
        lines.append(
            f"net boards/s (compute bound {peak/1e12:.0f} TFLOP/s bf16): "
            f"{bound:,.0f}  -> {frac:.1%} of peak"
        )
    return "\n".join(lines)


def model_flops_per_board(num_blocks: int = 10, num_filters: int = 128,
                          board_size: int = 8) -> float:
    """Forward FLOPs per board for the dual-head ResNet (2x MACs)."""
    s2 = board_size * board_size
    f = num_filters
    stem = 2 * s2 * 9 * 3 * f
    blocks = num_blocks * 2 * (2 * s2 * 9 * f * f)
    policy = 2 * s2 * f * 2 + 2 * (2 * s2) * (s2 + 1)
    value = 2 * s2 * f * 1 + 2 * s2 * 256 + 2 * 256
    return float(stem + blocks + policy + value)

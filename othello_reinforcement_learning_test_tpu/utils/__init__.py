from .config import DEFAULTS, load_config
from .metrics import MetricsWriter

__all__ = ["DEFAULTS", "load_config", "MetricsWriter"]


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache: repeat CLI/bench invocations skip
    the multi-minute jit compiles of the big match/self-play programs."""
    import os

    import jax

    path = path or os.path.expanduser("~/.cache/jax_othello_tpu")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass

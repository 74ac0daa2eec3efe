from .config import DEFAULTS, load_config
from .metrics import MetricsWriter

__all__ = ["DEFAULTS", "load_config", "MetricsWriter"]


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache: repeat CLI/bench invocations skip
    the multi-minute jit compiles of the big match/self-play programs.

    Accelerator backends only: XLA:CPU AOT cache entries record machine
    features that trip loader warnings (and a documented SIGILL risk) even
    on the same host, so CPU runs compile fresh."""
    import os

    import jax

    try:
        if jax.default_backend() == "cpu":
            return
        path = path or os.path.expanduser("~/.cache/jax_othello_tpu")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass

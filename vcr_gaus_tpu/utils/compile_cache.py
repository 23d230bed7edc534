"""Persistent XLA compilation cache for every on-chip entry point.

First compiles of the full render graph take minutes (on a tunneled
backend they go through a remote compile service); the persistent cache
makes re-runs — train.py restarts, capacity-growth recompiles across runs,
bench.py, the on-chip validation scripts — start in seconds instead.

No reference analog: the CUDA fork gets this implicitly from the driver's
kernel cache (.nv cache dirs); XLA needs the cache dir opted into.

Safe everywhere: if the backend's PJRT client cannot serialize
executables, JAX logs a warning once and compiles as before. Opt out with
VCR_NO_COMPILE_CACHE=1 (e.g. when benchmarking compile time itself).
"""

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache dir; returns the dir
    (None when disabled). Call before the first jit dispatch; calling
    after is harmless (later compiles still cache)."""
    if os.environ.get("VCR_NO_COMPILE_CACHE", "").lower() in (
            "1", "true", "yes"):
        return None
    import jax

    path = (path
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "vcr_gaus_tpu", "xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even quick compiles: on the tunneled backend the round
        # trip to the compile service dominates, not XLA itself
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        # Don't leave the cache half-enabled: if a later knob update raised
        # after the dir was set, callers would see "disabled" while caching
        # is actually on.
        try:
            jax.config.update("jax_compilation_cache_dir", None)
        except Exception:
            pass
        return None  # ancient jax without the knobs: compile as before
    return path

"""Persistent XLA compilation cache.

Train-step compiles for this model are expensive (minutes on a tunneled
TPU); caching them on disk makes every process after the first start in
seconds.  Safe to call multiple times.
"""

import os

_ENABLED = False


def enable_compilation_cache(path: str | None = None):
    global _ENABLED
    if _ENABLED:
        return
    import jax
    if jax.default_backend() == "cpu":
        # XLA:CPU AOT entries are machine-feature-sensitive (SIGILL risk
        # when the cache was written under a different feature profile);
        # CPU compiles are also fast enough not to need caching.
        return
    path = path or os.environ.get(
        "SPURFIES_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "spurfies_xla"),
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ENABLED = True
    except Exception:  # older jax without the knobs — cache is best-effort
        pass

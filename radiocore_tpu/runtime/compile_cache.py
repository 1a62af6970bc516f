"""Persistent XLA compilation cache setup (one shared location).

Remote-TPU compiles in this environment can take many minutes (the r3
wideband attempts each burned ~65 min recompiling an identical
program), and long-compile sessions empirically die at their first
device→host fetch while cache-warm sessions (seconds to first fetch)
succeed — so EVERY hardware harness must enable the persistent cache
before building any jitted program. ``bench.py`` always did
(`bench.py:65-66` in r3, the one harness that produced artifacts);
this module is that pattern, shared.

Reference has no analog (single-process NumPy/CuPy, no compile step).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "~/.cache/radiocore_tpu/jaxcache"


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 5.0) -> str | None:
    """Point JAX at a persistent on-disk compiled-program cache.

    Call BEFORE the first jit compilation. Returns the cache directory,
    or None if setup failed (never raises — a missing cache only costs
    time).
    """
    import jax

    try:
        path = os.path.expanduser(
            cache_dir or os.environ.get("RADIOCORE_TPU_JAX_CACHE",
                                        _DEFAULT_DIR))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        return path
    except Exception:
        return None

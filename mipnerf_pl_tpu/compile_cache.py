"""Persistent XLA compilation cache.

The TPU in this environment is reached through a tunnel whose compile
latency swings from ~2 to 15+ minutes for the same program (observed across
rounds); a cold compile can eat an entire benchmark budget.  Enabling JAX's
persistent compilation cache makes every retry / repeat invocation of the
same executable a warm hit (deserialization, seconds instead of minutes).

The reference has no analog (torch eager recompiles nothing); this is
TPU-operations plumbing, not a ported component.
"""

from __future__ import annotations

import os
import sys

# Same default dir the perf tooling has always used, so bench.py / train.py
# warm-start from every prior experiment on this host.
DEFAULT_CACHE_DIR = os.path.expanduser('~/.jax_cache')


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk compilation cache.

    Env override: MIPNERF_COMPILE_CACHE (set to '0' to disable).
    Returns the cache dir in use, or None if disabled/unavailable.
    Safe to call multiple times and before/after backend init.
    """
    cache_dir = cache_dir or os.environ.get('MIPNERF_COMPILE_CACHE',
                                            DEFAULT_CACHE_DIR)
    if not cache_dir or cache_dir == '0':
        return None
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # Cache everything that took >=1 s to compile (default is 2 s;
        # the tunnel makes even small programs worth caching).
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        return cache_dir
    except Exception as e:  # pragma: no cover - version/backend guard
        print(f'# persistent compile cache unavailable: {e}', file=sys.stderr)
        return None

"""Persistent XLA compilation cache.

Cold jit compiles dominate one-shot CLI latency on TPU (30-170 s for
ResNet-101-sized executables through a remote-compile tunnel; the reference's
CUDA path has no analogous cost). JAX can persist compiled executables to
disk keyed by (HLO, compile options, topology); enabling it makes every CLI
after the first run of a given shape start ~instantly (measured on the v5e:
5.7 s → 0.9 s for a ResNet-50 B=256 forward in a *fresh process*).

Safe to call at any time — the cache directory is consulted lazily at
compile time, and entries are topology-keyed so CPU test runs and TPU runs
coexist in one directory.
"""

from __future__ import annotations

import os

# Compiles faster than this are cheaper than the disk round-trip; don't
# pollute the cache with them.
_MIN_COMPILE_SECS = 1.0

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "network_interpretation_imagenet_tpu", "xla"
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turn on the persistent compilation cache; returns the directory used.

    Precedence: explicit argument > ``NIT_COMPILATION_CACHE`` env var >
    ``~/.cache/network_interpretation_imagenet_tpu/xla``. Setting the env
    var to ``0``/``off`` disables caching (returns "").
    """
    import jax

    cache_dir = cache_dir or os.environ.get("NIT_COMPILATION_CACHE") or DEFAULT_DIR
    if cache_dir.lower() in ("0", "off", "none", ""):
        return ""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", _MIN_COMPILE_SECS)
    return cache_dir

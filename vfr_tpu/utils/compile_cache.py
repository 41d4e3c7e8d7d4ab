"""Persistent XLA compilation cache (docs/DESIGN.md entry 19).

Every new executable on this runtime costs 40-120 s of remote compile
(first-chunk compile of a spec-scale training run: ~145 s — DESIGN 18),
and the CLI model is one process per invocation, so WITHOUT a persistent
cache every `train`/`eval`/`corpus`/`serve` run re-pays every compile.
JAX's disk cache serializes executables keyed by (HLO, compile options,
backend); measured through the axon remote-compile tunnel it round-trips
fine (scripts/probe_compile_cache.py) and cuts the warm-start compile to
de/serialization time.

Opt-out with VFR_XLA_CACHE_DIR="" (empty); point it elsewhere to share a
cache across users/machines.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), "vfr_xla_cache")
_enabled = False


def enable_compile_cache(cache_dir: str = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    Returns the cache directory, or "" if disabled via env/argument.
    Must run before the first jit compilation to catch everything, but is
    safe (just less effective) at any point.
    """
    global _enabled
    if cache_dir is None:
        cache_dir = os.environ.get("VFR_XLA_CACHE_DIR", _DEFAULT_DIR)
    if not cache_dir:
        return ""
    if _enabled:
        return cache_dir
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default threshold (1 s) would skip small eval/serve programs whose
    # compile is still dominated by the ~40 s remote-compile floor on
    # this runtime; cache everything that takes measurable time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir

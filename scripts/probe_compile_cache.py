#!/usr/bin/env python
"""Probe: does JAX's persistent compilation cache work through the axon
remote-compile tunnel, and what does it save?

Context: every new executable costs 40-120 s of remote compile on this
runtime (.claude/skills/verify/SKILL.md), and a spec-scale training run
spends ~145 s compiling its first fused chunk (docs/DESIGN.md entry 18).
If serialized executables round-trip, every CLI invocation after the
first starts ~2 min sooner — the single largest remaining startup cost.

Method: in ONE process (two TPU processes deadlock), time jit-compile of
a distinctly-shaped matmul tower with the cache enabled, then exec
ourselves again (fresh process, same cache dir) and time the same
compile.  First process prints COLD=<s>, second prints WARM=<s>.

Run: python scripts/probe_compile_cache.py
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.environ.get("VFR_XLA_CACHE", "/tmp/vfr_xla_cache_probe")


def timed_compile():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    @jax.jit
    def tower(x, w1, w2, w3):
        for _ in range(6):
            x = jnp.tanh(x @ w1) @ w2 + x @ w3
        return x.sum()

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (512, 1027))   # odd shape: not cached by
    w1 = jax.random.normal(k, (1027, 1027))  # any other repo program
    w2 = jax.random.normal(k, (1027, 1027))
    w3 = jax.random.normal(k, (1027, 1027))
    t0 = time.perf_counter()
    tower.lower(x, w1, w2, w3).compile()
    return time.perf_counter() - t0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "warm":
        print(f"WARM={timed_compile():.1f}", flush=True)
    else:
        import shutil

        shutil.rmtree(CACHE, ignore_errors=True)
        print(f"COLD={timed_compile():.1f}", flush=True)
        # fresh process, same cache dir (serialized executable must
        # round-trip through a new backend client)
        subprocess.run([sys.executable, os.path.abspath(__file__), "warm"],
                       check=True, cwd=ROOT)
        n = sum(len(fs) for _, _, fs in os.walk(CACHE))
        print(f"cache_entries={n}")

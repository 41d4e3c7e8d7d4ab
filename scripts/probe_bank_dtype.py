#!/usr/bin/env python
"""Measure the bf16 feature-bank win (DESIGN 20 / DataConfig.bank_dtype).

DESIGN 18/19 showed the spec-scale cold start is dominated by the 1.97 GB
feature-bank H2D through the ~10 MB/s relay (the "first-chunk drain").
bank_dtype="bfloat16" halves the shipped bytes; this probe measures the
actual drain, per dtype, at the committed quality run's scale (10k videos,
rgb+flow, [10k, 6, 2048] f32 = 983 MB per stream).

Method: this runtime defers device_put until a dependent value is FETCHED
(docs/DESIGN.md 19), so the drain is timed as
    device_put(banks) -> tiny jit reduction over every bank array -> fetch
The reduction program is identical across dtypes (sums in f32), so the
difference isolates transfer bytes.  Each dtype uploads FRESH host arrays
(no aliasing with the other variant's upload).

Run on the TPU (~5 min): python scripts/probe_bank_dtype.py
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NUM_VIDEOS = 10_000


def main():
    import numpy as np

    from vfr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from vfr_tpu.data.features import banks_to_device

    rng = np.random.default_rng(0)
    # same shapes as the 10k-video quality run's stream banks
    host = {
        "rgb": rng.standard_normal((NUM_VIDEOS, 6, 2048),
                                   dtype=np.float32),
        "flow": rng.standard_normal((NUM_VIDEOS, 6, 2048),
                                    dtype=np.float32),
        "video_tef": rng.standard_normal((NUM_VIDEOS, 21, 2),
                                         dtype=np.float32),
    }

    @jax.jit
    def touch(banks):
        # depends on EVERY array -> fetching the result forces all uploads
        return sum(jnp.sum(v[:, :1].astype(jnp.float32))
                   for v in banks.values())

    # warmup: pay one-time backend/process init outside the timed region
    _w = jax.device_put(np.ones((8, 8), np.float32))
    float(np.asarray(jnp.sum(_w)))

    results = {}
    for dtype in ("float32", "bfloat16"):
        fresh = {k: v.copy() for k, v in host.items()}
        t0 = time.perf_counter()
        banks = banks_to_device(fresh, dtype)
        t_put = time.perf_counter()
        val = float(np.asarray(touch(banks)))
        t_fetch = time.perf_counter()
        mb = sum(int(v.nbytes) for v in banks.values()) / 1e6
        results[dtype] = {
            "bank_mb": round(mb, 1),
            "device_put_s": round(t_put - t0, 2),
            "drain_s": round(t_fetch - t_put, 2),
            "total_s": round(t_fetch - t0, 2),
            "checksum": val,
        }
        print(f"[{dtype}] {results[dtype]}", file=sys.stderr, flush=True)
        for v in banks.values():
            v.delete()

    out = {
        "num_videos": NUM_VIDEOS,
        "results": results,
        "speedup_total": round(results["float32"]["total_s"]
                               / results["bfloat16"]["total_s"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Measure `serve --follow` per-request latency + burst throughput
(VERDICT r2 missing #2 / weak #3).

Three steady-state measurements against a 10k-video (210k-row) index on
the real chip, written to artifacts/serve_latency.json:

  isolated  — one request in flight at a time (submit -> result wall time;
              p50/p95).  This is the latency floor of the runtime: one
              program dispatch + one device->host fetch (~100 ms relay
              round-trip here — docs/DESIGN.md entry 8), NOT the 0.4 ms
              batch compute.
  burst(d)  — 200 backlogged requests, micro_batch 8, pipeline_depth d in
              {1, 2}: aggregation packs 8 lines per dispatch; depth 2
              overlaps block N's fetch with block N+1's dispatch+compute.

Run (cwd=/root/repo, one TPU proc): python scripts/probe_serve_latency.py
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vfr_tpu.config import get_preset
from vfr_tpu.data.glove import Vocab
from vfr_tpu.eval.corpus import MomentIndex, serve_follow
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params

V, P, d, S, FEAT, VOCAB = 10_000, 21, 128, 2, 2048, 4096
N_ISOLATED, N_BURST = 50, 200


def make_index(weights):
    # Built device-side with no host round-trip: a D2H fetch of the whole
    # [S, V*P, d] tensor is exactly the relay cost the serving stack was
    # rebuilt to avoid, and is where a flaky relay can hang a probe.
    rng = np.random.default_rng(0)
    m16 = jnp.asarray(rng.standard_normal((S, V * P, d)).astype(np.float32),
                      jnp.bfloat16)
    flat = m16.astype(jnp.float32)
    m_sq = jnp.sum(flat * flat, axis=-1)
    return MomentIndex(
        m=m16,
        m_sq=m_sq,
        video_row=np.repeat(np.arange(V, dtype=np.int32), P),
        prop_idx=np.tile(np.arange(P, dtype=np.int32), V),
        spans_sec=np.tile(
            np.stack([np.arange(P), np.arange(P) + 1], 1).astype(np.float32),
            (V, 1)),
        weights=weights,
    )


class _DS:
    video_ids = [f"vid{i:05d}" for i in range(V)]


def main():
    cfg = get_preset("serving_10k")
    model = build_model(cfg)
    rng = np.random.default_rng(1)
    glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, FEAT)
    index = make_index(jnp.asarray(cfg.model.stream_weights, jnp.float32))
    vocab = Vocab([f"w{i:04d}" for i in range(2048)])
    queries = [f"w{i % 2000:04d} w{(i + 7) % 2000:04d} w{(i + 42) % 2000:04d}"
               for i in range(max(N_ISOLATED, N_BURST) + 8)]

    def follow(lines, depth, micro_batch=8):
        return serve_follow(
            params, model, _DS(), vocab, lines, k=10,
            max_query_len=cfg.data.max_query_len,
            topk_method=cfg.eval.topk_method,
            approx_recall=cfg.eval.approx_recall,
            index=index, micro_batch=micro_batch, pipeline_depth=depth,
        )

    # --- isolated: one request in flight at a time --------------------
    done = threading.Event()
    submit_t = {}

    def isolated_lines():
        for i in range(N_ISOLATED + 3):        # +3 warmup (incl. compile)
            done.clear()
            submit_t[queries[i]] = time.perf_counter()
            yield queries[i]
            done.wait(timeout=300)

    lat = []
    for j, rec in enumerate(follow(isolated_lines(), depth=2)):
        lat.append(time.perf_counter() - submit_t[rec["query"]])
        done.set()
    lat = np.array(lat[3:]) * 1e3              # drop warmup, -> ms

    # --- burst: all requests backlogged; depth 1 vs 2 at micro_batch 8,
    # then the --micro-batch 64 lever (4x fewer fetches for a backlog;
    # compute stays ~0.4 ms against a ~60 ms fetch, so throughput should
    # scale near-linearly with the pack size).  First mb=64 call pays a
    # fresh retriever compile (new token-block shape) before timing.
    burst = {}
    for depth, mb in ((1, 8), (2, 8), (1, 64)):
        if mb != 8:
            for _ in follow(iter(queries[:mb]), depth=depth, micro_batch=mb):
                pass                                   # compile warmup
        t0 = time.perf_counter()
        arrivals = []
        for rec in follow(iter(queries[:N_BURST]), depth=depth,
                          micro_batch=mb):
            arrivals.append(time.perf_counter() - t0)
        wall = arrivals[-1]
        burst[f"depth{depth}_mb{mb}"] = {
            "wall_s": round(wall, 3),
            "requests_per_sec": round(N_BURST / wall, 1),
            "time_to_first_ms": round(1e3 * arrivals[0], 1),
            "p95_sojourn_ms": round(1e3 * float(np.percentile(arrivals, 95)),
                                    1),
        }

    out = {
        "backend": jax.default_backend(),
        "corpus_videos": V,
        "index_rows": V * P,
        "micro_batch": 8,
        "topk": 10,
        "isolated_request_ms": {
            "p50": round(float(np.percentile(lat, 50)), 1),
            "p95": round(float(np.percentile(lat, 95)), 1),
            "mean": round(float(lat.mean()), 1),
            "n": int(len(lat)),
        },
        "burst_200_requests": burst,
        "note": (
            "isolated latency is fetch-dominated on this runtime (~100 ms "
            "device->host relay round-trip per result, ~8 ms dispatch, "
            "~0.4 ms batch compute — DESIGN 7b/8); burst mode shows what "
            "aggregation (8 lines/dispatch) + depth-2 pipelining (fetch N "
            "overlaps dispatch N+1) recover under load."
        ),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "serve_latency.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()

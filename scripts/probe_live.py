#!/usr/bin/env python
"""Probe: online-growth serving cost at the 10k-video spec scale.

Measures, on the real chip:
  * arena build (capacity 2x the initial corpus)
  * live_append of one 128-video delta: embed + in-place splice wall
  * retrieval batch time BEFORE vs AFTER appends (must be flat: the
    program is shaped by capacity, which is fixed)
  * retriever recompiles across appends (must be zero)
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from vfr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

Q, K = 128, 100
FEAT, VOCAB = 2048, 4096


def main():
    from vfr_tpu.config import get_preset
    from vfr_tpu.data.didemo import DidemoDataset
    from vfr_tpu.data.synthetic import make_didemo_fixture
    from vfr_tpu.eval.corpus import make_operand_retriever
    from vfr_tpu.eval.live import live_append, make_live_index
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import init_model_params
    from vfr_tpu.utils.timing import device_seconds_per_iter

    cfg = get_preset("serving_10k")
    on_tpu = jax.default_backend() == "tpu"
    V = 10_000 if on_tpu else 64
    # DidemoDataset's corpus is the ANNOTATED video set; 6.6 queries per
    # video covers ~all of them (the same recipe every 10k-scale script
    # here uses)
    fix = make_didemo_fixture(num_videos=V, num_queries=(66_000 if on_tpu
                                                         else 6 * V),
                              feature_dim=cfg.data.feature_dim,
                              glove_dim=cfg.data.glove_dim, seed=0)
    ds = DidemoDataset(fix.annotations, fix.rgb, fix.flow, fix.vocab,
                       cfg.data)
    model = build_model(cfg)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove,
                               cfg.data.feature_dim)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(
        rng.integers(1, VOCAB, size=(Q, cfg.data.max_query_len)), jnp.int32)
    lengths = jnp.asarray(
        rng.integers(4, cfg.data.max_query_len + 1, Q), jnp.int32)

    out = {"backend": jax.default_backend(),
           "initial_videos": len(ds.video_ids)}
    t0 = time.perf_counter()
    live = make_live_index(params, model, ds,
                           capacity_videos=2 * len(ds.video_ids),
                           index_dtype=cfg.eval.index_dtype)
    jax.block_until_ready(live.m_cat)
    out["arena_build_s"] = round(time.perf_counter() - t0, 2)
    out["capacity_rows"] = live.capacity
    print("build", out["arena_build_s"], flush=True)

    fn = make_operand_retriever(model, live.weights, K,
                                topk_method=cfg.eval.topk_method,
                                approx_recall=cfg.eval.approx_recall)

    def body(i, toks, m_cat, msq):
        t = 1 + (toks + i.astype(jnp.int32)) % (VOCAB - 1)
        d, r = fn(m_cat, msq, params, t, lengths)
        return d

    sec = device_seconds_per_iter(body, tokens,
                                  operands=(live.m_cat, live.msq_fused))
    out["retrieve_ms_before"] = round(1e3 * sec, 3)
    print("before", out["retrieve_ms_before"], flush=True)
    n_compiles = fn._cache_size()

    # appends: 4 deltas of 128 videos each
    dv = 128
    append_s = []
    for i in range(4):
        vids = [f"new{i}_{j:05d}" for j in range(dv)]
        rgb = rng.standard_normal(
            (dv,) + ds.rgb_feats.shape[1:]).astype(np.float32)
        flow = rng.standard_normal(
            (dv,) + ds.flow_feats.shape[1:]).astype(np.float32)
        t0 = time.perf_counter()
        live_append(live, params, model, ds, vids, rgb, flow=flow)
        jax.block_until_ready(live.m_cat)
        append_s.append(time.perf_counter() - t0)
        print(f"append {i}: {append_s[-1]:.2f}s", flush=True)
    out["append_128v_s_first"] = round(append_s[0], 2)   # compiles embed
    out["append_128v_s_steady"] = round(float(np.mean(append_s[1:])), 2)

    sec = device_seconds_per_iter(body, tokens,
                                  operands=(live.m_cat, live.msq_fused))
    out["retrieve_ms_after"] = round(1e3 * sec, 3)
    out["retriever_recompiles"] = fn._cache_size() - n_compiles
    out["final_videos"] = live.num_videos
    print("after", out["retrieve_ms_after"], "recompiles",
          out["retriever_recompiles"], flush=True)

    # maintenance at scale (DESIGN 24): tombstone 500 videos, compact the
    # whole arena (one capacity-shaped gather), then grow capacity —
    # retrieval must stay flat, with 0 recompiles until the grow
    from vfr_tpu.eval.live import live_compact, live_grow, live_remove

    victims = list(ds.video_ids[:500 if on_tpu else 8])
    t0 = time.perf_counter()
    live_remove(live, victims)
    jax.block_until_ready(live.msq_fused)
    out["remove_500v_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    reclaimed = live_compact(live)
    jax.block_until_ready(live.m_cat)
    out["compact_s"] = round(time.perf_counter() - t0, 2)
    out["compact_reclaimed_rows"] = int(reclaimed)
    sec = device_seconds_per_iter(body, tokens,
                                  operands=(live.m_cat, live.msq_fused))
    out["retrieve_ms_after_compact"] = round(1e3 * sec, 3)
    out["recompiles_after_compact"] = fn._cache_size() - n_compiles
    print("compact", out["compact_s"], "retrieve",
          out["retrieve_ms_after_compact"], flush=True)

    t0 = time.perf_counter()
    new_cap = live_grow(live, (25_000 if on_tpu else 3 * V))
    jax.block_until_ready(live.m_cat)
    out["grow_s"] = round(time.perf_counter() - t0, 2)
    out["grown_capacity_rows"] = int(new_cap)
    t0 = time.perf_counter()
    sec = device_seconds_per_iter(body, tokens,
                                  operands=(live.m_cat, live.msq_fused))
    out["grow_first_retrieve_wall_s"] = round(time.perf_counter() - t0, 2)
    out["retrieve_ms_after_grow"] = round(1e3 * sec, 3)
    # the ONE post-grow recompile is paid inside the timing harness's
    # program here (fn is inlined into its trace), so fn's own cache does
    # not tick — grow_first_retrieve_wall_s carries the compile cost
    out["grow_recompile_note"] = (
        "single post-grow recompile paid in grow_first_retrieve_wall_s "
        "(tests assert exactly +1 program on the direct-call path)")
    print("grow", out["grow_s"], "retrieve",
          out["retrieve_ms_after_grow"], "first-wall",
          out["grow_first_retrieve_wall_s"], flush=True)

    path = os.path.join(ROOT, "artifacts", "live_growth.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""Wall cost of one hard-negative mining refresh at spec corpus scale
(VERDICT r2 #1: 'what a refresh costs at 10k videos is unmeasured').

One refresh = build_moment_index over the whole training corpus (PASS 1)
+ exact top-(count+P) retrieval for every training query (PASS 2) + the
host-side own-video filter (train/hard_negatives.py).  Measured as wall
time of mine_hard_negatives on the real chip, AFTER a warmup call compiles
the programs (steady-state refresh is what the train loop pays per epoch).

Run: python scripts/probe_refresh_cost.py [num_videos num_queries]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from vfr_tpu.config import get_preset
import dataclasses

from vfr_tpu.data.didemo import DidemoDataset
from vfr_tpu.data.synthetic import make_didemo_fixture
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.train.hard_negatives import mine_hard_negatives


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    cfg = get_preset("didemo_fusion")
    t0 = time.perf_counter()
    fix = make_didemo_fixture(num_videos=V, num_queries=NQ,
                              feature_dim=cfg.data.feature_dim,
                              glove_dim=cfg.data.glove_dim,
                              vocab_words=cfg.data.synthetic_vocab_words,
                              noise=0.25, seed=0)
    ds = DidemoDataset(fix.annotations, fix.rgb, fix.flow, fix.vocab,
                       cfg.data)
    t_fix = time.perf_counter() - t0
    model = build_model(cfg)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove,
                               cfg.data.feature_dim)
    # device-resident banks, exactly as the train loop holds them
    import jax.numpy as jnp
    banks = jax.device_put(
        {k: jnp.asarray(v) for k, v in ds.feature_banks().items()})

    t0 = time.perf_counter()
    mine_hard_negatives(params, model, ds, count=8,
                        feature_banks=banks)            # compile + warm
    t_warm = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        v, p = mine_hard_negatives(params, model, ds, count=8,
                                   feature_banks=banks)
        times.append(time.perf_counter() - t0)
    out = {
        "backend": jax.default_backend(),
        "num_videos": V,
        "index_rows": V * ds.num_proposals,
        "num_queries": NQ,
        "count": 8,
        "fixture_build_s": round(t_fix, 1),
        "first_refresh_s_incl_compile": round(t_warm, 2),
        "steady_refresh_s": round(float(np.median(times)), 2),
        "refresh_runs_s": [round(t, 2) for t in times],
        "mined_valid_frac": round(float((v >= 0).mean()), 4),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

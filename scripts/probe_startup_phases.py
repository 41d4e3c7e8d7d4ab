#!/usr/bin/env python
"""Probe: decompose first-dispatch startup of the fused train step —
host tracing/lowering vs XLA compile (persistent-cache cold/warm) vs
first execution.  Explains what a warm compilation cache can and cannot
save on this runtime (docs/DESIGN.md entry 19).

Run twice: first invocation populates /tmp cache, second measures warm.
    python scripts/probe_startup_phases.py
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    from vfr_tpu.utils.compile_cache import enable_compile_cache

    cache = enable_compile_cache(
        os.environ.get("VFR_XLA_CACHE_DIR", "/tmp/vfr_xla_cache_probe2"))
    print(f"cache_dir={cache}", flush=True)

    import jax
    import numpy as np

    from vfr_tpu.config import get_preset
    from vfr_tpu.data.loaders import load_datasets
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import init_model_params
    from vfr_tpu.train.optim import make_optimizer
    from vfr_tpu.train.step import make_train_multi_step

    import dataclasses

    cfg = get_preset("didemo_fusion")
    nv = int(os.environ.get("PROBE_VIDEOS", 0))
    if nv:
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data,
            synthetic_num_videos=nv,
            synthetic_num_queries=int(os.environ.get("PROBE_QUERIES",
                                                     6 * nv)),
            synthetic_vocab_words=2000,
        ))
    t0 = time.perf_counter()
    bundle = load_datasets(cfg.data)
    ds = bundle.train
    model = build_model(cfg, dataset=ds)
    params = init_model_params(jax.random.PRNGKey(0), model, bundle.glove,
                               bundle.feature_dim)
    opt = make_optimizer(cfg.train, 100)
    opt_state = opt.init(params)
    banks = jax.device_put(ds.feature_banks())
    jax.block_until_ready(banks)
    print(f"setup_s={time.perf_counter() - t0:.1f}", flush=True)
    if os.environ.get("PROBE_DRAIN"):
        # force one tiny round-trip: on this relay block_until_ready does
        # not force execution, so all setup work (bank H2D, init
        # programs) is still QUEUED — the first real fetch pays for the
        # whole backlog.  Measure that drain separately from exec1.
        t0 = time.perf_counter()
        _ = float(jax.numpy.sum(banks["rgb"][0, 0, :4]))
        print(f"drain_s={time.perf_counter() - t0:.1f}", flush=True)

    K, B = int(os.environ.get("PROBE_K", 16)), cfg.train.batch_size
    fn = make_train_multi_step(model, cfg.train, opt, feature_banks=banks)
    bs = list(ds.train_batches(B, K, seed=0, with_features=False))
    chunk = {k: np.stack([b[k] for b in bs]) for k in bs[0]}

    # AOT split via the wrapper's introspection handle (train/step.py):
    # trace+lower happens on the host; compile goes through the remote
    # tunnel (or the persistent cache); exec1 includes arg transfer
    t0 = time.perf_counter()
    lowered = fn.jitted.lower(params, opt_state, None, chunk, None, fn.banks)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(params, opt_state, None, chunk, None, fn.banks)
    _ = float(out[3]["loss"])    # forces execution
    t_exec1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*out[:2], None, chunk, None, fn.banks)
    _ = float(out[3]["loss"])
    t_exec2 = time.perf_counter() - t0
    print(f"lower_s={t_lower:.1f} compile_s={t_compile:.1f} "
          f"exec1_s={t_exec1:.2f} exec2_s={t_exec2:.2f}", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Charades-STA quality-proof training run (BASELINE.json:9 config band).

The DiDeMo twin (scripts/quality_run.py) gates the flagship preset; this
run gates the sliding-window path: multi-scale window bank, per-video
validity masks, duration-normalized TEF, window-bank hard-negative mining.
Trains the charades_sta preset on a harder synthetic fixture (256 videos,
noise 0.25), then evaluates localization + corpus retrieval and writes:

    artifacts/quality_charades/metrics.jsonl
    artifacts/quality_charades/final_metrics.json

gated by tests/test_quality_artifact_charades.py.  Healthy bands: the
CTRL-era Charades-STA literature sits at R@1@0.5 ~= 0.24, R@1@0.7 ~= 0.09
on real data (BASELINE.md [LIT-PROXY]); window-bank chance on this fixture
is ~1/41 valid windows.

Run on the TPU (~4 min):  python scripts/quality_run_charades.py
"""

import dataclasses
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "artifacts", "quality_charades")


def main():
    from vfr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()   # warm-start compile reuse (docs/DESIGN.md 19)
    from vfr_tpu.config import get_preset
    from vfr_tpu.data.loaders import load_datasets
    from vfr_tpu.eval.corpus import corpus_evaluate
    from vfr_tpu.eval.moment_eval import evaluate
    from vfr_tpu.train.loop import train

    os.makedirs(OUT, exist_ok=True)
    # fresh training log: MetricsLogger appends, and a leftover file from a
    # previous run would contaminate any stats derived from it
    _mp = os.path.join(OUT, "metrics.jsonl")
    if os.path.exists(_mp):
        os.remove(_mp)
    base = get_preset("charades_sta")
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(
            base.data,
            data_dir=os.path.join(OUT, "no_real_data"),   # -> synthetic
            synthetic_num_videos=256,
            synthetic_num_queries=2048,
            synthetic_noise=0.25,
            # 2 disjoint planted spans per video: intra-video distractors.
            # With the default single span the GT is the video's only
            # signal and ranking saturates (R@1=1.0 measured even at
            # noise 0.6 — see data/synthetic.py)
            synthetic_moments_per_video=2,
        ),
        train=dataclasses.replace(
            base.train,
            num_epochs=20,
            batch_size=64,
            # same corpus-aware recipe the DiDeMo quality run validated
            # (docs/DESIGN.md entry 11): in-batch inter-video negatives
            # stall at a few x chance on full-corpus recall; index-based
            # mining against each query's nearest wrong-video windows is
            # what moves it
            lambda_inter=0.5,
            inter_negatives="all_spans",
            hard_negative_count=8,
            hard_negative_start_epoch=3,
            hard_negative_refresh_epochs=1,
            checkpoint_dir=os.path.join(OUT, "ck"),
            metrics_path=os.path.join(OUT, "metrics.jsonl"),
        ),
    )
    bundle = load_datasets(cfg.data)
    params, final_eval = train(cfg, bundle=bundle)

    from vfr_tpu.models.build import build_model
    model = build_model(cfg, dataset=bundle.train)

    threshold = evaluate(params, model, bundle.val, cfg.eval)
    corpus = corpus_evaluate(params, model, bundle.val, cfg.eval)

    out = {
        "preset": "charades_sta",
        "fixture": {
            "num_videos": cfg.data.synthetic_num_videos,
            "num_queries": cfg.data.synthetic_num_queries,
            "noise": cfg.data.synthetic_noise,
            "seed": cfg.data.synthetic_seed,
        },
        "epochs": cfg.train.num_epochs,
        "window_bank": {
            "scales": list(cfg.data.window_scales),
            "stride_ratio": cfg.data.window_stride_ratio,
            "max_windows": cfg.data.max_windows,
        },
        "eval_threshold": threshold,
        # Deliberate asymmetry vs the DiDeMo artifact (VERDICT r2 weak #7):
        # the official rank-aggregation protocol (mean of best-3 annotator
        # ranks) is DiDeMo-specific — Charades-STA has ONE GT interval per
        # query, so "threshold" IS its official protocol and there is no
        # separate eval_official block to compute.
        "eval_official": "N/A: didemo_official rank-aggregation protocol "
                         "is DiDeMo-specific (single-GT dataset)",
        "corpus": corpus,
    }
    path = os.path.join(OUT, "final_metrics.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps({k: out[k] for k in ("eval_threshold", "corpus")},
                     sort_keys=True))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

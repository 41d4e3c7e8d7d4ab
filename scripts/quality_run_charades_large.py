#!/usr/bin/env python
"""Charades-STA quality proof at spec corpus scale (round-3 follow-on to
VERDICT r2 #1, which scripts/quality_run_large.py closed for DiDeMo).

The committed Charades artifact (artifacts/quality_charades/) trains and
evaluates on 256 videos — 13,120 index rows.  The real Charades-STA test
corpus is ~1,334 videos; this run trains the charades_sta preset with the
validated mining recipe (count 8 / refresh 1, docs/DESIGN.md 11b/16) on a
2,000-video fixture — 1.5x the real test-corpus scale — and evaluates
corpus retrieval against the full ~128,000-row window-bank index, writing:

    artifacts/quality_charades_large/metrics.jsonl
    artifacts/quality_charades_large/final_metrics.json   gated by
        tests/test_quality_artifact_charades_large.py

Fixture/split design (mirrors scripts/quality_run_large.py where the
DiDeMo twin's reasoning carries over):

* two disjoint planted content spans per video (intra-video distractors;
  a single span saturates window ranking — data/synthetic.py).
* vocab scales with the query count (800 words / 16k queries * 8 words
  per query: each word seen ~160x, rich enough to compose).
* the val split takes ONE query per video, so the val-side moment index
  covers all 2,000 videos (CharadesSTADataset derives its video table
  from its annotations, same as DidemoDataset).
* chance floor for corpus video R@1 is 1/2,000 (vs ~1/256 at the small
  scale); the gate checks multiples of chance, not parity with the
  small fixture.

Run on the TPU (~5-10 min):  python scripts/quality_run_charades_large.py
"""

import argparse
import dataclasses
import json
import os
import sys
import time
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "artifacts", "quality_charades_large")

# Env overrides exist ONLY for plumbing smoke tests (tiny CPU run);
# the committed artifact must use the defaults.
NUM_VIDEOS = int(os.environ.get("QRCL_NUM_VIDEOS", 2_000))
NUM_QUERIES = int(os.environ.get("QRCL_NUM_QUERIES", 16_000))
VOCAB_WORDS = int(os.environ.get("QRCL_VOCAB_WORDS", 800))
NUM_EPOCHS = int(os.environ.get("QRCL_NUM_EPOCHS", 20))


def main():
    global NUM_VIDEOS
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=OUT,
                    help="sweep runs must not clobber the committed artifact")
    ap.add_argument("--num-videos", type=int, default=NUM_VIDEOS,
                    help="fixture corpus size (committed artifact: 2,000 = "
                         "1.5x the real Charades-STA test corpus)")
    ap.add_argument("--seed", type=int, default=-1,
                    help="fixture seed override (-1 = preset default); "
                         "seed twins measure jitter at an operating point")
    # objective knobs (mirror scripts/quality_run_large.py).  Committed-
    # artifact defaults = the DESIGN 27/28 recipe: infonce over COSINE
    # distance at tau 0.02 / lambda_inter 1.0 lifts corpus video R@1
    # 0.6045 (triplet) -> 0.697 (infonce sqeuclidean tau .05) ->
    # 0.91-0.92 on this fixture (committed artifact: 0.91), localization
    # better too (R@1@0.5 0.983 / R@1@0.7 0.798); --loss-type triplet
    # --distance sqeuclidean reproduces the r2-era margin recipe.
    ap.add_argument("--loss-type", default="infonce",
                    choices=("triplet", "infonce"))
    ap.add_argument("--temperature", type=float, default=0.02)
    ap.add_argument("--lambda-inter", type=float, default=1.0)
    ap.add_argument("--ema-decay", type=float, default=0.999,
                    help="Polyak-average the params; eval/serving use the "
                         "average (flagship recipe default, DESIGN 30; "
                         "0 = off)")
    ap.add_argument("--batch-size", type=int, default=64,
                    help="recipe probe: more in-batch InfoNCE negatives "
                         "(committed artifact: 64)")
    ap.add_argument("--query-pool", default="",
                    choices=("", "last", "mean", "attn"),
                    help="architecture probe: query sentence pooling")
    ap.add_argument("--distance", default="cosine",
                    choices=("", "sqeuclidean", "euclidean", "cosine"),
                    help="ModelConfig.distance override; the committed "
                         "artifact trains cosine ('' = preset default)")
    args = ap.parse_args()
    out_dir = args.out
    NUM_VIDEOS = args.num_videos

    from vfr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()   # warm-start compile reuse (docs/DESIGN.md 19)
    if os.environ.get("QRCL_FORCE_CPU"):
        # smoke-test path: the axon sitecustomize pins jax_platforms to
        # 'axon,cpu', so the env var alone does NOT keep us off the TPU
        # (and a second TPU process deadlocks the relay)
        import jax
        jax.config.update("jax_platforms", "cpu")
    from vfr_tpu.config import get_preset
    from vfr_tpu.data.charades import CharadesSTADataset
    from vfr_tpu.data.loaders import DataBundle
    from vfr_tpu.data.synthetic import make_charades_fixture
    from vfr_tpu.eval.corpus import corpus_evaluate
    from vfr_tpu.train.loop import train

    os.makedirs(out_dir, exist_ok=True)
    # fresh training log: MetricsLogger appends, and a leftover file from a
    # previous run would contaminate any stats derived from it
    _mp = os.path.join(out_dir, "metrics.jsonl")
    if os.path.exists(_mp):
        os.remove(_mp)
    base = get_preset("charades_flagship")
    if args.distance:
        base = dataclasses.replace(
            base, model=dataclasses.replace(base.model,
                                            distance=args.distance))
    if args.query_pool:
        base = dataclasses.replace(
            base, model=dataclasses.replace(base.model,
                                            query_pool=args.query_pool))
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(
            base.data,
            data_dir=os.path.join(out_dir, "no_real_data"),   # -> synthetic
            synthetic_num_videos=NUM_VIDEOS,
            synthetic_num_queries=NUM_QUERIES,
            synthetic_noise=0.25,
            synthetic_vocab_words=VOCAB_WORDS,
            synthetic_moments_per_video=2,
            **({"synthetic_seed": args.seed} if args.seed >= 0 else {}),
        ),
        train=dataclasses.replace(
            base.train,
            num_epochs=NUM_EPOCHS,
            batch_size=args.batch_size,
            # the corpus-aware recipe both committed quality artifacts
            # validated (docs/DESIGN.md entry 11/16)
            loss_type=args.loss_type,
            temperature=args.temperature,
            ema_decay=args.ema_decay,
            lambda_inter=args.lambda_inter,
            inter_negatives="all_spans",
            # ~2 fetches/epoch regardless of batch size
            steps_per_call=max(1, (NUM_QUERIES - NUM_VIDEOS)
                               // args.batch_size // 2),
            checkpoint_every_epochs=10,
            keep_checkpoints=1,
            checkpoint_dir=os.path.join(out_dir, "ck"),
            metrics_path=os.path.join(out_dir, "metrics.jsonl"),
        ),
        eval=dataclasses.replace(
            base.eval,
            eval_batch_size=512,
            corpus_query_batch=256,
        ),
    )

    t0 = time.perf_counter()
    fix = make_charades_fixture(
        num_videos=NUM_VIDEOS,
        num_queries=NUM_QUERIES,
        feature_dim=cfg.data.feature_dim,
        glove_dim=cfg.data.glove_dim,
        max_duration=cfg.data.max_duration,
        feature_seconds=cfg.data.feature_seconds,
        noise=cfg.data.synthetic_noise,
        with_flow=cfg.data.use_flow,
        vocab_words=VOCAB_WORDS,
        moments_per_video=2,
        seed=cfg.data.synthetic_seed,
    )
    # one val query per video -> the val index covers every corpus video
    by_video = defaultdict(list)
    for a in fix.annotations:
        by_video[a["video"]].append(a)
    train_anns, val_anns = [], []
    for v in sorted(by_video):
        val_anns.append(by_video[v][-1])
        train_anns.extend(by_video[v][:-1])
    flow = fix.flow if cfg.data.use_flow else None
    train_ds = CharadesSTADataset(train_anns, fix.rgb, flow, fix.vocab,
                                  cfg.data)
    val_ds = CharadesSTADataset(val_anns, fix.rgb, flow, fix.vocab, cfg.data)
    bundle = DataBundle(train_ds, val_ds, fix.vocab, fix.glove,
                        cfg.data.feature_dim, "synthetic")
    t_fixture = time.perf_counter() - t0
    print(f"[fixture] {NUM_VIDEOS} videos, train {train_ds.num_queries} / "
          f"val {val_ds.num_queries} queries, built in {t_fixture:.0f}s",
          file=sys.stderr, flush=True)

    # Banks uploaded ONCE and shared by the train loop AND the post-train
    # corpus eval (DESIGN 18/20).  Charades' train banks carry video_tef so
    # mined negatives re-embed with the right duration normalization.
    from vfr_tpu.data.features import banks_to_device

    train_bank_arrays = dict(train_ds.feature_banks())
    train_bank_arrays["video_tef"] = train_ds.video_tef
    val_bank_arrays = dict(val_ds.feature_banks())
    val_bank_arrays["video_tef"] = val_ds.video_tef
    device_banks = {
        "train": banks_to_device(train_bank_arrays, cfg.data.bank_dtype),
        "val": banks_to_device(val_bank_arrays, cfg.data.bank_dtype),
    }

    t0 = time.perf_counter()
    params, final_eval = train(cfg, bundle=bundle,
                               device_banks=device_banks)
    t_train = time.perf_counter() - t0

    from vfr_tpu.models.build import build_model
    model = build_model(cfg, dataset=bundle.train)

    t0 = time.perf_counter()
    corpus = corpus_evaluate(params, model, bundle.val, cfg.eval,
                             feature_banks=device_banks["val"])
    t_corpus = time.perf_counter() - t0

    # per-epoch mining refresh wall costs at this scale, from the log
    records = [json.loads(l) for l in open(cfg.train.metrics_path)]
    refreshes = [r for r in records if r["tag"] == "mine"]
    refresh_s = [r["refresh_s"] for r in refreshes]
    setup = next((r for r in records if r["tag"] == "setup"), {})

    from vfr_tpu.utils.io import tree_fingerprint

    out = {
        "preset": "charades_flagship",
        # pins the exact serving weights (EMA tree) without committing the
        # ~100 MB checkpoint binary (VERDICT r4 #7)
        "params_fingerprint": tree_fingerprint(params),
        "ema_decay": cfg.train.ema_decay,
        "loss": {"type": cfg.train.loss_type,
                 "temperature": cfg.train.temperature,
                 "lambda_intra": cfg.train.lambda_intra,
                 "lambda_inter": cfg.train.lambda_inter},
        "model": {"distance": cfg.model.distance,
                  "joint_dim": cfg.model.joint_dim,
                  "query_pool": cfg.model.query_pool},
        "fixture": {
            "num_videos": NUM_VIDEOS,
            "num_queries_train": train_ds.num_queries,
            "num_queries_val": val_ds.num_queries,
            "noise": cfg.data.synthetic_noise,
            "vocab_words": VOCAB_WORDS,
            "moments_per_video": 2,
            "seed": cfg.data.synthetic_seed,
        },
        "epochs": cfg.train.num_epochs,
        "batch_size": cfg.train.batch_size,
        "window_bank": {
            "scales": list(cfg.data.window_scales),
            "stride_ratio": cfg.data.window_stride_ratio,
            "max_windows": cfg.data.max_windows,
        },
        "mining": {
            "count": cfg.train.hard_negative_count,
            "refresh_epochs": cfg.train.hard_negative_refresh_epochs,
            "num_refreshes": len(refresh_s),
            "refresh_wall_s_first": refresh_s[0] if refresh_s else None,
            "refresh_wall_s_median_steady": (
                sorted(refresh_s[1:])[len(refresh_s[1:]) // 2]
                if len(refresh_s) > 1 else None
            ),
        },
        "wall_s": {"fixture": round(t_fixture, 1),
                   "train_total": round(t_train, 1),
                   "corpus_eval": round(t_corpus, 1),
                   "loop_init": setup.get("init_s"),
                   "bank_upload": setup.get("bank_upload_s"),
                   "bank_mb": setup.get("bank_mb")},
        # why 2k is "spec scale" here while the DiDeMo twin uses 10k
        # (VERDICT r3 weak #6): the scale axis is INDEX ROWS, not videos
        "scale_note": (
            f"{NUM_VIDEOS} videos = 1.5x the real Charades-STA test corpus "
            f"(~1,334 videos); the {cfg.data.max_windows}-window bank makes "
            f"{NUM_VIDEOS * cfg.data.max_windows} index rows ~= 61% of the "
            "10k-video DiDeMo index (210k rows)"),
        "chance_video_R@1": 1.0 / NUM_VIDEOS,
        "eval_threshold": final_eval,
        # Same deliberate asymmetry as the small Charades artifact
        # (VERDICT r2 weak #7): the official rank-aggregation protocol
        # (mean of best-3 annotator ranks) is DiDeMo-specific —
        # Charades-STA has ONE GT interval per query, so "threshold" IS
        # its official protocol.
        "eval_official": "N/A: didemo_official rank-aggregation protocol "
                         "is DiDeMo-specific (single-GT dataset)",
        "corpus": corpus,
    }
    path = os.path.join(out_dir, "final_metrics.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("eval_threshold", "corpus", "mining")},
                     sort_keys=True))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Quality proof at the SPEC's corpus scale (VERDICT r2 next-round #1).

The r2 quality artifacts train/evaluate on a 256-video fixture (2,898
index rows — 1.4% of the 10k-video corpus BASELINE.json:10-11 names).
This run trains the flagship didemo_fusion recipe (mining count 8 /
refresh 1, docs/DESIGN.md entry 11b) on a 10,000-video fixture and
evaluates corpus retrieval against the full 210,000-row moment index,
writing:

    artifacts/quality_large/metrics.jsonl      training log incl. per-epoch
                                               mining refresh wall cost
    artifacts/quality_large/final_metrics.json gated by
                                               tests/test_quality_artifact_large.py

Fixture/split design (differs from scripts/quality_run.py where it must):

* vocab scales with the query count (2,000 words / ~66k queries — the 256-
  video fixture's 200-word vocab was right for 2,048 queries, DESIGN 11;
  at 66k queries each word is seen ~260x, rich enough to compose).
* the val split takes ONE query per video (not the last 20% of the
  annotation list): DidemoDataset derives its video table from its
  annotations, so this is what makes the val-side moment index cover all
  10,000 videos.  Val queries are distinct word samples from the same
  moment pools — same generalization axis as the 256-video artifact.
* chance floor for corpus video R@1 is 1/10,000 = 1e-4 (vs 1/256 at r2
  scale); the gate checks >> chance, not parity with the small fixture.

Run on the TPU (~10-15 min):  python scripts/quality_run_large.py

Flags: --bank-dtype {float32,bfloat16} stores the device feature banks
quantized (halved upload/HBM, DESIGN 20); --out redirects the artifact
directory (validation runs must not clobber the committed artifact).
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

NUM_VIDEOS = 10_000
NUM_QUERIES = 66_000          # ~2.2 queries per planted moment (~30k moments)
VOCAB_WORDS = 2_000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bank-dtype", default="float32",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--out", default=os.path.join(ROOT, "artifacts",
                                                  "quality_large"))
    # sweep knobs (validation runs only — the committed artifact uses the
    # defaults, which are READ FROM the didemo_flagship preset so preset
    # and artifact can never drift apart; asserted by
    # tests/test_flagship_preset.py)
    from vfr_tpu.config import get_preset as _gp

    _fs = _gp("didemo_flagship")
    ap.add_argument("--hard-negative-count", type=int,
                    default=_fs.train.hard_negative_count)
    ap.add_argument("--epochs", type=int, default=_fs.train.num_epochs)
    ap.add_argument("--num-videos", type=int, default=NUM_VIDEOS)
    ap.add_argument("--num-queries", type=int, default=0,
                    help="0 = scale with videos at the default 6.6 q/video")
    ap.add_argument("--vocab-words", type=int, default=VOCAB_WORDS)
    # committed-artifact defaults = the DESIGN 27/28 recipe: infonce over
    # COSINE distance at tau 0.02, lambda_inter 1.0 — 3.7x the triplet
    # recipe's corpus video R@1 at 10k videos (0.0312 -> 0.114) and the
    # best localization of any recipe measured (R@1@0.5 0.868).  tau is
    # metric- AND scale-dependent: sqeuclidean wants 0.05 here, cosine
    # 0.02 with a stall cliff at 0.015 (DESIGN 28).  --loss-type triplet
    # + --distance sqeuclidean reproduces the r2-era margin recipe.
    ap.add_argument("--loss-type", default=_fs.train.loss_type,
                    choices=("triplet", "infonce"))
    ap.add_argument("--temperature", type=float,
                    default=_fs.train.temperature)
    ap.add_argument("--lambda-inter", type=float,
                    default=_fs.train.lambda_inter)
    ap.add_argument("--learn-temperature", action="store_true",
                    help="probe: train tau as a parameter (DESIGN 29)")
    ap.add_argument("--temperature-final", type=float, default=0.0,
                    help="probe: cosine-anneal tau to this value "
                         "(0 = constant)")
    ap.add_argument("--ema-decay", type=float, default=_fs.train.ema_decay,
                    help="Polyak-average the params; eval/serving use the "
                         "average (committed recipe: 0.999 — +22% corpus "
                         "video R@1 at zero step cost, DESIGN 30; 0 = off)")
    ap.add_argument("--joint-dim", type=int, default=0,
                    help="capacity probe: override ModelConfig.joint_dim "
                         "(0 = preset default; committed artifact uses it)")
    ap.add_argument("--batch-size", type=int,
                    default=_fs.train.batch_size,
                    help="in-batch InfoNCE negative population per step "
                         "(committed artifact: the flagship preset's 128 "
                         "— the axis that moved recall +47%% alone, "
                         "DESIGN 33)")
    ap.add_argument("--lr-schedule", default="constant",
                    choices=("constant", "cosine", "step"),
                    help="recipe probe: optax schedule (committed: constant)")
    ap.add_argument("--lambda-intra", type=float, default=1.0)
    ap.add_argument("--lambda-inter-rev", type=float, default=0.0,
                    help="objective probe: weight of the symmetric "
                         "(moment->query) InfoNCE direction (0 = off)")
    ap.add_argument("--query-dropout", type=float, default=0.0,
                    help="architecture probe: dropout on the query tower")
    ap.add_argument("--pooling", default="",
                    choices=("", "mean", "max"),
                    help="architecture probe: segment pooling variant")
    ap.add_argument("--per-stream-query-proj", action="store_true",
                    help="architecture probe: separate query FC per stream")
    ap.add_argument("--query-pool", default="",
                    choices=("", "last", "mean", "attn"),
                    help="architecture probe: query sentence pooling")
    ap.add_argument("--lstm-layers", type=int, default=0,
                    help="architecture probe: stacked LSTM depth (0 = "
                         "preset default)")
    ap.add_argument("--seed", type=int, default=-1,
                    help="fixture/init seed override (-1 = preset default; "
                         "sweep twins use this to size run-to-run jitter)")
    ap.add_argument("--distance", default=_fs.model.distance,
                    choices=("", "sqeuclidean", "euclidean", "cosine"),
                    help="ModelConfig.distance override; the committed "
                         "artifact trains cosine ('' = preset default)")
    ap.add_argument("--noise", type=float, default=0.25,
                    help="fixture feature-noise sweep knob (VERDICT r4 #1: "
                         "locate the noise-imposed recall asymptote; the "
                         "committed artifact uses 0.25)")
    args = ap.parse_args()
    OUT = args.out
    num_videos = args.num_videos
    num_queries = args.num_queries or round(num_videos * NUM_QUERIES
                                            / NUM_VIDEOS)
    vocab_words = args.vocab_words
    from vfr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()   # warm-start compile reuse (docs/DESIGN.md 19)
    from vfr_tpu.config import get_preset
    from vfr_tpu.data.didemo import DidemoDataset
    from vfr_tpu.data.loaders import DataBundle
    from vfr_tpu.data.synthetic import make_didemo_fixture
    from vfr_tpu.eval.corpus import corpus_evaluate
    from vfr_tpu.eval.moment_eval import evaluate
    from vfr_tpu.train.loop import train

    os.makedirs(OUT, exist_ok=True)
    # fresh training log: MetricsLogger appends, and a leftover file from a
    # previous run would contaminate any stats derived from it
    _mp = os.path.join(OUT, "metrics.jsonl")
    if os.path.exists(_mp):
        os.remove(_mp)
    base = get_preset("didemo_flagship")
    if args.joint_dim:
        base = dataclasses.replace(
            base, model=dataclasses.replace(base.model,
                                            joint_dim=args.joint_dim))
    if args.distance:
        base = dataclasses.replace(
            base, model=dataclasses.replace(base.model,
                                            distance=args.distance))
    mkw = {}
    if args.query_dropout > 0:
        mkw["query_dropout"] = args.query_dropout
    if args.pooling:
        mkw["pooling"] = args.pooling
    if args.per_stream_query_proj:
        mkw["per_stream_query_proj"] = True
    if args.query_pool:
        mkw["query_pool"] = args.query_pool
    if args.lstm_layers:
        mkw["lstm_layers"] = args.lstm_layers
    if mkw:
        base = dataclasses.replace(
            base, model=dataclasses.replace(base.model, **mkw))
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(
            base.data,
            data_dir=os.path.join(OUT, "no_real_data"),   # -> synthetic
            synthetic_num_videos=num_videos,
            synthetic_num_queries=num_queries,
            synthetic_noise=args.noise,
            synthetic_vocab_words=vocab_words,
            bank_dtype=args.bank_dtype,
            **({"synthetic_seed": args.seed} if args.seed >= 0 else {}),
        ),
        train=dataclasses.replace(
            base.train,
            num_epochs=args.epochs,
            batch_size=args.batch_size,
            lr_schedule=args.lr_schedule,
            lambda_intra=args.lambda_intra,
            lambda_inter=args.lambda_inter,
            lambda_inter_rev=args.lambda_inter_rev,
            inter_negatives="all_spans",
            loss_type=args.loss_type,
            temperature=args.temperature,
            learn_temperature=args.learn_temperature,
            temperature_final=args.temperature_final,
            ema_decay=args.ema_decay,
            hard_negative_count=args.hard_negative_count,
            # jitter twins move BOTH the fixture and the init/shuffle seed:
            # the conservative (largest) run-to-run noise estimate
            **({"seed": base.train.seed + args.seed + 1}
               if args.seed >= 0 else {}),
            # start/refresh cadence inherited from the flagship preset
            # (start_epoch 3, refresh 1)
            # ONE fused dispatch + metrics fetch per 875-step epoch: at
            # 125 steps/call the per-chunk ~0.2 s dispatch+fetch overhead
            # was ~75% of the logged train wall (DESIGN 18)
            steps_per_call=0,   # 0 = derived below once the split is known
            # per-epoch eval was 121 s of the 424 s r2-era run (5.5 s x
            # 20 epochs at 10k val queries); every 4th epoch still logs a
            # useful learning curve and the LAST epoch always evaluates
            eval_every_epochs=4,
            checkpoint_every_epochs=10,
            keep_checkpoints=1,
            checkpoint_dir=os.path.join(OUT, "ck"),
            metrics_path=os.path.join(OUT, "metrics.jsonl"),
        ),
        eval=dataclasses.replace(
            base.eval,
            eval_batch_size=512,
            corpus_query_batch=256,
        ),
    )

    t0 = time.perf_counter()
    fix = make_didemo_fixture(
        num_videos=num_videos,
        num_queries=num_queries,
        feature_dim=cfg.data.feature_dim,
        glove_dim=cfg.data.glove_dim,
        noise=cfg.data.synthetic_noise,
        with_flow=True,
        vocab_words=vocab_words,
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
    train_ds = DidemoDataset(train_anns, fix.rgb, fix.flow, fix.vocab,
                             cfg.data)
    val_ds = DidemoDataset(val_anns, fix.rgb, fix.flow, fix.vocab, cfg.data)
    bundle = DataBundle(train_ds, val_ds, fix.vocab, fix.glove,
                        cfg.data.feature_dim, "synthetic")
    # ONE fused dispatch + metrics fetch per epoch: at spec scale the
    # per-chunk ~0.2 s dispatch+fetch overhead was ~75% of logged train
    # wall at the default chunking (DESIGN 18)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train,
        steps_per_call=max(1, train_ds.num_queries // cfg.train.batch_size),
    ))
    t_fixture = time.perf_counter() - t0
    print(f"[fixture] {num_videos} videos, train {train_ds.num_queries} / "
          f"val {val_ds.num_queries} queries, built in {t_fixture:.0f}s",
          file=sys.stderr, flush=True)

    # Banks uploaded ONCE (at cfg.data.bank_dtype) and shared by the train
    # loop AND the post-train evals — corpus_evaluate's PASS 1 used to
    # re-ship the val corpus' features through the host (DESIGN 18/20).
    from vfr_tpu.data.features import banks_to_device

    device_banks = {
        "train": banks_to_device(dict(train_ds.feature_banks()),
                                 cfg.data.bank_dtype),
        "val": banks_to_device(dict(val_ds.feature_banks()),
                               cfg.data.bank_dtype),
    }

    t0 = time.perf_counter()
    params, final_eval = train(cfg, bundle=bundle,
                               device_banks=device_banks)
    t_train = time.perf_counter() - t0

    from vfr_tpu.models.build import build_model
    model = build_model(cfg, dataset=bundle.train)

    official = evaluate(
        params, model, bundle.val,
        dataclasses.replace(cfg.eval, protocol="didemo_official"),
        feature_banks=device_banks["val"],
    )
    t0 = time.perf_counter()
    corpus = corpus_evaluate(params, model, bundle.val, cfg.eval,
                             feature_banks=device_banks["val"])
    t_corpus = time.perf_counter() - t0

    # mining refresh wall costs (VERDICT r2 #1: 'what a refresh costs at
    # 10k videos is unmeasured') straight from the training log
    records = [json.loads(l) for l in open(cfg.train.metrics_path)]
    refreshes = [r for r in records if r["tag"] == "mine"]
    refresh_s = [r["refresh_s"] for r in refreshes]
    setup = next((r for r in records if r["tag"] == "setup"), {})

    from vfr_tpu.utils.io import tree_fingerprint

    out = {
        "preset": "didemo_flagship",
        # pins the exact serving weights (EMA tree) without committing the
        # ~100 MB checkpoint binary (VERDICT r4 #7): the recipe is
        # deterministic, so a regenerated ck/ can be verified against this
        "params_fingerprint": tree_fingerprint(params),
        "bank_dtype": cfg.data.bank_dtype,
        "ema_decay": cfg.train.ema_decay,
        "loss": {"type": cfg.train.loss_type,
                 "temperature": cfg.train.temperature,
                 "learn_temperature": cfg.train.learn_temperature,
                 "temperature_final": cfg.train.temperature_final,
                 "lambda_intra": cfg.train.lambda_intra,
                 "lambda_inter": cfg.train.lambda_inter,
                 "lambda_inter_rev": cfg.train.lambda_inter_rev},
        "model": {"distance": cfg.model.distance,
                  "joint_dim": cfg.model.joint_dim,
                  "query_pool": cfg.model.query_pool},
        "fixture": {
            "num_videos": num_videos,
            "num_queries_train": train_ds.num_queries,
            "num_queries_val": val_ds.num_queries,
            "noise": cfg.data.synthetic_noise,
            "vocab_words": vocab_words,
            "seed": cfg.data.synthetic_seed,
        },
        "epochs": cfg.train.num_epochs,
        "batch_size": cfg.train.batch_size,
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
                   # loop-setup anatomy (train/loop.py "setup" record):
                   # host init + bank H2D, excluded from first step_ms
                   "loop_init": setup.get("init_s"),
                   "bank_upload": setup.get("bank_upload_s"),
                   "bank_mb": setup.get("bank_mb")},
        "chance_video_R@1": 1.0 / num_videos,
        "eval_threshold": final_eval,
        "eval_official": official,
        "corpus": corpus,
    }
    path = os.path.join(OUT, "final_metrics.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("eval_threshold", "corpus", "mining")},
                     sort_keys=True))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

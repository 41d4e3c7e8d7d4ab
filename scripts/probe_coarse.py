#!/usr/bin/env python
"""Probe: coarse-to-fine two-stage retrieval (eval/coarse.py) — speed at
100k-video scale and stage-1 recall on TRAINED embeddings.

Two parts (run both on the TPU; ~15 min total):

* ``--part speed``: per-batch device time of the full-scan one-matmul
  retriever vs the two-stage retriever at 2.1M index rows (100k videos),
  Q=128 — the regime the coarse path exists for (full scan streams
  ~1.07 GB/batch at the HBM roofline; stage 1 streams ~143 MB at d_c=32
  and stage 2 gathers C full rows/query).  Speed is data-independent, so
  the rows are synthetic; the elision-proof in-program harness is the
  same one bench.py uses.

* ``--part recall``: stage-1 recall must be measured on embeddings with a
  REAL spectrum, so this trains the flagship didemo_fusion recipe on the
  10k-video fixture (8 epochs — enough for the embedding geometry), builds
  the 210k-row index, and reports recall@{1,10,100} of the two-stage
  retriever vs the exact retriever over 512 val queries, for a small
  (d_coarse x num_candidates) grid, plus the PCA spectrum energy.

Results land in docs/DESIGN.md (coarse entry) + artifacts/coarse_scale.json.
"""

import argparse
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

P, d, S = 21, 128, 2
Q, K = 128, 100
FEAT, VOCAB = 2048, 4096


def part_speed(out, d_coarse=32):
    from vfr_tpu.config import get_preset
    from vfr_tpu.eval.coarse import _coarse_fn, build_coarse_index
    from vfr_tpu.eval.corpus import (
        MomentIndex,
        _score_topk_with_operands,
    )
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import init_model_params
    from vfr_tpu.utils.timing import device_seconds_per_iter

    cfg = get_preset("serving_10k")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, FEAT)

    on_tpu = jax.default_backend() == "tpu"
    V = 100_000 if on_tpu else 200
    N = V * P
    # bf16 rows in blocks to bound host memory
    blocks = []
    for s0 in range(0, N, 500_000):
        n = min(500_000, N - s0)
        blocks.append(jnp.asarray(
            rng.standard_normal((S, n, d)).astype(np.float32), jnp.bfloat16))
    m16 = jnp.concatenate(blocks, axis=1)
    del blocks
    m_sq = jnp.sum(m16.astype(jnp.float32) ** 2, axis=-1)
    index = MomentIndex(
        m=m16, m_sq=m_sq,
        video_row=np.repeat(np.arange(V, dtype=np.int32), P),
        prop_idx=np.tile(np.arange(P, dtype=np.int32), V),
        spans_sec=np.tile(
            np.stack([np.arange(P), np.arange(P) + 1], 1).astype(np.float32),
            (V, 1)),
        weights=np.asarray(cfg.model.stream_weights, np.float32),
    )

    t0 = time.perf_counter()
    coarse = build_coarse_index(index, d_coarse=d_coarse)
    jax.block_until_ready(coarse.m_low)
    build_s = time.perf_counter() - t0

    # index operands ride as TIMING-HARNESS arguments, never closure
    # constants: a closed-over 1.07 GB operand serializes into the compile
    # request and exceeds the relay's payload limit (HTTP 413, DESIGN 12c)
    full_fn, m_cat, msq_fused = _score_topk_with_operands(
        model, index, K, "approx", cfg.eval.approx_recall, None, "bfloat16")
    index.m, index.m_sq = None, None
    del m16, m_sq

    tokens = jnp.asarray(
        rng.integers(1, VOCAB, size=(Q, cfg.data.max_query_len)), jnp.int32)
    lengths = jnp.asarray(
        rng.integers(4, cfg.data.max_query_len + 1, Q), jnp.int32)

    def full_body(i, toks, m_cat, msq_fused):
        t = 1 + (toks + i.astype(jnp.int32)) % (VOCAB - 1)
        dists, rows = full_fn(m_cat, msq_fused, params, t, lengths)
        return dists

    res = {"index_rows": N, "coarse_build_s": round(build_s, 2),
           "d_coarse": d_coarse}
    sec_full = device_seconds_per_iter(full_body, tokens,
                                       operands=(m_cat, msq_fused))
    res["full_scan"] = {"batch_ms": round(1e3 * sec_full, 3),
                        "per_query_rate": round(N / sec_full, 1)}
    del m_cat, msq_fused
    ops = (coarse.proj, coarse.m_low, coarse.msq_low,
           coarse.m_blk, coarse.msq_blk,
           coarse.c_low, coarse.csq, coarse.perm)
    for mode in ("blockmax", "centroid"):
        for C in (1024, 2048, 4096):
            fn = _coarse_fn(model, K, C, cfg.eval.approx_recall, None,
                            block_rows=coarse.block_rows, mode=mode)

            def coarse_body(i, toks, *ops):
                t = 1 + (toks + i.astype(jnp.int32)) % (VOCAB - 1)
                dists, rows = fn(*ops, params, t, lengths)
                return dists

            sec = device_seconds_per_iter(coarse_body, tokens, operands=ops)
            res[f"{mode}_C{C}"] = {
                "batch_ms": round(1e3 * sec, 3),
                "per_query_rate": round(N / sec, 1),
                "speedup_vs_full": round(sec_full / sec, 2),
            }
            print(f"{mode} C={C}: {res[f'{mode}_C{C}']}",
                  file=sys.stderr, flush=True)
    out[f"speed_2p1M_rows_d{d_coarse}"] = res


def part_recall(out, epochs, loss_type="triplet", temperature=0.02,
                lambda_inter=0.5, distance=""):
    import dataclasses
    from collections import defaultdict

    from vfr_tpu.config import get_preset
    from vfr_tpu.data.didemo import DidemoDataset
    from vfr_tpu.data.features import banks_to_device
    from vfr_tpu.data.loaders import DataBundle
    from vfr_tpu.data.synthetic import make_didemo_fixture
    from vfr_tpu.eval.coarse import build_coarse_index, make_coarse_retriever
    from vfr_tpu.eval.corpus import build_moment_index, make_retriever
    from vfr_tpu.models.build import build_model
    from vfr_tpu.train.loop import train

    on_tpu = jax.default_backend() == "tpu"
    NUM_VIDEOS = 10_000 if on_tpu else 128
    NUM_QUERIES = 66_000 if on_tpu else 512

    base = get_preset("didemo_fusion")
    if distance:
        base = dataclasses.replace(
            base, model=dataclasses.replace(base.model, distance=distance))
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(
            base.data, data_dir="/nonexistent-synthetic",
            synthetic_num_videos=NUM_VIDEOS,
            synthetic_num_queries=NUM_QUERIES,
            synthetic_noise=0.25, synthetic_vocab_words=2_000),
        train=dataclasses.replace(
            base.train, num_epochs=epochs, batch_size=64,
            loss_type=loss_type, temperature=temperature,
            lambda_inter=lambda_inter, inter_negatives="all_spans",
            hard_negative_count=8, hard_negative_start_epoch=3,
            hard_negative_refresh_epochs=1,
            steps_per_call=875 if on_tpu else 0,
            eval_every_epochs=100,    # embeddings only; skip mid evals
            checkpoint_every_epochs=1000,   # never mid-run (loop still
                                            # checkpoints the last epoch)
            checkpoint_dir="/tmp/probe_coarse_ck",
            metrics_path="/tmp/probe_coarse_metrics.jsonl"),
        eval=dataclasses.replace(base.eval, eval_batch_size=512,
                                 corpus_query_batch=256),
    )
    fix = make_didemo_fixture(
        num_videos=NUM_VIDEOS, num_queries=NUM_QUERIES,
        feature_dim=cfg.data.feature_dim, glove_dim=cfg.data.glove_dim,
        noise=cfg.data.synthetic_noise, with_flow=True,
        vocab_words=2_000, seed=cfg.data.synthetic_seed)
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
    device_banks = {
        "train": banks_to_device(dict(train_ds.feature_banks()), "bfloat16"),
        "val": banks_to_device(dict(val_ds.feature_banks()), "bfloat16"),
    }
    t0 = time.perf_counter()
    params, _ = train(cfg, bundle=bundle, device_banks=device_banks)
    print(f"[train] {time.perf_counter()-t0:.0f}s", file=sys.stderr,
          flush=True)

    model = build_model(cfg, dataset=bundle.train)
    index = build_moment_index(params, model, val_ds,
                               with_fingerprint=False,
                               feature_banks=device_banks["val"])

    # exact reference: top-100 rows for 512 val queries
    nq = 512 if on_tpu else 64
    batch = next(val_ds.eval_batches(nq))
    toks = jnp.asarray(batch["tokens"])
    lens = jnp.asarray(batch["lengths"])
    exact = make_retriever(model, index, K, topk_method="exact")
    _, rows_e = exact(params, toks, lens)
    rows_e = np.asarray(rows_e)

    res = {"index_rows": index.num_rows, "num_queries": int(nq),
           "epochs": epochs, "grid": {}}
    for d_c in (16, 32, 64):
        coarse = build_coarse_index(index, d_coarse=d_c)
        # spectrum energy captured by the top-d_c PCA directions (computed
        # from the projected rows vs full rows — exact, no re-eigh)
        mt_sq = float(np.asarray(
            jnp.sum(coarse.m_blk.astype(jnp.float32) ** 2)))
        low_sq = float(np.asarray(
            jnp.sum(coarse.m_low.astype(jnp.float32) ** 2)))
        # NOTE m_cat is unweighted concat; with equal stream weights the
        # energy ratio is exact up to the sqrt(w) scale, which cancels
        energy = low_sq / (0.5 * mt_sq) if mt_sq else 0.0
        for mode in ("blockmax", "centroid"):
            for C in (512, 1024, 2048):
                two = make_coarse_retriever(model, coarse, K,
                                            num_candidates=C, mode=mode)
                _, rows_c = two(params, toks, lens)
                rows_c = np.asarray(rows_c)
                rec = {}
                for kk in (1, 10, 100):
                    hit = [len(set(rows_c[i, :kk])
                               & set(rows_e[i, :kk])) / kk
                           for i in range(rows_e.shape[0])]
                    rec[f"recall@{kk}"] = round(float(np.mean(hit)), 4)
                res["grid"][f"{mode}_d{d_c}_C{C}"] = rec
                print(f"{mode} d_c={d_c} C={C}: {rec}", file=sys.stderr,
                      flush=True)
        res["grid"][f"d{d_c}_energy"] = round(energy, 4)
    res["loss"] = {"type": loss_type, "temperature": temperature,
                   "lambda_inter": lambda_inter, "distance": distance}
    key = ("recall_trained_210k_rows" if loss_type == "triplet"
           else f"recall_trained_210k_rows_{loss_type}"
                + (f"_{distance}" if distance else ""))
    out[key] = res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="both",
                    choices=("speed", "recall", "both"))
    ap.add_argument("--d-coarse", type=int, default=32,
                    help="prefilter rank for the speed part")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--loss-type", default="triplet",
                    choices=("triplet", "infonce"),
                    help="recall part: objective the probe model trains "
                         "with (DESIGN 27 re-probes coarse recall under "
                         "infonce-shaped embeddings)")
    ap.add_argument("--temperature", type=float, default=0.02)
    ap.add_argument("--lambda-inter", type=float, default=0.5)
    ap.add_argument("--distance", default="",
                    choices=("", "sqeuclidean", "euclidean", "cosine"),
                    help="recall part: ModelConfig.distance override")
    ap.add_argument("--out", default=os.path.join(ROOT, "artifacts",
                                                  "coarse_scale.json"))
    args = ap.parse_args()
    # merge-with-existing + dump-after-each-part: a crash in the (cheap)
    # speed part must not lose the (10-min-training) recall results
    out = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    out["backend"] = jax.default_backend()

    def dump():
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    if args.part in ("recall", "both"):
        part_recall(out, args.epochs, loss_type=args.loss_type,
                    temperature=args.temperature,
                    lambda_inter=args.lambda_inter,
                    distance=args.distance)
        dump()
    if args.part in ("speed", "both"):
        part_speed(out, d_coarse=args.d_coarse)
        dump()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Matched-filter ORACLE ceiling for the synthetic DiDeMo fixture.

Question this answers (round 3): the spec-scale quality artifact reports
corpus video R@1 = 0.0312 at 10k videos (312x chance).  Is that number
limited by the TRAINING RECIPE, or by the FIXTURE itself (feature noise +
pool-mean crowding)?  The oracle scores every (query, proposal) pair with
the generative model's own projections:

    score(q, m) = sum_s cos( mean_glove(q) @ A_s ,  pooled_feats_s[m] )

The oracle is a STRONG-BASELINE bound, not an information bound: it is
pair-optimal under isotropic noise but cannot adapt to corpus-scale
crowding (which moments are confusable), so a discriminatively trained
tower can exceed it — and does: the mean-pool flagship recipe measured
0.478 video R@1 vs the oracle's 0.455 (DESIGN 35).  Read a large
oracle-vs-trained gap as recipe headroom; read trained >= oracle as the
recipe having learned crowding structure the generative projections
don't carry.

Run:  python scripts/probe_fixture_ceiling.py --num-videos 10000
Writes artifacts/fixture_ceiling.json when --out is given.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-videos", type=int, default=10_000)
    ap.add_argument("--num-queries", type=int, default=66_000)
    ap.add_argument("--eval-queries", type=int, default=10_000,
                    help="oracle-scored query sample (tail of the fixture)")
    ap.add_argument("--noise", type=float, default=0.25)
    ap.add_argument("--vocab-words", type=int, default=2_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from vfr_tpu.data.synthetic import make_didemo_fixture
    from vfr_tpu.ops.proposals import didemo_proposals, pooling_matrix

    t0 = time.time()
    fix = make_didemo_fixture(
        num_videos=args.num_videos,
        num_queries=args.num_queries,
        feature_dim=2048,
        glove_dim=300,
        noise=args.noise,
        with_flow=True,
        vocab_words=args.vocab_words,
        seed=args.seed,
    )
    print(f"fixture built in {time.time()-t0:.1f}s", flush=True)

    spans = didemo_proposals(6)                        # [21, 2]
    P = spans.shape[0]
    pool = pooling_matrix(spans, 6).astype(np.float32)  # [21, 6]
    vids = sorted(fix.rgb.ids())
    vid_row = {v: i for i, v in enumerate(vids)}
    V = len(vids)

    # ---- pooled proposal index per stream, normalized rows (cosine
    # oracle).  ALL ON HOST: the whole oracle is ~9 TFLOP of f32 GEMM,
    # which OpenBLAS finishes in minutes, while shipping a 4 GB index
    # through the ~10 MB/s axon relay (DESIGN 18) took >30 min — a probe
    # is not a serving path, so the chip buys nothing here.
    def build_index(store):
        feats = np.stack([store[v] for v in vids])     # [V, 6, D]
        pooled = np.einsum("pc,vcd->vpd", pool, feats)
        pooled = pooled.reshape(V * P, -1)
        n = np.linalg.norm(pooled, axis=1, keepdims=True)
        return np.ascontiguousarray((pooled / np.maximum(n, 1e-12)).T)

    idx = {
        "rgb": build_index(fix.rgb),
        "flow": build_index(fix.flow),
    }
    proj = fix.meta["oracle_projections"]
    print(f"index built in {time.time()-t0:.1f}s", flush=True)

    # ---- oracle query vectors: mean GloVe of the query words @ A_s
    anns = fix.annotations[-args.eval_queries:]
    stoi = fix.vocab.stoi
    qg = np.stack([
        fix.glove[[stoi[w] for w in a["description"].split()]].mean(axis=0)
        for a in anns
    ]).astype(np.float32)                                     # [Q, glove]
    qvec = {}
    for s in ("rgb", "flow"):
        v = qg @ proj[s]
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        qvec[s] = v
    gt_video = np.array([vid_row[a["video"]] for a in anns])
    gt_span = np.array([a["times"][0] for a in anns])         # [Q, 2]

    def score_chunk(q_rgb, q_flow):
        s = q_rgb @ idx["rgb"] + q_flow @ idx["flow"]         # [c, V*P]
        part = np.argpartition(-s, 5, axis=1)[:, :5]
        order = np.argsort(np.take_along_axis(-s, part, axis=1), axis=1)
        return np.take_along_axis(part, order, axis=1)

    Q = len(anns)
    top_rows = np.zeros((Q, 5), np.int64)
    for lo in range(0, Q, args.chunk):
        hi = min(lo + args.chunk, Q)
        top_rows[lo:hi] = score_chunk(qvec["rgb"][lo:hi], qvec["flow"][lo:hi])
        if lo % (args.chunk * 8) == 0:
            print(f"  scored {hi}/{Q} in {time.time()-t0:.0f}s", flush=True)
    print(f"scored {Q} queries in {time.time()-t0:.1f}s", flush=True)

    top_video = top_rows // P
    top_span = spans[top_rows % P]                            # [Q, 5, 2]

    def tiou(a, b):  # inclusive clip spans
        inter = np.maximum(
            0, np.minimum(a[..., 1], b[..., 1])
            - np.maximum(a[..., 0], b[..., 0]) + 1)
        union = (a[..., 1] - a[..., 0] + 1) + (b[..., 1] - b[..., 0] + 1) - inter
        return inter / union

    vr1 = float(np.mean(top_video[:, 0] == gt_video))
    vr5 = float(np.mean(np.any(top_video == gt_video[:, None], axis=1)))
    ti = tiou(top_span, gt_span[:, None, :])                  # [Q, 5]
    hit = top_video == gt_video[:, None]
    out = {
        "num_videos": args.num_videos,
        "num_index_rows": V * P,
        "eval_queries": Q,
        "noise": args.noise,
        "vocab_words": args.vocab_words,
        "oracle_video_R@1": vr1,
        "oracle_video_R@5": vr5,
        "oracle_R@1_tiou0.5": float(np.mean(hit[:, 0] & (ti[:, 0] >= 0.5))),
        "oracle_R@1_tiou0.7": float(np.mean(hit[:, 0] & (ti[:, 0] >= 0.7))),
        "oracle_R@5_tiou0.5": float(np.mean(np.any(hit & (ti >= 0.5), axis=1))),
        "chance_video_R@1": 1.0 / V,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

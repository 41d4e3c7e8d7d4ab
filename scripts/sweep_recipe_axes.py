#!/usr/bin/env python
"""Sweep: recipe axes beyond capacity/tau (round-4 follow-on to DESIGN 32).

DESIGN 32 closed capacity x tau x EMA — the committed flagship
(d128/tau.02/20ep) is the plateau on those axes, at 31% of the fixture's
oracle ceiling.  The remaining plausible single-knob lifts for a softmax
contrastive retriever, each one committed-recipe +/- one change:

  hn16       — 16 mined hard negatives in the denominator (committed: 8;
               r2 swept count for TRIPLET, never for InfoNCE)
  b128       — batch 128: doubles the in-batch negative population per
               step (throughput/step falls past B=64 — DESIGN 14 — but
               quality per epoch may rise; this sweep is about recall)
  lr_cosine  — cosine LR decay (committed: constant 1e-3; contrastive
               recipes often want a decayed tail)
  linter2    — lambda_inter 2.0: weight retrieval CE over localization

Same fixture/seed/scale as DESIGN 32 (10k videos, deterministic), so
deltas vs the re-run base 0.139 are real.  Run (TPU, ~8 min/point):
    python scripts/sweep_recipe_axes.py [--points a,b] [--out F]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTS = {
    "hn16": ["--hard-negative-count", "16"],
    "b128": ["--batch-size", "128"],
    "lr_cosine": ["--lr-schedule", "cosine"],
    "linter2": ["--lambda-inter", "2.0"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="")
    ap.add_argument("--out", default=os.path.join(
        ROOT, "artifacts", "sweep_recipe_axes.json"))
    ap.add_argument("--workdir", default="/tmp/sweep_axes")
    ap.add_argument("--num-videos", type=int, default=10_000)
    args = ap.parse_args()

    names = [n for n in (args.points.split(",") if args.points else POINTS)
             if n]
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for name in names:
        flags = POINTS[name]
        out_dir = os.path.join(args.workdir, name)
        t0 = time.perf_counter()
        print(f"[sweep] {name} ...", file=sys.stderr, flush=True)
        cmd = [sys.executable,
               os.path.join(ROOT, "scripts", "quality_run_large.py"),
               "--out", out_dir,
               "--num-videos", str(args.num_videos), *flags]
        rc = subprocess.run(cmd, cwd=ROOT).returncode
        if rc != 0:
            results[name] = {"error": f"rc={rc}"}
        else:
            with open(os.path.join(out_dir, "final_metrics.json")) as f:
                fm = json.load(f)
            results[name] = {
                "flags": " ".join(flags),
                "corpus_video_R@1": fm["corpus"]["corpus_video_R@1"],
                "corpus_video_R@5": fm["corpus"]["corpus_video_R@5"],
                "corpus_R@1_tiou0.5": fm["corpus"]["corpus_R@1_tiou0.5"],
                "R@1_tiou0.5": fm["eval_threshold"]["R@1_tiou0.5"],
                "mIoU": fm["eval_threshold"]["mIoU"],
                "train_wall_s": fm["wall_s"]["train_total"],
            }
        results[name]["wall_s"] = round(time.perf_counter() - t0, 1)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        os.replace(tmp, args.out)
        print(f"[sweep] {name} done: {json.dumps(results[name])}",
              file=sys.stderr, flush=True)

    print(json.dumps(results, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Sweep: capacity (joint_dim) x cosine-tau x EMA at spec scale
(VERDICT r3 missing #3 / next #2).

What is known going in (docs/DESIGN.md 26/28/30):
  * trained recall 0.139 vs fixture oracle ceiling 0.455 (31%)
  * capacity knee: d=256 gave +21% video R@1 — but measured under
    SQEUCLIDEAN and BEFORE EMA existed
  * cosine's tau band shifts with d; at d=256 only tau {0.015, 0.02}
    were tried, both below the shifted band
  * raw 40-epoch training falls off an overtraining cliff — never
    measured whether EMA converts longer training into recall

This sweep composes the three knobs the grid left open: d=256 with the
tau band rescaled for the bigger sphere (0.025-0.04), EMA 0.999 on
everywhere, and a 40-epoch d=128 run to test the EMA-vs-overtraining
question.  Each point is one scripts/quality_run_large.py run (same
fixture seed, same split) writing to its own --out; this driver collects
the final metrics into ONE json for the DESIGN entry.

Run on the TPU (serialize! ~10 min/point):
    python scripts/sweep_capacity_tau_ema.py [--points a,b,c] [--out F]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> extra quality_run_large.py flags.  The committed flagship
# (d128 tau .02 ema .999 20ep) is the baseline all deltas compare to —
# re-run here as "base" so every comparison shares the session's noise.
POINTS = {
    "base_d128_t020_e20": [],
    "d256_t020_e20": ["--joint-dim", "256", "--temperature", "0.020"],
    "d256_t025_e20": ["--joint-dim", "256", "--temperature", "0.025"],
    "d256_t032_e20": ["--joint-dim", "256", "--temperature", "0.032"],
    "d256_t040_e20": ["--joint-dim", "256", "--temperature", "0.040"],
    "d128_t020_e40": ["--epochs", "40"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="",
                    help="comma-separated subset of point names (default all)")
    ap.add_argument("--out", default=os.path.join(
        ROOT, "artifacts", "sweep_capacity_tau_ema.json"))
    ap.add_argument("--workdir", default="/tmp/sweep_cte")
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
                "flags": " ".join(flags) or "(flagship defaults)",
                "corpus_video_R@1": fm["corpus"]["corpus_video_R@1"],
                "corpus_video_R@5": fm["corpus"]["corpus_video_R@5"],
                "corpus_R@1_tiou0.5": fm["corpus"]["corpus_R@1_tiou0.5"],
                "R@1_tiou0.5": fm["eval_threshold"]["R@1_tiou0.5"],
                "mIoU": fm["eval_threshold"]["mIoU"],
                "joint_dim": fm["model"]["joint_dim"],
                "temperature": fm["loss"]["temperature"],
                "epochs": fm["epochs"],
                "train_wall_s": fm["wall_s"]["train_total"],
            }
        results[name]["wall_s"] = round(time.perf_counter() - t0, 1)
        # write after every point: a crash mid-sweep keeps what finished
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

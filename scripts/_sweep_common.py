"""Shared driver for the recipe sweep scripts (sweep_capacity_tau_ema.py,
sweep_recipe_axes.py): run quality_run_large.py once per point, extract
the headline metrics, and merge into one crash-safe JSON artifact."""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# final_metrics.json fields every sweep point records
_EXTRACT = (
    ("corpus_video_R@1", ("corpus", "corpus_video_R@1")),
    ("corpus_video_R@5", ("corpus", "corpus_video_R@5")),
    ("corpus_R@1_tiou0.5", ("corpus", "corpus_R@1_tiou0.5")),
    ("R@1_tiou0.5", ("eval_threshold", "R@1_tiou0.5")),
    ("mIoU", ("eval_threshold", "mIoU")),
    ("joint_dim", ("model", "joint_dim")),
    ("temperature", ("loss", "temperature")),
    ("epochs", ("epochs",)),
    ("train_wall_s", ("wall_s", "train_total")),
)


def run_points(points: dict, names, out_path: str, workdir: str,
               num_videos: int, script: str = "quality_run_large.py") -> dict:
    """points: name -> extra quality-run flags.  Merges results
    into ``out_path`` after EVERY point (tmp + os.replace), so a crash
    mid-sweep keeps what finished."""
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    for name in names:
        flags = points[name]
        out_dir = os.path.join(workdir, name)
        t0 = time.perf_counter()
        print(f"[sweep] {name} ...", file=sys.stderr, flush=True)
        cmd = [sys.executable,
               os.path.join(ROOT, "scripts", script),
               "--out", out_dir,
               "--num-videos", str(num_videos), *flags]
        rc = subprocess.run(cmd, cwd=ROOT).returncode
        if rc != 0:
            results[name] = {"error": f"rc={rc}"}
        else:
            with open(os.path.join(out_dir, "final_metrics.json")) as f:
                fm = json.load(f)
            rec = {"flags": " ".join(flags) or "(flagship defaults)"}
            for key, path in _EXTRACT:
                v = fm
                for part in path:
                    v = v[part]
                rec[key] = v
            results[name] = rec
        results[name]["wall_s"] = round(time.perf_counter() - t0, 1)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        os.replace(tmp, out_path)
        print(f"[sweep] {name} done: {json.dumps(results[name])}",
              file=sys.stderr, flush=True)
    return results


def sweep_main(points: dict, default_out: str, default_workdir: str,
               script: str = "quality_run_large.py",
               default_num_videos: int = 10_000):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="",
                    help="comma-separated subset of point names (default all)")
    ap.add_argument("--out", default=default_out)
    ap.add_argument("--workdir", default=default_workdir)
    ap.add_argument("--num-videos", type=int, default=default_num_videos)
    args = ap.parse_args()
    names = [n for n in (args.points.split(",") if args.points else points)
             if n]
    results = run_points(points, names, args.out, args.workdir,
                         args.num_videos, script=script)
    print(json.dumps(results, indent=2, sort_keys=True))

#!/usr/bin/env python
"""Sweep: capacity (joint_dim) x cosine-tau x EMA at spec scale
(VERDICT r3 missing #3 / next #2).

What was known going in (docs/DESIGN.md 26/28/30):
  * trained recall 0.139 vs fixture oracle ceiling 0.455 (31%)
  * capacity knee: d=256 gave +21% video R@1 — but measured under
    SQEUCLIDEAN and BEFORE EMA existed
  * cosine's tau band shifts with d; at d=256 only tau {0.015, 0.02}
    were tried, both below the shifted band
  * raw 40-epoch training falls off an overtraining cliff — never
    measured whether EMA converts longer training into recall

Outcome (artifacts/sweep_capacity_tau_ema.json, DESIGN 32): the
committed flagship d128/tau.02/20ep IS the plateau — d256's best
rescaled-band point loses 9% at 2x serving bytes, tau .04 collapses,
EMA does not rescue 40-epoch overtraining.

Each point = one scripts/quality_run_large.py run (same fixture seed,
deterministic).  Run on the TPU (serialize! ~8 min/point):
    python scripts/sweep_capacity_tau_ema.py [--points a,b] [--out F]
"""

import os

from _sweep_common import ROOT, sweep_main

POINTS = {
    "base_d128_t020_e20": [],
    "d256_t020_e20": ["--joint-dim", "256", "--temperature", "0.020"],
    "d256_t025_e20": ["--joint-dim", "256", "--temperature", "0.025"],
    "d256_t032_e20": ["--joint-dim", "256", "--temperature", "0.032"],
    "d256_t040_e20": ["--joint-dim", "256", "--temperature", "0.040"],
    "d128_t020_e40": ["--epochs", "40"],
}

if __name__ == "__main__":
    sweep_main(POINTS,
               default_out=os.path.join(ROOT, "artifacts",
                                        "sweep_capacity_tau_ema.json"),
               default_workdir="/tmp/sweep_cte")

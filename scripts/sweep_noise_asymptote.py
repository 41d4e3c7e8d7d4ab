#!/usr/bin/env python
"""Sweep: the fixture-noise asymptote of the committed recipe (VERDICT r4 #1).

Companion to the ceiling ladder (scripts/probe_fixture_ceiling.py): the
ladder bounds what any decoder could do at noise 0.25; this sweep measures
what the COMMITTED recipe does as the noise knob moves, locating the
noise-imposed asymptote of corpus video R@1 at 10k videos.  Reading:

  * recall(noise->0) is the recipe's crowding/architecture limit — the
    part of the gap to 1.0 that no denoising can recover;
  * recall(0.25) vs recall(0) is what the committed noise level costs;
  * if recall(0) ~= recall(0.25), the quality axis is noise-dominated
    nowhere and recipe work still has headroom everywhere.

Each point is the full committed flagship recipe (mean pool, B=128,
tau .018, hn8, EMA, 20 epochs) on the deterministic seed-0 fixture with
only the feature-noise sigma changed.  Run (TPU, ~8 min/point):
    python scripts/sweep_noise_asymptote.py [--points a,b] [--out F]
"""

import os

from _sweep_common import ROOT, sweep_main

POINTS = {
    "noise000": ["--noise", "0.0"],
    "noise010": ["--noise", "0.10"],
    # 0.25 = the committed artifact (artifacts/quality_large) — re-run
    # here anyway so the sweep is self-contained on one fixture family
    "noise025": ["--noise", "0.25"],
    "noise040": ["--noise", "0.40"],
}

if __name__ == "__main__":
    sweep_main(POINTS,
               default_out=os.path.join(ROOT, "artifacts",
                                        "sweep_noise_asymptote.json"),
               default_workdir="/tmp/sweep_noise")

"""Regression gate on the SPEC-SCALE quality artifact (VERDICT r2 #1).

scripts/quality_run_large.py trains the didemo_flagship preset recipe
(InfoNCE over cosine distance, MEAN query pooling — the final-state
summary was costing ~half the recall, DESIGN 35 — batch 128 / tau 0.018
+ mining count 8 / refresh every epoch + Polyak-averaged serving weights
ema_decay 0.999, docs/DESIGN.md 11b/27/28/30/33/35) on a 10,000-video
fixture and evaluates corpus retrieval against the full 210,000-row
moment index — the corpus scale BASELINE.json:10-11 names, not the
256-video fixture the small artifact uses.  Committed artifact
(2026-08-19, mean-pool recipe): corpus video R@1 ~0.48 = 4,800x the
1e-4 chance floor (last-pool b128 recipe: 0.258; r3 B=64 recipe: 0.139;
no-EMA cosine-infonce: 0.114; r2-era triplet: 0.0312), video R@5 ~0.64,
localization R@1@0.5 ~0.98 / mIoU ~0.95.

Thresholds are justified by an n=4 seed ladder at the committed
operating point (DESIGN 38; artifacts/sweep_recipe_axes.json
meanpool_tau018{,_s1,_s2,_s3}): corpus video R@1 0.4783 / 0.4679 /
0.4762 / 0.4515 — mean 0.468, min 0.4515, sample std 0.012.  Gates sit
at seed-min minus >=0.05 margin, so any-seed retrain jitter passes
while losing the mean-pool lever (last-pool recipe: 0.258) or the EMA
(+22%) fails loudly.  Corpus moment retrieval at this scale is a
low-absolute-recall task family (CAL-era literature reports single-digit
R@1 on real 10k-video corpora); chance video R@1 is 1e-4.
"""

import json
import os

import numpy as np

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "quality_large", "final_metrics.json")


def _load():
    with open(ART) as f:
        return json.load(f)


def test_artifact_is_at_spec_scale():
    out = _load()
    assert out["preset"] == "didemo_flagship"
    assert out["fixture"]["num_videos"] >= 10_000
    assert out["corpus"]["corpus_num_rows"] >= 200_000
    assert out["corpus"]["num_queries"] >= 10_000
    assert out["fixture"]["noise"] >= 0.25


def test_corpus_retrieval_far_above_chance_at_scale():
    out = _load()
    m = out["corpus"]
    chance_v1 = out["chance_video_R@1"]               # 1e-4 at 10k videos
    # thresholds = n=4 seed-min (0.4515/0.6146/0.4487, DESIGN 38) - margin
    assert m["corpus_video_R@1"] >= max(100 * chance_v1, 0.40), (
        m, chance_v1)
    assert m["corpus_video_R@5"] >= 0.55, m
    assert m["corpus_R@1_tiou0.5"] >= 0.40, m
    # internal consistency
    assert m["corpus_video_R@5"] >= m["corpus_video_R@1"]
    assert m["corpus_R@5_tiou0.5"] <= m["corpus_video_R@5"]


def test_localization_in_healthy_band_at_scale():
    m = _load()["eval_threshold"]
    assert m["R@1_tiou0.5"] >= 0.70, m                # committed ~0.94
    assert m["R@5_tiou0.5"] >= 0.82, m                # committed ~0.99
    assert m["R@5_tiou0.5"] >= m["R@1_tiou0.5"]
    assert 0.45 <= m["mIoU"] <= 1.0, m


def test_official_protocol_consistent_at_scale():
    m = _load()["eval_official"]
    assert m["R@5_official"] >= m["R@1_official"] >= 0.25, m
    assert np.isfinite(m["mIoU_official"])


def test_recipe_uses_polyak_averaged_serving_weights():
    """The committed recipe Polyak-averages the params (ema_decay 0.999,
    DESIGN 30): +22% corpus video R@1 over the same run without it, and
    the knob that makes 'more epochs' safe (the raw trajectory DEGRADES
    past ~20 epochs — 40-epoch raw run: 0.091)."""
    out = _load()
    assert out.get("ema_decay", 0.0) > 0, "flagship recipe lost its EMA"


def test_mining_refresh_cost_recorded_and_cheap():
    """The refresh-cost question VERDICT r2 #1 raised: per-epoch mining at
    spec scale must be recorded in the artifact AND stay a small fraction
    of the epoch (DESIGN entry 15: device-resident banks + one-dispatch
    retrieval took it from 18.5 s to ~2.3 s at 56k train queries)."""
    out = _load()
    mine = out["mining"]
    assert mine["count"] >= 4 and mine["refresh_epochs"] == 1
    assert mine["num_refreshes"] >= 10
    assert mine["refresh_wall_s_median_steady"] is not None
    assert mine["refresh_wall_s_median_steady"] < 10.0, mine

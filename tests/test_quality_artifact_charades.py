"""Regression gate on the committed Charades-STA quality artifact
(BASELINE.json:9 config band; the DiDeMo twin is test_quality_artifact.py).

scripts/quality_run_charades.py trains the charades_sta preset on a
256-video synthetic fixture with TWO planted content spans per video
(intra-video distractors — a single span saturates window ranking at
R@1=1.0, see data/synthetic.py) plus index-based hard-negative mining,
and commits its metrics to artifacts/quality_charades/.

Committed artifact (TPU run, noise 0.25, 20 epochs, count-8/refresh-1
mining): R@1@0.5 0.980, R@1@0.7 0.822, mIoU 0.794; corpus video R@1
0.782 / R@5 0.924 over 13120 index rows (205 videos x 64-window bank,
chance ~= 0.005).
Thresholds sit halfway to chance so rerun jitter passes but a window-bank
/ masking / mining regression fails.
"""

import json
import os

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "quality_charades", "final_metrics.json")


def _load():
    with open(ART) as f:
        return json.load(f)


def test_artifact_exists_and_is_complete():
    out = _load()
    assert out["preset"] == "charades_sta"
    assert out["fixture"]["num_videos"] >= 256
    assert out["window_bank"]["max_windows"] >= 32
    for key in ("eval_threshold", "corpus"):
        assert key in out and out[key], key


def test_localization_in_healthy_band():
    m = _load()["eval_threshold"]
    # window-bank chance ~1/41 valid windows; CTRL-era real-data band is
    # R@1@0.5 ~0.24 (BASELINE.md) — the fixture is easier than real data
    # but must NOT be saturated (that would gate nothing)
    assert 0.7 <= m["R@1_tiou0.5"] <= 1.0, m
    assert m["R@1_tiou0.7"] >= 0.6, m
    assert m["R@5_tiou0.5"] >= m["R@1_tiou0.5"]
    assert m["R@1_tiou0.5"] >= m["R@1_tiou0.7"]
    assert 0.5 <= m["mIoU"] <= 1.0, m


def test_corpus_retrieval_far_above_chance():
    art = _load()
    m = art["corpus"]
    n_videos = m["corpus_num_rows"] / art["window_bank"]["max_windows"]
    chance_v1 = 1.0 / n_videos
    assert m["corpus_video_R@1"] >= max(40 * chance_v1, 0.5), (m, chance_v1)
    assert m["corpus_video_R@5"] >= 0.7, m
    assert m["corpus_R@5_tiou0.5"] <= m["corpus_video_R@5"]
    assert m["corpus_R@1_tiou0.5"] >= 0.5, m

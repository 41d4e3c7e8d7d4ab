"""Regression gate on the committed quality-run artifact (BASELINE.json:2).

scripts/quality_run.py trains didemo_fusion on a harder synthetic fixture
(256 videos, noise 0.25, 20 epochs) on the TPU and commits its metrics to
artifacts/quality/.  These tests pin the quality floor: a change that
degrades the model/loss/eval stack forces either a visible artifact
regression (re-run the script) or a test failure here.

Thresholds sit well above chance (R@1 chance ~= 4.8-14% on 21 proposals
with multi-annotator GT; corpus chance ~= k/num_rows) but below the
artifact's actual numbers, so normal numeric jitter between reruns passes.
"""

import json
import os

import numpy as np

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "quality", "final_metrics.json")


def _load():
    with open(ART) as f:
        return json.load(f)


def test_artifact_exists_and_is_complete():
    out = _load()
    assert out["preset"] == "didemo_fusion"
    assert out["fixture"]["num_videos"] >= 256
    assert out["fixture"]["noise"] >= 0.25
    for key in ("eval_threshold", "eval_official", "corpus"):
        assert key in out and out[key], key


def test_localization_in_healthy_band():
    m = _load()["eval_threshold"]
    # committed artifact (count-8/refresh-1 mining): R@1 0.895, mIoU 0.861
    assert m["R@1_tiou0.5"] >= 0.6, m           # chance ~0.05-0.14
    assert m["R@5_tiou0.5"] >= 0.8, m
    assert m["R@5_tiou0.5"] >= m["R@1_tiou0.5"]
    assert m["R@1_tiou0.5"] >= m["R@1_tiou0.7"]
    assert 0.5 <= m["mIoU"] <= 1.0, m


def test_official_protocol_consistent():
    m = _load()["eval_official"]
    assert m["R@5_official"] >= m["R@1_official"] >= 0.4, m
    assert np.isfinite(m["mIoU_official"])


def test_corpus_retrieval_far_above_chance():
    """Corpus moment retrieval is a HARD task for this model family (the
    CAL-era literature reports single-digit corpus R@1), and in-batch
    negatives alone stall at ~4x chance (video R@1 0.034 measured).  The
    committed artifact trains WITH index-based hard-negative mining
    (docs/DESIGN.md entries 11/11b, count 8 / refresh every epoch):
    video R@1 0.306 (~42x chance), video R@5 0.506.  Thresholds sit
    halfway to chance so rerun jitter passes but a mining/loss
    regression fails."""
    m = _load()["corpus"]
    n_rows = m["corpus_num_rows"]
    n_videos = n_rows / 21.0
    chance_v1 = 1.0 / n_videos                        # top-1 row's video
    assert m["corpus_video_R@1"] >= max(15 * chance_v1, 0.18), (m, chance_v1)
    assert m["corpus_video_R@5"] >= 0.35, m
    assert m["corpus_R@5_tiou0.5"] <= m["corpus_video_R@5"]
    assert m["corpus_R@1_tiou0.5"] >= 0.18, m

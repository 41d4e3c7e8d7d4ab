"""Best-checkpoint tracking (TrainConfig.best_metric): every improving
eval rolls <ckpt_dir>/best.msgpack; eval/serve open it with --best.
Named checkpoints sit outside retention GC and outside --resume's
latest_checkpoint view."""

import dataclasses as dc
import json
import os

import numpy as np
import pytest

from vfr_tpu.config import (
    DataConfig, EvalConfig, ExperimentConfig, ModelConfig, TrainConfig,
)


def _cfg(tmp_path, **tkw):
    return ExperimentConfig(
        name="tiny",
        data=DataConfig(
            data_dir=str(tmp_path / "nodata"), feature_dim=32, glove_dim=16,
            use_flow=False, synthetic_num_videos=12, synthetic_num_queries=48,
        ),
        model=ModelConfig(joint_dim=16, lstm_hidden=16,
                          stream_weights=(1.0,)),
        train=TrainConfig(**{
            "batch_size": 12, "num_epochs": 6, "learning_rate": 3e-3,
            "margin": 0.2, "checkpoint_dir": str(tmp_path / "ck"),
            "seed": 0, **tkw,
        }),
        eval=EvalConfig(eval_batch_size=16),
    )


def test_best_checkpoint_written_and_is_running_max(tmp_path):
    from vfr_tpu.train.checkpoint import best_checkpoint
    from vfr_tpu.train.loop import train

    cfg = _cfg(tmp_path, best_metric="R@1_tiou0.5")
    train(cfg)
    best = best_checkpoint(cfg.train.checkpoint_dir)
    assert best and best.endswith("best.msgpack")

    recs = [json.loads(l)
            for l in open(os.path.join(cfg.train.checkpoint_dir,
                                       "metrics.jsonl"))]
    bests = [r for r in recs if r["tag"] == "best"]
    evals = [r for r in recs if r["tag"] == "eval"]
    assert bests, "no best record logged"
    # the best log is a strictly increasing subsequence of the evals
    vals = [r["value"] for r in bests]
    assert vals == sorted(set(vals))
    assert vals[-1] == max(e["R@1_tiou0.5"] for e in evals)
    # best.msgpack's stored step matches the last improving eval
    from flax import serialization

    with open(best, "rb") as f:
        stored = serialization.msgpack_restore(f.read())
    assert int(stored["step"]) == bests[-1]["step"]


def test_best_survives_retention_gc_and_resume_uses_latest(tmp_path):
    from vfr_tpu.train.checkpoint import best_checkpoint, latest_checkpoint
    from vfr_tpu.train.loop import train

    cfg = _cfg(tmp_path, best_metric="mIoU", keep_checkpoints=1)
    train(cfg)
    assert best_checkpoint(cfg.train.checkpoint_dir)
    latest = latest_checkpoint(cfg.train.checkpoint_dir)
    assert latest and "best" not in os.path.basename(latest)
    # resume continues from the step-stamped latest and doesn't regress
    # best.msgpack (best_val reseeds from the metrics log)
    mtime0 = os.path.getmtime(best_checkpoint(cfg.train.checkpoint_dir))
    recs0 = [json.loads(l)
             for l in open(os.path.join(cfg.train.checkpoint_dir,
                                        "metrics.jsonl"))]
    best0 = max(r["value"] for r in recs0 if r["tag"] == "best")
    cfg2 = dc.replace(cfg, train=dc.replace(cfg.train, num_epochs=7))
    train(cfg2, resume=True)
    recs = [json.loads(l)
            for l in open(os.path.join(cfg.train.checkpoint_dir,
                                       "metrics.jsonl"))]
    post = [r for r in recs if r["tag"] == "best"
            and r["value"] < best0]
    assert not post, f"resume overwrote best with worse values: {post}"
    _ = mtime0  # (mtime may legitimately change if resume IMPROVES best)


def test_resume_tolerates_torn_metrics_line(tmp_path):
    """A crashed run can leave a PARTIAL trailing record in metrics.jsonl —
    exactly the state --resume exists for, so the best-so-far recovery
    must skip it, not crash (r4 review finding #1).  The intact 'best'
    record before the torn line must still seed best_val."""
    from vfr_tpu.train.loop import train

    cfg = _cfg(tmp_path, best_metric="R@1_tiou0.5", num_epochs=2)
    train(cfg)
    mpath = os.path.join(cfg.train.checkpoint_dir, "metrics.jsonl")
    recs = [json.loads(l) for l in open(mpath)]
    best0 = max(r["value"] for r in recs if r["tag"] == "best")
    with open(mpath, "a") as f:
        f.write('{"tag": "train", "step": 9, "loss": 0.1')   # torn write

    cfg2 = dc.replace(cfg, train=dc.replace(cfg.train, num_epochs=3))
    train(cfg2, resume=True)   # must not raise
    recs = [json.loads(l) for l in open(mpath)
            if not l.rstrip().endswith("0.1")]
    worse = [r for r in recs if r["tag"] == "best" and r["value"] < best0]
    assert not worse, worse


def test_unknown_best_metric_fails_loudly(tmp_path):
    from vfr_tpu.train.loop import train

    cfg = _cfg(tmp_path, best_metric="not_a_metric", num_epochs=1)
    with pytest.raises(KeyError, match="not_a_metric"):
        train(cfg)


def test_cli_best_flag_round_trip(tmp_path, capsys):
    from vfr_tpu.cli import main

    common = ["--data-dir", str(tmp_path / "nodata"),
              "--checkpoint-dir", str(tmp_path / "ck")]
    rc = main(["train", "--preset", "didemo_rgb", *common,
               "--batch-size", "12", "--epochs", "3",
               "--best-metric", "R@1_tiou0.5"])
    assert rc == 0
    capsys.readouterr()
    assert os.path.exists(str(tmp_path / "ck" / "best.msgpack"))

    rc = main(["eval", "--preset", "didemo_rgb", *common, "--best"])
    assert rc == 0
    assert "R@1" in capsys.readouterr().out


def test_cli_best_without_tracking_fails_loudly(tmp_path, capsys):
    from vfr_tpu.cli import main

    common = ["--data-dir", str(tmp_path / "nodata"),
              "--checkpoint-dir", str(tmp_path / "ck")]
    rc = main(["train", "--preset", "didemo_rgb", *common,
               "--batch-size", "12", "--epochs", "1"])
    assert rc == 0
    capsys.readouterr()
    with pytest.raises(FileNotFoundError, match="best.msgpack"):
        main(["eval", "--preset", "didemo_rgb", *common, "--best"])

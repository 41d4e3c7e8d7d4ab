"""Measured InfoNCE tau bands are encoded as guardrail DATA (VERDICT r4
weak #1 / next #5): a user running `--loss-type infonce --distance
cosine` with the dataclass-default temperature 0.05 — the sqeuclidean
optimum — used to train silently into the measured decay/collapse region
(band decays past ~0.028, collapse by 0.040; docs/DESIGN.md 32/33/35).
`config.infonce_tau_warning` turns those grid measurements into a
warning at train() entry."""

import dataclasses as dc

import pytest

from vfr_tpu.config import (
    INFONCE_TAU_BANDS,
    TrainConfig,
    get_preset,
    infonce_tau_warning,
)


def _infonce(cfg, **train_kw):
    train_kw.setdefault("loss_type", "infonce")
    return dc.replace(cfg, train=dc.replace(cfg.train, **train_kw))


def test_default_tau_over_cosine_warns():
    """The exact footgun: default tau (0.05) + cosine distance."""
    cfg = _infonce(get_preset("didemo_fusion"))
    cfg = dc.replace(cfg, model=dc.replace(cfg.model, distance="cosine"))
    assert cfg.train.temperature == TrainConfig().temperature  # the default
    msg = infonce_tau_warning(cfg)
    assert msg is not None
    assert "outside the measured band" in msg
    assert "didemo_flagship" in msg          # points at the escape hatch


def test_default_tau_over_sqeuclidean_is_fine():
    """0.05 IS the measured sqeuclidean optimum (DESIGN 27)."""
    cfg = _infonce(get_preset("didemo_fusion"))
    assert cfg.model.distance == "sqeuclidean"
    assert infonce_tau_warning(cfg) is None


def test_flagship_presets_are_inside_their_bands():
    """The one-flag recipes must never trip their own guardrail."""
    for name in ("didemo_flagship", "charades_flagship"):
        cfg = get_preset(name)
        assert cfg.train.loss_type == "infonce"
        assert infonce_tau_warning(cfg) is None, name


def test_triplet_and_learnable_tau_exempt():
    cfg = get_preset("didemo_fusion")
    cfg = dc.replace(cfg, model=dc.replace(cfg.model, distance="cosine"))
    assert infonce_tau_warning(cfg) is None            # triplet: no softmax
    learn = _infonce(cfg, learn_temperature=True)
    assert infonce_tau_warning(learn) is None          # tau is a parameter


def test_anneal_endpoint_governs():
    """temperature_final is where the run ends up — an anneal INTO the
    collapse region warns even when the start tau is in-band."""
    cfg = get_preset("didemo_fusion")
    cfg = dc.replace(cfg, model=dc.replace(cfg.model, distance="cosine"))
    bad = _infonce(cfg, temperature=0.02, temperature_final=0.05)
    assert infonce_tau_warning(bad) is not None
    ok = _infonce(cfg, temperature=0.028, temperature_final=0.018)
    assert infonce_tau_warning(ok) is None


def test_unmeasured_combo_stays_silent():
    """No grid ever measured euclidean-distance InfoNCE — fabricating a
    band would be prose dressed as data."""
    cfg = _infonce(get_preset("didemo_fusion"))
    cfg = dc.replace(cfg, model=dc.replace(cfg.model, distance="euclidean"))
    assert ("euclidean", cfg.model.query_pool) not in INFONCE_TAU_BANDS
    assert infonce_tau_warning(cfg) is None


def test_train_entry_emits_the_warning(tmp_path):
    """train() surfaces the guardrail before any step runs."""
    cfg = get_preset("didemo_rgb")
    cfg = dc.replace(
        cfg,
        data=dc.replace(cfg.data, data_dir=str(tmp_path / "nodata"),
                        feature_dim=16, glove_dim=8,
                        synthetic_num_videos=6, synthetic_num_queries=18),
        model=dc.replace(cfg.model, distance="cosine",
                         joint_dim=8, lstm_hidden=8),
        train=dc.replace(cfg.train, loss_type="infonce", batch_size=6,
                         num_epochs=1,
                         checkpoint_dir=str(tmp_path / "ck")),
    )
    from vfr_tpu.train.loop import train

    with pytest.warns(UserWarning, match="outside the measured band"):
        train(cfg)

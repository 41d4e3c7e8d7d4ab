import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.ops.topk import top_k_select


def test_exact_matches_lax():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 500)),
                    jnp.float32)
    v1, i1 = top_k_select(x, 7, "exact")
    v2, i2 = jax.lax.top_k(x, 7)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_approx_on_cpu_falls_back_exact():
    """On CPU approx_max_k computes exactly — deterministic CI behavior."""
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 500)),
                    jnp.float32)
    v1, i1 = top_k_select(x, 7, "approx", recall=0.9)
    v2, _ = jax.lax.top_k(x, 7)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_k_clamped_and_bad_method():
    x = jnp.zeros((2, 5), jnp.float32)
    v, i = top_k_select(x, 50, "exact")
    assert v.shape == (2, 5)
    with pytest.raises(ValueError):
        top_k_select(x, 3, "quantum")


def test_corpus_eval_approx_matches_exact_on_cpu():
    """End-to-end: approx config must flow through corpus_evaluate."""
    import dataclasses

    from vfr_tpu.config import DataConfig, EvalConfig, ExperimentConfig, ModelConfig
    from vfr_tpu.data.didemo import DidemoDataset
    from vfr_tpu.data.synthetic import make_didemo_fixture
    from vfr_tpu.eval.corpus import corpus_evaluate
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import init_model_params

    fix = make_didemo_fixture(num_videos=8, num_queries=24, feature_dim=16,
                              glove_dim=8, seed=3)
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=16, glove_dim=8, use_flow=False),
        model=ModelConfig(joint_dim=16, lstm_hidden=16),
        eval=EvalConfig(corpus_query_batch=12),
    )
    ds = DidemoDataset(fix.annotations, fix.rgb, None, fix.vocab, cfg.data)
    model = build_model(cfg)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, 16)
    m_exact = corpus_evaluate(params, model, ds, cfg.eval)
    ecfg_a = dataclasses.replace(cfg.eval, topk_method="approx")
    m_approx = corpus_evaluate(params, model, ds, ecfg_a)
    for k in m_exact:
        np.testing.assert_allclose(m_exact[k], m_approx[k], rtol=1e-5,
                                   err_msg=k)

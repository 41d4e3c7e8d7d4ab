"""Fused-pool Pallas kernels (pool="mean"): the length-masked mean
accumulates in VMEM scratch and the [B, T, H] hidden-state tensor never
materializes in HBM (ops/pallas/lstm_kernel.py::_kernel_pooled and the GRU
twin).  Parity anchor: ops.lstm.masked_mean_pool over the scan twin's hs —
the same definition models/mcn.py uses on non-kernel paths, so serving
(fused kernel) and eval (scan) agree by construction.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.ops.lstm import (
    gru_forward,
    init_gru_params,
    init_lstm_params,
    lstm_forward,
    masked_mean_pool,
)
from vfr_tpu.ops.pallas import lstm_kernel
from vfr_tpu.ops.pallas.gru_kernel import pallas_gru
from vfr_tpu.ops.pallas.lstm_kernel import pallas_lstm

B, T, E, H = 5, 7, 12, 16
LENGTHS = np.array([7, 3, 1, 5, 7], np.int32)  # incl. full-length and len=1


def _x(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)


class TestLSTMPooled:
    @pytest.mark.parametrize("layers", [1, 2])
    def test_matches_masked_mean_of_scan(self, layers):
        params = init_lstm_params(jax.random.PRNGKey(0), E, H, layers)
        x, lengths = _x(), jnp.asarray(LENGTHS)
        ref_last, ref_hs = lstm_forward(params, x, lengths)
        ref_pool = masked_mean_pool(ref_hs, lengths)
        out_last, out_pool = pallas_lstm(
            params, x, lengths, interpret=True, weights_dtype=jnp.float32,
            pool="mean")
        assert out_pool.shape == (B, H)
        np.testing.assert_allclose(np.asarray(out_last), np.asarray(ref_last),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_pool), np.asarray(ref_pool),
                                   rtol=1e-4, atol=1e-5)

    def test_frozen_carry_excluded_from_mean(self):
        """A sequence of length 1 must pool to exactly its t=0 state — the
        frozen carry repeated at t>=1 contributes nothing."""
        params = init_lstm_params(jax.random.PRNGKey(1), E, H)
        x, lengths = _x(1), jnp.asarray(LENGTHS)
        _, hs = lstm_forward(params, x, lengths)
        _, out_pool = pallas_lstm(
            params, x, lengths, interpret=True, weights_dtype=jnp.float32,
            pool="mean")
        np.testing.assert_allclose(np.asarray(out_pool)[2],
                                   np.asarray(hs)[2, 0],
                                   rtol=1e-5, atol=1e-6)

    def test_batch_chunking_identical(self, monkeypatch):
        """Force the 8-aligned batch-chunk path; pooled results must be
        bit-identical to the single-invocation kernel."""
        params = init_lstm_params(jax.random.PRNGKey(2), E, H)
        rng = np.random.default_rng(3)
        Bb = 24
        x = jnp.asarray(rng.standard_normal((Bb, T, E)), jnp.float32)
        lengths = jnp.asarray(rng.integers(1, T + 1, size=(Bb,)), jnp.int32)
        full_last, full_pool = pallas_lstm(
            params, x, lengths, interpret=True, weights_dtype=jnp.float32,
            pool="mean")
        real_fits = lstm_kernel.pallas_lstm_fits_vmem
        monkeypatch.setattr(
            lstm_kernel, "pallas_lstm_fits_vmem",
            lambda b, e, h, wb=2, budget=15 << 20: b <= 8
            and real_fits(b, e, h, wb, budget))
        chunk_last, chunk_pool = pallas_lstm(
            params, x, lengths, interpret=True, weights_dtype=jnp.float32,
            pool="mean")
        np.testing.assert_array_equal(np.asarray(chunk_last),
                                      np.asarray(full_last))
        np.testing.assert_array_equal(np.asarray(chunk_pool),
                                      np.asarray(full_pool))

    def test_scan_fallback_returns_pooled(self, monkeypatch):
        """When even the minimal chunk cannot fit VMEM, the scan fallback
        must honor the pool contract (pooled [B, H], not hs)."""
        params = init_lstm_params(jax.random.PRNGKey(4), E, H)
        x, lengths = _x(4), jnp.asarray(LENGTHS)
        monkeypatch.setattr(lstm_kernel, "pallas_lstm_fits_vmem",
                            lambda *a, **k: False)
        out_last, out_pool = pallas_lstm(
            params, x, lengths, interpret=True, weights_dtype=jnp.float32,
            pool="mean")
        ref_last, ref_hs = lstm_forward(params, x, lengths)
        np.testing.assert_allclose(
            np.asarray(out_pool),
            np.asarray(masked_mean_pool(ref_hs, lengths)),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_last), np.asarray(ref_last),
                                   rtol=1e-5, atol=1e-6)


class TestGRUPooled:
    @pytest.mark.parametrize("layers", [1, 2])
    def test_matches_masked_mean_of_scan(self, layers):
        params = init_gru_params(jax.random.PRNGKey(0), E, H, layers)
        x, lengths = _x(), jnp.asarray(LENGTHS)
        ref_last, ref_hs = gru_forward(params, x, lengths)
        ref_pool = masked_mean_pool(ref_hs, lengths)
        out_last, out_pool = pallas_gru(
            params, x, lengths, interpret=True, weights_dtype=jnp.float32,
            pool="mean")
        assert out_pool.shape == (B, H)
        np.testing.assert_allclose(np.asarray(out_last), np.asarray(ref_last),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_pool), np.asarray(ref_pool),
                                   rtol=1e-4, atol=1e-5)


class TestModelDispatch:
    def test_embed_queries_pallas_mean_equals_scan(self):
        """embed_queries with the Pallas kernel engaged + query_pool="mean"
        must equal the scan path — the serving program's actual contract
        (eval/corpus.py _embed_query_batch -> embed_queries_multi)."""
        import dataclasses

        from vfr_tpu.config import DataConfig, ExperimentConfig, ModelConfig
        from vfr_tpu.models.build import build_model
        from vfr_tpu.models.mcn import embed_queries, init_model_params

        F = 16
        cfg = ExperimentConfig(
            name="t",
            data=DataConfig(feature_dim=F, glove_dim=E, use_flow=False),
            model=ModelConfig(joint_dim=8, lstm_hidden=H, query_pool="mean",
                              use_pallas="always", stream_weights=(1.0,)),
        )
        model = build_model(cfg)
        rng = np.random.default_rng(0)
        glove = rng.standard_normal((32, E)).astype(np.float32)
        params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
        tokens = jnp.asarray(rng.integers(1, 32, size=(B, T)), jnp.int32)
        lengths = jnp.asarray(LENGTHS)
        q_pallas = embed_queries(params, model, tokens, lengths,
                                 inference=True, rnn_kernel="pallas")
        q_scan = embed_queries(params, model, tokens, lengths,
                               inference=True, rnn_kernel="scan")
        # bf16 VMEM-resident weights vs f32 scan: serving-precision band
        np.testing.assert_allclose(np.asarray(q_pallas), np.asarray(q_scan),
                                   rtol=2e-2, atol=2e-2)

    def test_embed_queries_pallas_gru_mean_equals_scan(self):
        from vfr_tpu.config import DataConfig, ExperimentConfig, ModelConfig
        from vfr_tpu.models.build import build_model
        from vfr_tpu.models.mcn import embed_queries, init_model_params

        F = 16
        cfg = ExperimentConfig(
            name="t",
            data=DataConfig(feature_dim=F, glove_dim=E, use_flow=False),
            model=ModelConfig(joint_dim=8, lstm_hidden=H, rnn_cell="gru",
                              query_pool="mean", use_pallas="always",
                              stream_weights=(1.0,)),
        )
        model = build_model(cfg)
        rng = np.random.default_rng(1)
        glove = rng.standard_normal((32, E)).astype(np.float32)
        params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
        tokens = jnp.asarray(rng.integers(1, 32, size=(B, T)), jnp.int32)
        lengths = jnp.asarray(LENGTHS)
        q_pallas = embed_queries(params, model, tokens, lengths,
                                 inference=True, rnn_kernel="pallas")
        q_scan = embed_queries(params, model, tokens, lengths,
                               inference=True, rnn_kernel="scan")
        np.testing.assert_allclose(np.asarray(q_pallas), np.asarray(q_scan),
                                   rtol=2e-2, atol=2e-2)

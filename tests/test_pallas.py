"""Pallas kernel parity vs jnp twins — interpret mode on CPU (SURVEY §4.3).

On the real TPU the same tests run compiled (bench.py exercises that path);
here the interpreter validates kernel semantics device-independently.
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
)
from vfr_tpu.ops.pallas.gru_kernel import pallas_gru
from vfr_tpu.ops.pallas.lstm_kernel import pallas_lstm
from vfr_tpu.parallel.sharding import fused_corpus_distances

# (The r1 standalone distance kernel was deleted after losing to XLA's fused
# matmul on-chip — 1.99 ms vs 1.11 ms f32 at [2, 210k, 128]; DESIGN.md
# entry 7.  Its fused successor incl. selection lives in select_kernel.py.)


class TestLSTMKernel:
    @pytest.mark.parametrize("layers", [1, 2])
    def test_matches_scan_twin(self, layers):
        B, T, E, H = 4, 7, 12, 16
        params = init_lstm_params(jax.random.PRNGKey(0), E, H, layers)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)
        lengths = jnp.asarray(np.array([7, 3, 1, 5], np.int32))

        ref_last, ref_hs = lstm_forward(params, x, lengths)
        out_last, out_hs = pallas_lstm(params, x, lengths, interpret=True, weights_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out_last), np.asarray(ref_last),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_hs), np.asarray(ref_hs),
                                   rtol=1e-4, atol=1e-5)

    def test_padding_freeze_semantics(self):
        """Beyond each sequence's length the carried h must stay frozen."""
        B, T, E, H = 2, 6, 8, 12
        params = init_lstm_params(jax.random.PRNGKey(1), E, H)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((B, T, E)), jnp.float32
        )
        lengths = jnp.asarray(np.array([3, 6], np.int32))
        _, hs = pallas_lstm(params, x, lengths, interpret=True, weights_dtype=jnp.float32)
        hs = np.asarray(hs)
        # rows t >= length repeat h[length-1]
        np.testing.assert_allclose(hs[0, 3], hs[0, 2], atol=1e-6)
        np.testing.assert_allclose(hs[0, 5], hs[0, 2], atol=1e-6)


class TestDistanceSelectKernel:
    """Fused distance + binned candidate selection (serving hot path)."""

    @pytest.mark.parametrize("S,Q,N,d,b", [(1, 8, 256, 8, 16),
                                           (2, 5, 300, 16, 8),
                                           (2, 16, 1024, 32, 64)])
    def test_matches_jnp_twin(self, S, Q, N, d, b):
        from vfr_tpu.ops.pallas.select_kernel import (
            _binned_min_reference,
            pallas_distance_select,
        )

        rng = np.random.default_rng(S * N + d)
        q = jnp.asarray(rng.standard_normal((S, Q, d)), jnp.float32)
        m = jnp.asarray(rng.standard_normal((S, N, d)), jnp.float32)
        m_sq = jnp.sum(m * m, axis=-1)
        w = (1.0,) if S == 1 else (0.6, 0.4)
        bn = 64 if b <= 16 else 128
        vals, rows = pallas_distance_select(
            q, m, m_sq, w, bin_size=b, block_q=8, block_n=bn, interpret=True,
        )
        rv, rr = _binned_min_reference(q, m, m_sq, w, bin_size=b, block_n=bn)
        assert vals.shape == rv.shape
        real = np.asarray(rv) < 1e29       # bins with at least one real row
        np.testing.assert_allclose(np.asarray(vals)[real], np.asarray(rv)[real],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(rows)[real],
                                      np.asarray(rr)[real])
        # all-padded bins can never win a top-k
        assert (np.asarray(vals)[~real] > 1e29).all()

    def test_topk_through_candidates_has_high_recall(self):
        """top-k over the binned candidates vs exact top-k over the full
        distance matrix: recall must be high (PartialReduce semantics)."""
        from vfr_tpu.ops.pallas.select_kernel import pallas_distance_select
        from vfr_tpu.parallel.sharding import fused_corpus_distances

        rng = np.random.default_rng(3)
        S, Q, N, d, k = 2, 8, 2048, 16, 20
        q = jnp.asarray(rng.standard_normal((S, Q, d)), jnp.float32)
        m = jnp.asarray(rng.standard_normal((S, N, d)), jnp.float32)
        m_sq = jnp.sum(m * m, axis=-1)
        w = (0.5, 0.5)
        cand_d, cand_rows = pallas_distance_select(
            q, m, m_sq, w, bin_size=8, block_q=8, block_n=256,
            interpret=True,
        )
        _, pos = jax.lax.top_k(-cand_d, k)
        got = np.take_along_axis(np.asarray(cand_rows), np.asarray(pos), 1)
        D = np.asarray(fused_corpus_distances(q, m, m_sq, jnp.asarray(w)))
        exact = np.argsort(D, axis=1, kind="stable")[:, :k]
        recall = np.mean([
            len(set(got[i]) & set(exact[i])) / k for i in range(Q)
        ])
        assert recall >= 0.9, recall


class TestGRUKernel:
    @pytest.mark.parametrize("layers", [1, 2])
    def test_matches_scan_twin(self, layers):
        B, T, E, H = 4, 7, 12, 16
        params = init_gru_params(jax.random.PRNGKey(0), E, H, layers)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)
        lengths = jnp.asarray(np.array([7, 3, 1, 5], np.int32))

        ref_last, ref_hs = gru_forward(params, x, lengths)
        out_last, out_hs = pallas_gru(params, x, lengths, interpret=True,
                                      weights_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out_last), np.asarray(ref_last),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_hs), np.asarray(ref_hs),
                                   rtol=1e-4, atol=1e-5)

    def test_padding_freeze_semantics(self):
        B, T, E, H = 2, 6, 8, 12
        params = init_gru_params(jax.random.PRNGKey(1), E, H)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((B, T, E)), jnp.float32
        )
        lengths = jnp.asarray(np.array([3, 6], np.int32))
        _, hs = pallas_gru(params, x, lengths, interpret=True,
                           weights_dtype=jnp.float32)
        hs = np.asarray(hs)
        np.testing.assert_allclose(hs[0, 3], hs[0, 2], atol=1e-6)
        np.testing.assert_allclose(hs[0, 5], hs[0, 2], atol=1e-6)

    def test_fallback_matches_scan(self):
        """Oversized shapes silently use the scan twin (same results)."""
        B, T, E, H = 300, 4, 2048, 1024   # fails the fit check
        params = init_gru_params(jax.random.PRNGKey(2), E, H)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((B, T, E)), jnp.float32
        )
        lengths = jnp.full((B,), T, jnp.int32)
        h1, _ = pallas_gru(params, x, lengths)
        h2, _ = gru_forward(params, x, lengths)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


class TestVMEMGuard:
    def test_fit_estimates(self):
        from vfr_tpu.ops.pallas.lstm_kernel import pallas_lstm_fits_vmem

        assert pallas_lstm_fits_vmem(128, 300, 1024)       # bench shape: fits
        assert not pallas_lstm_fits_vmem(256, 300, 1024)   # measured OOM
        assert pallas_lstm_fits_vmem(256, 300, 256)        # small H fits

    def test_batch_chunk_selection(self):
        from vfr_tpu.ops.pallas.lstm_kernel import batch_chunk

        assert batch_chunk(256, lambda b: b <= 128) == 128
        assert batch_chunk(256, lambda b: True) == 256
        assert batch_chunk(300, lambda b: b <= 100) == 80   # 8-aligned halving
        assert batch_chunk(256, lambda b: False) is None

    def test_chunked_equals_unchunked(self):
        """Batch chunking is semantically invisible (incl. ragged tail)."""
        from vfr_tpu.ops.pallas.lstm_kernel import _run_batch_chunks

        B, T, E, H = 10, 5, 8, 12
        params = init_lstm_params(jax.random.PRNGKey(3), E, H)
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((B, T, E)), jnp.float32
        )
        lengths = jnp.asarray(
            np.random.default_rng(4).integers(1, T + 1, B), jnp.int32
        )

        def run(xc, lc):
            return pallas_lstm(params, xc, lc, interpret=True,
                               weights_dtype=jnp.float32)

        ref_h, ref_hs = run(x, lengths)
        h, hs = _run_batch_chunks(run, x, lengths, chunk=4)  # ragged tail
        np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(hs), np.asarray(ref_hs),
                                   rtol=1e-5, atol=1e-6)

    def test_fallback_matches_scan(self):
        """Oversized shapes silently use the scan twin (same results)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vfr_tpu.ops.lstm import init_lstm_params, lstm_forward
        from vfr_tpu.ops.pallas.lstm_kernel import pallas_lstm

        B, T, E, H = 300, 4, 2048, 1024   # fails the fit check
        params = init_lstm_params(jax.random.PRNGKey(0), E, H)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((B, T, E)), jnp.float32
        )
        lengths = jnp.full((B,), T, jnp.int32)
        h1, _ = pallas_lstm(params, x, lengths)   # would OOM if not guarded
        h2, _ = lstm_forward(params, x, lengths)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

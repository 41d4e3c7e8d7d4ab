import numpy as np
import pytest

from vfr_tpu.ops.proposals import (
    charades_window_bank,
    didemo_proposals,
    pooling_matrix,
    sliding_windows,
    span_index,
    spans_to_seconds,
    temporal_endpoint_features,
    window_tef,
    window_validity_mask,
)


class TestDidemoProposals:
    def test_exactly_21_spans(self):
        spans = didemo_proposals(6)
        assert spans.shape == (21, 2)  # 6+5+4+3+2+1 contiguous spans

    def test_all_contiguous_unique_ordered(self):
        spans = didemo_proposals(6)
        seen = set()
        for s, e in spans:
            assert 0 <= s <= e < 6
            seen.add((int(s), int(e)))
        assert len(seen) == 21
        # ordered by (start, end)
        as_tuples = [tuple(x) for x in spans.tolist()]
        assert as_tuples == sorted(as_tuples)

    def test_span_index_roundtrip(self):
        spans = didemo_proposals(6)
        for i, span in enumerate(spans):
            assert span_index(tuple(span), 6) == i

    def test_general_num_clips(self):
        for c in (1, 2, 3, 8):
            spans = didemo_proposals(c)
            assert spans.shape[0] == c * (c + 1) // 2

    def test_spans_to_seconds(self):
        spans = didemo_proposals(6)
        secs = spans_to_seconds(spans, 5.0)
        # span (0,0) -> [0,5); span (5,5) -> [25,30); full span -> [0,30)
        np.testing.assert_allclose(secs[0], [0.0, 5.0])
        np.testing.assert_allclose(secs[-1], [25.0, 30.0])
        full = secs[span_index((0, 5), 6)]
        np.testing.assert_allclose(full, [0.0, 30.0])


class TestPoolingMatrix:
    def test_mean_rows_sum_to_one(self):
        spans = didemo_proposals(6)
        M = pooling_matrix(spans, 6, "mean")
        np.testing.assert_allclose(M.sum(axis=1), np.ones(21), rtol=1e-6)

    def test_mean_pool_equals_manual(self):
        spans = didemo_proposals(6)
        M = pooling_matrix(spans, 6, "mean")
        feats = np.random.default_rng(0).normal(size=(6, 16)).astype(np.float32)
        pooled = M @ feats
        for p, (s, e) in enumerate(spans):
            np.testing.assert_allclose(
                pooled[p], feats[s : e + 1].mean(axis=0), rtol=1e-5, atol=1e-6
            )

    def test_sum_mode(self):
        spans = didemo_proposals(3)
        M = pooling_matrix(spans, 3, "sum")
        lengths = spans[:, 1] - spans[:, 0] + 1
        np.testing.assert_allclose(M.sum(axis=1), lengths.astype(np.float32))

    def test_bad_mode(self):
        with pytest.raises(ValueError):
            pooling_matrix(didemo_proposals(3), 3, "median")


class TestTEF:
    def test_values(self):
        spans = didemo_proposals(6)
        tef = temporal_endpoint_features(spans, 6)
        assert tef.shape == (21, 2)
        np.testing.assert_allclose(tef[span_index((0, 5), 6)], [0.0, 1.0])
        np.testing.assert_allclose(
            tef[span_index((2, 3), 6)], [2 / 6, 4 / 6], rtol=1e-6
        )
        assert (tef >= 0).all() and (tef <= 1).all()
        assert (tef[:, 1] > tef[:, 0]).all()


class TestSlidingWindows:
    def test_basic_coverage(self):
        w = sliding_windows(30.0, (10.0,), 0.5)
        assert w.shape[1] == 2
        # stride 5: starts 0,5,10,...,20 plus right-aligned 20 (dup)
        starts = w[:, 0].tolist()
        assert 0.0 in starts and 20.0 in starts
        assert all(abs((e - s) - 10.0) < 1e-5 for s, e in w)
        assert (w[:, 1] <= 30.0 + 1e-5).all()

    def test_scale_longer_than_video(self):
        w = sliding_windows(8.0, (16.0,), 0.5)
        np.testing.assert_allclose(w, [[0.0, 8.0]])

    def test_multi_scale_sorted_unique(self):
        w = sliding_windows(40.0, (12.0, 18.0, 24.0), 0.25)
        tups = [tuple(x) for x in w.tolist()]
        assert tups == sorted(set(tups))

    def test_right_aligned_window_present(self):
        w = sliding_windows(31.0, (10.0,), 0.5)
        assert any(abs(e - 31.0) < 1e-5 for _, e in w)


class TestWindowBank:
    def test_bank_shapes_and_pool(self):
        windows, pool = charades_window_bank(
            max_duration=40.0, feature_seconds=1.0,
            scales=(12.0, 18.0, 24.0), stride_ratio=0.25, max_windows=64,
        )
        assert windows.shape == (64, 2)
        assert pool.shape == (64, 40)
        # valid rows mean-pool: each nonzero row sums to 1
        nz = pool.sum(axis=1) > 0
        np.testing.assert_allclose(pool[nz].sum(axis=1), 1.0, rtol=1e-5)
        # padded rows are all-zero and (0,0)
        pad = ~nz
        assert (windows[pad] == 0).all()

    def test_bank_overflow_raises(self):
        with pytest.raises(ValueError):
            charades_window_bank(40.0, 1.0, (4.0,), 0.05, max_windows=8)

    def test_validity_mask(self):
        windows, _ = charades_window_bank(
            40.0, 1.0, (12.0, 24.0), 0.5, max_windows=64
        )
        m = window_validity_mask(windows, duration=15.0, feature_seconds=1.0)
        # every valid window fits within 15s (+0.5 tolerance)
        assert (windows[m][:, 1] <= 15.5).all()
        # padded rows are invalid
        real = (windows[:, 1] - windows[:, 0]) > 0
        assert not m[~real].any()

    def test_window_tef(self):
        w = np.array([[0.0, 10.0], [5.0, 20.0]], dtype=np.float32)
        t = window_tef(w, duration=20.0)
        np.testing.assert_allclose(t, [[0.0, 0.5], [0.25, 1.0]])

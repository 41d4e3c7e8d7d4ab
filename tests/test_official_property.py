"""Property test: vectorized DiDeMo-official rank aggregation == brute force."""

import numpy as np

from vfr_tpu.eval.moment_eval import _official_ranks


def _brute_force(order, gt_prop_idx):
    B, P = order.shape
    out = np.zeros(B)
    for b in range(B):
        ranks = []
        for g in gt_prop_idx[b]:
            if g >= 0:
                ranks.append(int(np.where(order[b] == g)[0][0]))
        best3 = sorted(ranks)[:3]
        out[b] = sum(best3) / len(best3) if best3 else 0.0
    return out


def test_official_ranks_random_property():
    rng = np.random.default_rng(0)
    for trial in range(50):
        B, P = rng.integers(1, 12), int(rng.integers(2, 25))
        order = np.stack([rng.permutation(P) for _ in range(B)])
        A = int(rng.integers(1, 5))
        gt = rng.integers(0, P, size=(B, A)).astype(np.int32)
        # random padding
        pad = rng.random((B, A)) < 0.3
        gt = np.where(pad, -1, gt)
        gt[:, 0] = np.abs(gt[:, 0])  # ensure at least one annotator
        got = _official_ranks(order, gt)
        expect = _brute_force(order, gt)
        np.testing.assert_allclose(got, expect, rtol=1e-9,
                                   err_msg=f"trial {trial}")

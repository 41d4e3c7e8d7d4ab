"""Coarse-to-fine two-stage retriever (eval/coarse.py).

Contracts tested:
* full-rank coarse (d_coarse = D, f32 store, C = N) is EXACTLY the exact
  retriever — stage 1 is then an orthonormal rotation, which preserves L2;
* on low-rank-structured data (the regime the PCA prefilter exists for)
  recall@k vs the exact retriever is high at d_coarse << D;
* invalid (padded) rows are never retrieved through either stage;
* save/load round-trips bit-exactly and refuses a mismatched corpus.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.config import DataConfig, EvalConfig, ExperimentConfig, ModelConfig, TrainConfig
from vfr_tpu.data.didemo import DidemoDataset
from vfr_tpu.data.synthetic import make_didemo_fixture
from vfr_tpu.eval.coarse import (
    build_coarse_index,
    load_coarse,
    make_coarse_retriever,
    save_coarse,
)
from vfr_tpu.eval.corpus import MomentIndex, build_moment_index, make_retriever
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params

F, E = 32, 16


@pytest.fixture(scope="module")
def setup():
    fix = make_didemo_fixture(num_videos=48, num_queries=64, feature_dim=F,
                              glove_dim=E, seed=3)
    cfg = ExperimentConfig(
        name="c",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=True),
        model=ModelConfig(joint_dim=24, lstm_hidden=24,
                          stream_weights=(0.5, 0.5)),
        train=TrainConfig(),
        eval=EvalConfig(),
    )
    ds = DidemoDataset(fix.annotations, fix.rgb, fix.flow, fix.vocab, cfg.data)
    model = build_model(cfg)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, F)
    index = build_moment_index(params, model, ds, with_fingerprint=False)
    batch = next(ds.eval_batches(16))
    toks = jnp.asarray(batch["tokens"])
    lens = jnp.asarray(batch["lengths"])
    return cfg, model, params, ds, index, toks, lens


class TestFullRankParity:
    def test_identical_to_exact_retriever(self, setup):
        cfg, model, params, ds, index, toks, lens = setup
        D = int(index.m.shape[0] * index.m.shape[2])
        coarse = build_coarse_index(index, d_coarse=D,
                                    store_dtype=jnp.float32)
        k = 10
        exact = make_retriever(model, index, k, topk_method="exact")
        two = make_coarse_retriever(model, coarse, k,
                                    num_candidates=index.num_rows)
        d_e, r_e = exact(params, toks, lens)
        d_c, r_c = two(params, toks, lens)
        # same candidate set and (exact-rescored) distances; ties may
        # permute rows, so compare sorted distances + achieved distances
        np.testing.assert_allclose(np.sort(np.asarray(d_c), 1),
                                   np.sort(np.asarray(d_e), 1),
                                   rtol=1e-4, atol=1e-4)
        assert (np.sort(np.asarray(r_c), 1) == np.sort(np.asarray(r_e), 1)).mean() > 0.99

    def test_centroid_mode_full_quota_identical(self, setup):
        """mode='centroid' with g >= G gathers EVERY block, so stage-1
        ordering is irrelevant and the result equals the exact retriever
        (also exercises the perm row mapping end to end)."""
        cfg, model, params, ds, index, toks, lens = setup
        D = int(index.m.shape[0] * index.m.shape[2])
        coarse = build_coarse_index(index, d_coarse=D,
                                    store_dtype=jnp.float32)
        k = 10
        exact = make_retriever(model, index, k, topk_method="exact")
        two = make_coarse_retriever(model, coarse, k,
                                    num_candidates=8 * index.num_rows,
                                    mode="centroid")
        d_e, r_e = exact(params, toks, lens)
        d_c, r_c = two(params, toks, lens)
        np.testing.assert_allclose(np.sort(np.asarray(d_c), 1),
                                   np.sort(np.asarray(d_e), 1),
                                   rtol=1e-4, atol=1e-4)
        assert (np.sort(np.asarray(r_c), 1)
                == np.sort(np.asarray(r_e), 1)).mean() > 0.99

    def test_centroid_mode_small_quota_recall(self):
        """At a small block budget the bisection-packed centroids must
        still put the true top-1 row's block in the survivor set for
        most queries (structured index, like trained embeddings).  Drives
        stage 1 + the perm mapping directly (no query tower)."""
        rng = np.random.default_rng(7)
        m, m_sq = TestLowRankRecall._structured_index(
            TestLowRankRecall(), N=4096)
        idx = MomentIndex(
            m=jnp.asarray(m), m_sq=jnp.asarray(m_sq),
            video_row=np.arange(m.shape[1], dtype=np.int32),
            prop_idx=np.zeros(m.shape[1], np.int32),
            spans_sec=np.zeros((m.shape[1], 2), np.float32),
            weights=np.array([1.0, 1.0], np.float32),
        )
        S, N, d = m.shape
        q = m[:, rng.integers(0, N, 32)] + 0.02 * rng.standard_normal(
            (S, 32, d)).astype(np.float32)
        from vfr_tpu.parallel.sharding import fused_corpus_distances
        Dmat = np.asarray(fused_corpus_distances(
            jnp.asarray(q), idx.m, idx.m_sq, jnp.asarray(idx.weights)))
        true1 = np.argmin(Dmat, axis=1)

        coarse = build_coarse_index(idx, d_coarse=8)
        # stage 1: centroid scores in PCA space (weights 1 -> q_t = concat)
        q_t = np.concatenate([q[s] for s in range(S)], axis=-1)
        q_low = q_t @ np.asarray(coarse.proj)
        sb = 2.0 * q_low @ np.asarray(coarse.c_low).T \
            - np.asarray(coarse.csq)[None, :]
        g = 4                                   # 4 blocks = 512 rows of 4096
        top_blocks = np.argsort(-sb, axis=1)[:, :g]
        perm = np.asarray(coarse.perm)
        B = coarse.block_rows
        hit = np.mean([
            true1[i] in perm[(top_blocks[i][:, None] * B
                              + np.arange(B)[None, :]).ravel()]
            for i in range(q.shape[1])
        ])
        assert hit >= 0.8, hit


class TestLowRankRecall:
    def _structured_index(self, N=4096, D=48, rank=6, seed=0):
        """Rows on a low-dim manifold + small isotropic noise — the
        spectrum shape real (trained-model) embeddings have, and the
        regime the PCA prefilter is built for."""
        rng = np.random.default_rng(seed)
        basis = rng.standard_normal((rank, D)).astype(np.float32)
        z = rng.standard_normal((N, rank)).astype(np.float32)
        rows = z @ basis + 0.05 * rng.standard_normal((N, D)).astype(np.float32)
        d = D // 2
        m = np.stack([rows[:, :d], rows[:, d:]])          # [2, N, d]
        m_sq = (m.astype(np.float64) ** 2).sum(-1).astype(np.float32)
        return m, m_sq

    def test_recall_at_small_d_coarse(self, setup):
        cfg, model, params, ds, index, toks, lens = setup
        m, m_sq = self._structured_index()
        # weights (1, 1): m_tilde == plain concat, exact fused distance ==
        # L2 in the structured space
        idx = MomentIndex(
            m=jnp.asarray(m), m_sq=jnp.asarray(m_sq),
            video_row=np.arange(m.shape[1], dtype=np.int32),
            prop_idx=np.zeros(m.shape[1], np.int32),
            spans_sec=np.zeros((m.shape[1], 2), np.float32),
            weights=np.array([1.0, 1.0], np.float32),
        )
        rng = np.random.default_rng(1)
        S, N, d = m.shape
        # queries near the manifold (like trained query embeddings)
        q = m[:, rng.integers(0, N, 32)] + 0.02 * rng.standard_normal(
            (S, 32, d)).astype(np.float32)
        q = jnp.asarray(q)

        from vfr_tpu.parallel.sharding import fused_corpus_distances
        Dmat = np.asarray(fused_corpus_distances(
            q, idx.m, idx.m_sq, jnp.asarray(idx.weights)))
        k = 10
        true_top = np.argsort(Dmat, axis=1, kind="stable")[:, :k]

        coarse = build_coarse_index(idx, d_coarse=8)
        # drive stage1+stage2 directly (no query tower: feed q as the
        # embedded streams) — mirrors make_coarse_retriever's math
        q_t = jnp.concatenate([q[s] for s in range(S)], axis=-1)
        q_low = (q_t @ coarse.proj).astype(coarse.m_low.dtype)
        s_low = jnp.dot(2.0 * q_low, coarse.m_low.T,
                        preferred_element_type=jnp.float32) \
            - coarse.msq_low[None, :]
        C = 128
        _, cand = jax.lax.top_k(s_low, C)
        # m_low rows live in the bisection-permuted layout; map candidate
        # POSITIONS back to original index rows like the retriever does
        cand = np.asarray(coarse.perm)[np.asarray(cand)]
        hit = np.array([
            len(set(cand[i]) & set(true_top[i])) / k
            for i in range(cand.shape[0])
        ])
        assert hit.mean() >= 0.95, hit.mean()

    def test_invalid_rows_never_retrieved(self, setup):
        cfg, model, params, ds, index, toks, lens = setup
        m, m_sq = self._structured_index(N=512)
        n_pad = 64
        m_sq[:, -n_pad:] = 1e30                 # padded/invalid rows
        idx = MomentIndex(
            m=jnp.asarray(m), m_sq=jnp.asarray(m_sq),
            video_row=np.arange(m.shape[1], dtype=np.int32),
            prop_idx=np.zeros(m.shape[1], np.int32),
            spans_sec=np.zeros((m.shape[1], 2), np.float32),
            weights=np.array([1.0, 1.0], np.float32),
        )
        coarse = build_coarse_index(idx, d_coarse=8)
        assert np.all(np.asarray(coarse.msq_low[-n_pad:]) >= 1e29)
        two = make_coarse_retriever(model, coarse, 10, num_candidates=64)
        _, rows = two(params, toks, lens)
        assert np.asarray(rows).max() < 512 - n_pad


class TestCLI:
    def test_index_coarse_and_serve_parity(self, tmp_path, capsys):
        """`index --coarse-dim` -> `serve --coarse-path`: with
        num_candidates >= N stage 2 rescores every row exactly, so the
        results must equal the exact serve path bit-for-bit; the
        in-process `--coarse-dim` build must agree with the loaded file."""
        import json

        from vfr_tpu.cli import main

        rc = main([
            "train", "--preset", "didemo_rgb",
            "--data-dir", str(tmp_path / "none"),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--batch-size", "12", "--epochs", "2",
        ])
        assert rc == 0
        capsys.readouterr()

        ipath = tmp_path / "moments.npz"
        rc = main([
            "index", "--preset", "didemo_rgb",
            "--data-dir", str(tmp_path / "none"),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--out", str(ipath), "--coarse-dim", "16",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "coarse prefilter rank 16" in out
        cpath = tmp_path / "moments.coarse.npz"
        assert cpath.exists()

        qfile = tmp_path / "queries.txt"
        qfile.write_text("w0001 w0002 w0003\nw0004 w0005\n")

        def run_serve(extra):
            rc = main([
                "serve", "--preset", "didemo_rgb",
                "--data-dir", str(tmp_path / "none"),
                "--checkpoint-dir", str(tmp_path / "ck"),
                "--queries", str(qfile), "--topk", "4", *extra,
            ])
            assert rc == 0
            return [json.loads(l) for l in
                    capsys.readouterr().out.splitlines() if l.strip()]

        exact = run_serve([])
        # 64-video fixture -> 1344 rows; 100000 candidates covers them all,
        # so stage 2 IS the exact scorer (up to reduction-order drift:
        # stage 2 reduces per-candidate einsum vs the one-matmul scorer,
        # so near-ties may swap — compare distances, not JSON bytes)
        coarse = run_serve(["--index-path", str(ipath),
                            "--coarse-path", str(cpath),
                            "--coarse-candidates", "100000"])
        assert len(exact) == len(coarse)
        for e, c in zip(exact, coarse):
            assert e["query"] == c["query"]
            np.testing.assert_allclose(
                [r["distance"] for r in e["results"]],
                [r["distance"] for r in c["results"]],
                rtol=1e-4, atol=1e-5)
        inproc = run_serve(["--coarse-dim", "16",
                            "--coarse-candidates", "100000"])
        assert inproc == coarse

        # sharded two-stage (mesh + coarse): full per-shard quota -> the
        # exact answer, through the CLI mesh path on the 8-device harness
        sharded = run_serve(["--coarse-dim", "16", "--shards", "8",
                             "--coarse-candidates", "100000"])
        for e, s in zip(exact, sharded):
            assert e["query"] == s["query"]
            np.testing.assert_allclose(
                [r["distance"] for r in e["results"]],
                [r["distance"] for r in s["results"]],
                rtol=1e-4, atol=1e-5)

    def test_cli_corpus_coarse_matches_exact(self, tmp_path, capsys):
        """`corpus --coarse-dim` with a full candidate quota reproduces the
        exact corpus metrics (stage 2 rescoring covers every row)."""
        import ast

        from vfr_tpu.cli import main

        rc = main([
            "train", "--preset", "didemo_rgb",
            "--data-dir", str(tmp_path / "none"),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--batch-size", "12", "--epochs", "2",
        ])
        assert rc == 0
        capsys.readouterr()

        def run_corpus(extra):
            rc = main([
                "corpus", "--preset", "didemo_rgb",
                "--data-dir", str(tmp_path / "none"),
                "--checkpoint-dir", str(tmp_path / "ck"),
                "--topk", "5", *extra,
            ])
            assert rc == 0
            return ast.literal_eval(capsys.readouterr().out.strip())

        exact = run_corpus([])
        coarse = run_corpus(["--coarse-dim", "16",
                             "--coarse-candidates", "100000"])
        for key in exact:
            assert abs(exact[key] - coarse[key]) < 1e-6, (key, exact, coarse)

    def test_coarse_path_requires_index_path(self, tmp_path, capsys):
        from vfr_tpu.cli import main

        rc = main([
            "serve", "--preset", "didemo_rgb",
            "--data-dir", str(tmp_path / "none"),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--queries", "-", "--coarse-path", str(tmp_path / "x.npz"),
        ])
        assert rc == 2
        assert "--index-path" in capsys.readouterr().err


class TestSharded:
    def test_full_quota_matches_exact(self, setup, devices8):
        """With C_loc = n_loc every row survives stage 1, stage 2 rescores
        the whole shard exactly, and the merged top-k must equal the exact
        single-device retriever (distances as a set; ties may permute)."""
        from vfr_tpu.eval.coarse import make_sharded_coarse_retriever
        from vfr_tpu.parallel.mesh import make_mesh

        cfg, model, params, ds, index, toks, lens = setup
        D = int(index.m.shape[0] * index.m.shape[2])
        coarse = build_coarse_index(index, d_coarse=D,
                                    store_dtype=jnp.float32)
        mesh = make_mesh(("corpus",), devices=devices8)
        k = 10
        sh = make_sharded_coarse_retriever(
            model, coarse, k, mesh, num_candidates=8 * index.num_rows)
        exact = make_retriever(model, index, k, topk_method="exact")
        d_s, r_s = sh(params, toks, lens)
        d_e, r_e = exact(params, toks, lens)
        np.testing.assert_allclose(np.sort(np.asarray(d_s), 1),
                                   np.sort(np.asarray(d_e), 1),
                                   rtol=1e-4, atol=1e-4)

    def test_small_quota_returns_valid_rows(self, setup, devices8):
        from vfr_tpu.eval.coarse import make_sharded_coarse_retriever
        from vfr_tpu.parallel.mesh import make_mesh

        cfg, model, params, ds, index, toks, lens = setup
        coarse = build_coarse_index(index, d_coarse=8)
        mesh = make_mesh(("corpus",), devices=devices8)
        sh = make_sharded_coarse_retriever(model, coarse, 5, mesh,
                                           num_candidates=64)
        d, rows = sh(params, toks, lens)
        d, rows = np.asarray(d), np.asarray(rows)
        # real rows only (padding has msq=+big on both stages), ascending
        assert rows.min() >= 0 and rows.max() < index.num_rows
        assert np.all(np.diff(d, axis=1) >= -1e-5)


class TestSaveLoad:
    def test_round_trip_and_mismatch(self, setup, tmp_path):
        cfg, model, params, ds, index, toks, lens = setup
        coarse = build_coarse_index(index, d_coarse=12)
        p = save_coarse(coarse, str(tmp_path / "coarse"))
        loaded = load_coarse(p, index)
        assert loaded.d_coarse == coarse.d_coarse
        np.testing.assert_array_equal(
            np.asarray(loaded.m_low, np.float32),
            np.asarray(coarse.m_low, np.float32))
        np.testing.assert_array_equal(np.asarray(loaded.msq_low),
                                      np.asarray(coarse.msq_low))

        k = 5
        r1 = make_coarse_retriever(model, coarse, k, num_candidates=128)
        r2 = make_coarse_retriever(model, loaded, k, num_candidates=128)
        d1, rows1 = r1(params, toks, lens)
        d2, rows2 = r2(params, toks, lens)
        np.testing.assert_array_equal(np.asarray(rows1), np.asarray(rows2))

        # a coarse file built over a different corpus must fail loudly
        small = MomentIndex(
            m=index.m[:, : index.num_rows // 2],
            m_sq=index.m_sq[:, : index.num_rows // 2],
            video_row=index.video_row[: index.num_rows // 2],
            prop_idx=index.prop_idx[: index.num_rows // 2],
            spans_sec=index.spans_sec[: index.num_rows // 2],
            weights=index.weights,
        )
        with pytest.raises(ValueError, match="different corpus"):
            load_coarse(p, small)

"""Index-based hard inter-video negative mining (BASELINE.json:5).

In-batch inter-video negatives satisfy the triplet margin against the ~B
rivals visible per step and then stop providing signal — measured on the
quality fixture the inter loss drives to ~0 while full-corpus video recall
sits at ~4x chance (docs/DESIGN.md entry 12).  Mining closes the gap the
classic way: every refresh, embed the whole training corpus into the cached
moment index (eval/corpus.build_moment_index — the same code the serving
path uses), retrieve each training query's nearest moments, drop rows from
the query's own video, and keep the ``count`` hardest as explicit negatives
for the next epochs' loss term (train/loss.py hard-negative hinge).

TPU notes: mining is one retrieval pass over the training set (exact top-k;
the index build and scoring are the PASS-1/PASS-2 programs already
compiled for corpus eval), and the mined table is a tiny host-side
[num_queries, count] int32 pair joined into batches by ``query_idx`` —
batch shapes stay static, so no recompilation beyond the first mined epoch
(the factories in eval/corpus.py cache their jitted programs by model
signature, so per-refresh build_moment_index/make_retriever calls reuse
the compiled executables).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfr_tpu.models.mcn import Model


def mine_hard_negatives(
    params,
    model: Model,
    dataset,
    count: int,
    batch_size: int = 256,
    rnn_kernel: str = "scan",
    feature_banks=None,
    mesh: Optional[jax.sharding.Mesh] = None,
    axis: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (videos [Nq, count], props [Nq, count]) int32, -1-padded.

    For each training query: the ``count`` nearest index rows whose video
    differs from the query's own, by current-params fused distance over the
    full training corpus.  Rows are mined at training precision
    (rnn_kernel="scan") so the mined ranking matches what the loss sees.

    Works for both proposal families: DiDeMo static spans and Charades
    window banks — invalid windows carry m_sq=+1e30 in the index
    (build_moment_index) so every mined (video, prop) pair is a valid
    window by construction; the loss gather re-embeds them with the
    per-video TEF bank (train/step.py).

    With ``mesh`` the refresh rides the ICI-sharded retrieval machinery:
    the index operands are row-sharded over ``axis`` (default: the mesh's
    first axis — DP training reuses its "data" axis as the refresh's
    corpus axis) and the full-trainset scan runs through the hierarchical
    sharded top-k, exactly like sharded serving.  Mined pairs are
    bit-identical to the single-device refresh (exact top-k both ways;
    parity-tested in tests/test_hard_negatives.py) — without this the
    per-epoch refresh was the one serial single-device stage left in a
    multi-chip flagship run (VERDICT r3 missing #1 / weak #2).
    """
    from vfr_tpu.eval.corpus import (
        build_moment_index,
        make_sharded_stream_retriever,
        make_stream_retriever,
        shard_index_operands,
    )

    index = build_moment_index(params, model, dataset,
                               with_fingerprint=False,
                               feature_banks=feature_banks)
    P = dataset.num_proposals
    # retrieve enough rows to survive own-video filtering: the query's own
    # video contributes at most P rows to the top of the list
    k0 = min(count + P, index.num_rows)
    # ONE dispatch + ONE fetch for the whole training set: the stream
    # retriever scans all query batches inside one compiled program
    # (eval/corpus.py make_stream_retriever).  The r2 refresh paid a
    # ~100 ms relay fetch per batch here — at 10k videos / 20k queries
    # that was ~8 s of pure fetch latency per refresh.
    batches = list(dataset.eval_batches(batch_size, with_features=False))
    toks = np.stack([b["tokens"] for b in batches])      # [M, B, T]
    lens = np.stack([b["lengths"] for b in batches])     # [M, B]
    if mesh is None:
        retrieve_stream = make_stream_retriever(
            model, index, k0, topk_method="exact", rnn_kernel=rnn_kernel)
        dists_all, rows_all = retrieve_stream(params, jnp.asarray(toks),
                                              jnp.asarray(lens))
    else:
        axis = axis or mesh.axis_names[0]
        m_cat, msq_fused = shard_index_operands(index, mesh, axis=axis)
        retrieve_sharded = make_sharded_stream_retriever(
            model, index.weights, k0, mesh, axis=axis,
            topk_method="exact", rnn_kernel=rnn_kernel)
        dists_all, rows_all = retrieve_sharded(
            m_cat, msq_fused, params, jnp.asarray(toks), jnp.asarray(lens))
    rows_all = np.asarray(rows_all)                      # [M, B, k0]
    dists_all = np.asarray(dists_all)                    # [M, B, k0]
    # Sentinel rows can surface when the corpus has fewer than k0
    # RETRIEVABLE rows: mesh padding (row id >= num_rows) AND Charades
    # invalid windows (real in-range rows) both carry m_sq=+1e30, which
    # dominates any real fused distance — mask BOTH as non-mineable by
    # distance, not just the out-of-range ids (a mined pair pointing at
    # an invalid window would gather a garbage-window embedding into the
    # loss).  Threshold 1e20: far above any real fused distance (O(1e5)
    # at worst for unnormalized d=128 embeddings), far below the
    # sentinel's contribution under any stream weighting in use.
    in_range = (rows_all < index.num_rows) & (dists_all < 1e20)
    rows_all = np.minimum(rows_all, index.num_rows - 1)

    videos = np.full((dataset.num_queries, count), -1, np.int32)
    props = np.full((dataset.num_queries, count), -1, np.int32)
    for batch, rows, ok in zip(batches, rows_all, in_range):
        vid = index.video_row[rows]                      # [B, k0]
        wrong = (vid != batch["video_idx"][:, None]) & ok
        # stable argsort on ~wrong keeps retrieval order among wrong-video
        # rows and pushes own-video rows to the tail
        keep = np.argsort(~wrong, axis=1, kind="stable")[:, :count]
        got = np.take_along_axis(wrong, keep, axis=1)    # padding guard
        v = np.take_along_axis(vid, keep, axis=1)
        p = np.take_along_axis(index.prop_idx[rows], keep, axis=1)
        v = np.where(got, v, -1)
        p = np.where(got, p, -1)
        q_idx = batch["query_idx"][batch["valid"]]
        videos[q_idx] = v[batch["valid"]]
        props[q_idx] = p[batch["valid"]]
    return videos, props

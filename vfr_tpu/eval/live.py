"""Online corpus growth at serving time — zero recompiles.

Production serving needs the corpus to GROW while the daemon runs (new
videos are ingested continuously).  The naive route — rebuild the index
and the retriever — recompiles the scoring program (the shapes changed)
and, on this runtime, pays a multi-second compile + program upload per
growth event.  The TPU-native answer is to make static shapes a feature:

* the index is allocated at a fixed CAPACITY up front ([cap, S*d]
  one-matmul operands); rows past ``used_rows`` carry msq = +1e30, the
  same never-retrievable guard every padded row in this codebase uses;
* appends embed ONLY the new videos (same jitted embed/finalize programs
  as the full build) and write them into the free region with
  ``lax.dynamic_update_slice`` — donated operands, so the update is
  in-place in HBM and costs O(delta) bytes, not O(capacity);
* the retriever takes its operands as CALL-TIME arguments
  (``make_operand_retriever`` — the same jit-argument convention every
  retriever here uses, DESIGN 12c), so the post-append buffers flow into
  the already-compiled program: appends never trigger a recompile and
  queries in flight keep their snapshot (functional arrays — an append
  never mutates a buffer a dispatched program is reading).

``serve --follow --live-capacity-videos N`` wires this into the daemon:
a control line ``!add <delta.npz>`` (video_ids + raw feature arrays)
appends in-process and acks on stdout; every later query sees the grown
corpus.  Parity is tested: after any sequence of appends, retrieval
equals a from-scratch rebuild over the concatenated corpus, bit-for-bit
row ids included (appends preserve video order).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from types import SimpleNamespace
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vfr_tpu.eval.corpus import (
    _JIT_CACHE,
    build_moment_index,
    make_operand_retriever,
)
from vfr_tpu.models.mcn import Model
from vfr_tpu.parallel.sharding import fuse_index_cat

_INVALID = 1e29


@dataclass
class LiveIndex:
    """Capacity-padded one-matmul index whose row region grows in place."""
    m_cat: jnp.ndarray       # [cap, S*d] carrier dtype (f32 or bf16)
    msq_fused: jnp.ndarray   # [cap] f32; +1e30 past used_rows / invalid
    video_row: np.ndarray    # [cap] int32 (-1 on free rows)
    prop_idx: np.ndarray     # [cap] int32
    spans_sec: np.ndarray    # [cap, 2] f32
    video_ids: List[str]     # grows with appends
    weights: np.ndarray      # [S] f32
    used_rows: int
    rows_per_video: int
    index_dtype: str         # quantization applied to stored rows
    fingerprint: Optional[Dict] = field(default=None)

    @property
    def capacity(self) -> int:
        return int(self.m_cat.shape[0])

    @property
    def num_videos(self) -> int:
        return len(self.video_ids)

    @property
    def free_rows(self) -> int:
        return self.capacity - self.used_rows


def _index_operands(index, carrier) -> tuple:
    m_cat, msq_fused = fuse_index_cat(index.m, index.m_sq, index.weights)
    return m_cat.astype(carrier), msq_fused


def make_live_index(
    params, model: Model, dataset,
    capacity_videos: int,
    num_videos: int = 0,
    index_dtype: str = "float32",
    feature_banks: Optional[Dict] = None,
) -> LiveIndex:
    """Build the initial corpus into a ``capacity_videos``-sized arena."""
    index = build_moment_index(params, model, dataset,
                               num_videos=num_videos,
                               index_dtype=index_dtype,
                               with_fingerprint=False,
                               feature_banks=feature_banks)
    P = dataset.num_proposals
    V = index.num_videos
    if capacity_videos < V:
        raise ValueError(
            f"capacity_videos={capacity_videos} < initial corpus ({V})")
    cap = capacity_videos * P
    used = index.num_rows
    # carrier matches build_moment_index's storage dtype: the stored rows
    # were already quantized there, so this cast is exact either way
    carrier = index.m.dtype
    m_cat, msq_fused = _index_operands(index, carrier)

    pad = cap - used
    m_cat = jnp.concatenate(
        [m_cat, jnp.zeros((pad, m_cat.shape[1]), m_cat.dtype)])
    msq_fused = jnp.concatenate(
        [msq_fused, jnp.full((pad,), 1e30, jnp.float32)])
    video_row = np.full(cap, -1, np.int32)
    video_row[:used] = index.video_row
    prop_idx = np.zeros(cap, np.int32)
    prop_idx[:used] = index.prop_idx
    spans_sec = np.zeros((cap, 2), np.float32)
    spans_sec[:used] = index.spans_sec
    return LiveIndex(
        m_cat=jax.device_put(m_cat),
        msq_fused=jax.device_put(msq_fused),
        video_row=video_row,
        prop_idx=prop_idx,
        spans_sec=spans_sec,
        video_ids=list(dataset.video_ids[:V]),
        weights=np.asarray(index.weights, np.float32),
        used_rows=used,
        rows_per_video=P,
        index_dtype=index_dtype,
    )


def delta_corpus(dataset, video_ids, rgb, flow=None, durations=None):
    """A minimal corpus shim for ``build_moment_index`` over NEW videos,
    inheriting every static table (proposal spans, window bank, TEF) from
    the serving dataset.  ``rgb``/``flow``: [V_new, C, F] arrays in the
    dataset's own feature layout; ``durations`` (seconds, Charades only)
    sizes the per-video window validity mask."""
    rgb = np.asarray(rgb, np.float32)
    n = rgb.shape[0]
    if len(video_ids) != n:
        raise ValueError(f"{len(video_ids)} video ids for {n} feature rows")
    if rgb.shape[1:] != dataset.rgb_feats.shape[1:]:
        raise ValueError(
            f"delta rgb shape {rgb.shape[1:]} != corpus "
            f"{dataset.rgb_feats.shape[1:]}")
    shim = SimpleNamespace(
        video_ids=list(video_ids),
        rgb_feats=rgb,
        flow_feats=(np.asarray(flow, np.float32)
                    if flow is not None else None),
        num_proposals=dataset.num_proposals,
    )
    if hasattr(dataset, "windows"):          # Charades-style window bank
        from vfr_tpu.ops.proposals import window_tef, window_validity_mask

        if durations is None:
            raise ValueError("Charades delta needs per-video durations "
                             "(seconds) for the window validity mask")
        durations = np.asarray(durations, np.float32)
        shim.windows = dataset.windows
        shim.window_mask = np.stack([
            window_validity_mask(dataset.windows, float(d),
                                 dataset.cfg.feature_seconds)
            for d in durations
        ])
        # duration-normalized TEF rows, same convention as the dataset
        shim.video_tef = np.stack([
            window_tef(dataset.windows, float(d)) for d in durations
        ])
        shim.cfg = dataset.cfg
    else:
        shim.span_seconds = dataset.span_seconds
    return shim


def live_append(
    live: LiveIndex, params, model: Model, dataset,
    video_ids, rgb, flow=None, durations=None,
) -> int:
    """Embed new videos and splice them into the arena IN PLACE (device:
    donated dynamic_update_slice; host: np writes into the padded
    metadata).  Returns the number of rows appended.  O(delta) work and
    bytes; the retriever program is untouched (same operand shapes)."""
    for v in video_ids:
        if v in set(live.video_ids):
            raise ValueError(f"video {v!r} is already in the corpus")
    shim = delta_corpus(dataset, video_ids, rgb, flow=flow,
                        durations=durations)
    delta = build_moment_index(params, model, shim,
                               index_dtype=live.index_dtype,
                               with_fingerprint=False)
    n = delta.num_rows
    if n > live.free_rows:
        raise ValueError(
            f"append of {n} rows exceeds capacity: {live.free_rows} free "
            f"of {live.capacity} (grow --live-capacity-videos)")
    if not np.allclose(np.asarray(delta.weights),
                       np.asarray(live.weights)):
        raise ValueError("stream weights changed between build and append")
    d_cat, d_sq = _index_operands(delta, live.m_cat.dtype)

    upd_key = ("live_update", live.m_cat.shape, live.m_cat.dtype,
               d_cat.shape)
    _update = _JIT_CACHE.get(upd_key)
    if _update is None:
        # donation makes the splice in-place in HBM: no 2x-capacity copy,
        # and the returned buffers alias the arena
        def _update_fn(m_cat, msq, d_cat, d_sq, start):
            return (
                jax.lax.dynamic_update_slice(m_cat, d_cat, (start, 0)),
                jax.lax.dynamic_update_slice(msq, d_sq, (start,)),
            )

        _update = jax.jit(_update_fn, donate_argnums=(0, 1))
        _JIT_CACHE[upd_key] = _update

    start = live.used_rows
    live.m_cat, live.msq_fused = _update(
        live.m_cat, live.msq_fused, d_cat, d_sq, jnp.int32(start))
    base_video = live.num_videos
    live.video_row[start:start + n] = delta.video_row + base_video
    live.prop_idx[start:start + n] = delta.prop_idx
    live.spans_sec[start:start + n] = delta.spans_sec
    live.video_ids.extend(video_ids)
    live.used_rows = start + n
    return n


def live_remove(live: LiveIndex, video_ids) -> int:
    """Tombstone videos: their rows get msq = +1e30 (the universal
    never-retrievable guard), taking effect on the next retrieval with —
    like appends — zero recompiles.  Capacity is NOT reclaimed (rows stay
    tombstoned; the id stays taken, so a re-add of the same id is
    rejected — rebuild the arena to compact).  Returns rows removed."""
    vset = {}
    for v in video_ids:
        try:
            vset[live.video_ids.index(v)] = v
        except ValueError:
            raise ValueError(f"video {v!r} is not in the corpus")
    mask = np.isin(live.video_row[:live.used_rows], list(vset))
    if not mask.any():
        return 0
    full = np.zeros(live.capacity, bool)
    full[:live.used_rows] = mask

    rm_key = ("live_remove", live.msq_fused.shape)
    _remove = _JIT_CACHE.get(rm_key)
    if _remove is None:
        def _remove_fn(msq, mask):
            return jnp.where(mask, 1e30, msq)

        _remove = jax.jit(_remove_fn, donate_argnums=(0,))
        _JIT_CACHE[rm_key] = _remove

    live.msq_fused = _remove(live.msq_fused, jnp.asarray(full))
    return int(mask.sum())


def save_arena(live: LiveIndex, path: str, params=None, model=None) -> str:
    """Snapshot the whole arena (operands + metadata + used region) so a
    daemon restart skips the corpus embed entirely — including every
    append/remove applied so far, which no `cli index` rebuild from the
    base dataset would contain.  bf16 operands round-trip bit-exactly
    (raw uint16).  With ``params``/``model`` a provenance fingerprint is
    stored and validated at load (same contract as save_index)."""
    if not path.endswith(".npz"):
        path += ".npz"
    m = np.asarray(live.m_cat)
    if live.m_cat.dtype == jnp.bfloat16:
        m_store, m_dtype = m.view(np.uint16), "bfloat16"
    else:
        m_store, m_dtype = m.astype(np.float32), "float32"
    extra = {}
    if params is not None and model is not None:
        import json

        from vfr_tpu.eval.corpus import index_fingerprint

        shim = SimpleNamespace(video_ids=live.video_ids)
        fp = index_fingerprint(params, model, shim, live.num_videos)
        extra["fingerprint"] = np.asarray(json.dumps(fp))
    np.savez(path, m_cat=m_store, m_dtype=np.asarray(m_dtype),
             msq_fused=np.asarray(live.msq_fused, np.float32),
             video_row=live.video_row, prop_idx=live.prop_idx,
             spans_sec=live.spans_sec,
             video_ids=np.asarray(live.video_ids),
             weights=np.asarray(live.weights, np.float32),
             used_rows=np.asarray(live.used_rows),
             rows_per_video=np.asarray(live.rows_per_video),
             index_dtype=np.asarray(live.index_dtype),
             **extra)
    return path


def load_arena(path: str, params=None, model=None) -> LiveIndex:
    """Inverse of ``save_arena``.  With ``params``/``model`` the stored
    fingerprint (if any) is validated — a snapshot from a different
    checkpoint or corpus fails loudly instead of serving wrong moments."""
    import json

    with np.load(path, allow_pickle=False) as z:
        m_dtype = str(z["m_dtype"])
        m_cat = (jnp.asarray(z["m_cat"].view(jnp.bfloat16))
                 if m_dtype == "bfloat16"
                 else jnp.asarray(z["m_cat"], jnp.float32))
        live = LiveIndex(
            m_cat=m_cat,
            msq_fused=jnp.asarray(z["msq_fused"], jnp.float32),
            video_row=z["video_row"].copy(),
            prop_idx=z["prop_idx"].copy(),
            spans_sec=z["spans_sec"].copy(),
            video_ids=[str(v) for v in z["video_ids"]],
            weights=z["weights"],
            used_rows=int(z["used_rows"]),
            rows_per_video=int(z["rows_per_video"]),
            index_dtype=str(z["index_dtype"]),
        )
        fp = (json.loads(str(z["fingerprint"]))
              if "fingerprint" in z.files else None)
    if fp is not None and params is not None and model is not None:
        from vfr_tpu.eval.corpus import index_fingerprint

        shim = SimpleNamespace(video_ids=live.video_ids)
        want = index_fingerprint(params, model, shim, live.num_videos)
        for key in ("model", "params", "videos"):
            if fp.get(key) != want[key]:
                raise ValueError(
                    f"live arena fingerprint mismatch on {key!r}: the "
                    "snapshot was written from a different "
                    f"{'checkpoint' if key == 'params' else key}")
    return live


def make_live_retriever(
    model: Model, live: LiveIndex, k: int,
    topk_method: str = "approx", approx_recall: float = 0.95,
    rnn_kernel: Optional[str] = None,
):
    """``(params, tokens, lengths) -> (dists [Q, k], rows [Q, k])`` over
    the live arena — reads ``live``'s CURRENT operand buffers on every
    call, so appends take effect immediately and never recompile (the
    jitted program is shaped by the capacity, which is fixed).  Rows past
    the used region can only surface when k exceeds the valid row count;
    they carry distances >= 1e29 and video_row -1."""
    k = int(min(k, live.capacity))
    _retrieve = make_operand_retriever(
        model, live.weights, k, topk_method=topk_method,
        approx_recall=approx_recall, rnn_kernel=rnn_kernel)

    def retrieve(params, tokens, lengths):
        return _retrieve(live.m_cat, live.msq_fused,
                         params, tokens, lengths)

    return retrieve


def load_delta_npz(path: str):
    """Read a delta-corpus .npz: ``video_ids`` [V] str, ``rgb`` [V, C, F]
    f32, optional ``flow`` [V, C, F], optional ``durations`` [V] f32
    (Charades).  The `!add` control line of ``serve --follow`` uses this
    format, and tests write it with plain ``np.savez``."""
    with np.load(path, allow_pickle=False) as z:
        video_ids = [str(v) for v in z["video_ids"]]
        rgb = z["rgb"]
        flow = z["flow"] if "flow" in z.files else None
        durations = z["durations"] if "durations" in z.files else None
    return video_ids, rgb, flow, durations

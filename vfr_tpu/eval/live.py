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
    make_sharded_operand_retriever,
)
from vfr_tpu.models.mcn import Model
from vfr_tpu.parallel.sharding import fuse_index_cat

_INVALID = 1e29


@dataclass
class LiveIndex:
    """Capacity-padded one-matmul index whose row region grows in place.

    With ``mesh`` the operands live row-sharded over the mesh's corpus
    axis (P(axis, None) / P(axis)) and retrieval runs the hierarchical
    sharded top-k — online growth composes with ICI corpus sharding, the
    workload's scale axis (SURVEY §5).  Appends stay O(delta): the splice
    is a shard_map body where each shard patches only its overlap with
    the update window (see ``live_append``)."""
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
    mesh: Optional[jax.sharding.Mesh] = field(default=None)
    axis: str = "corpus"

    @property
    def capacity(self) -> int:
        return int(self.m_cat.shape[0])

    @property
    def num_videos(self) -> int:
        return len(self.video_ids)

    @property
    def free_rows(self) -> int:
        return self.capacity - self.used_rows

    @property
    def rows_per_shard(self) -> int:
        ndev = 1 if self.mesh is None else self.mesh.shape[self.axis]
        return self.capacity // ndev


def _arena_shardings(mesh, axis):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return (NamedSharding(mesh, P(axis, None)), NamedSharding(mesh, P(axis)))


def _mesh_capacity(cap: int, rows_per_video: int, mesh, axis) -> int:
    """Round a row capacity up to the sharded-arena invariants: divisible
    by the corpus axis AND rows_per_shard >= rows_per_video, so a
    one-video delta always fits one shard's splice window (live_append
    chunks at video granularity).  Every constructor (make_live_index,
    load_arena, live_grow) goes through this, so the invariant can't
    drift between them."""
    if mesh is None:
        return cap
    ndev = mesh.shape[axis]
    cap = max(cap, ndev * rows_per_video)
    return cap + (-cap) % ndev


def _pad_host_metadata(cap: int, video_row, prop_idx, spans_sec):
    """Full-capacity host metadata with the free-row sentinel convention
    (video_row -1, prop_idx 0, spans 0) past the populated prefix — the
    single home of that convention for every constructor."""
    n = len(video_row)
    vr = np.full(cap, -1, np.int32)
    vr[:n] = video_row
    pi = np.zeros(cap, np.int32)
    pi[:n] = prop_idx
    sp = np.zeros((cap, 2), np.float32)
    sp[:n] = spans_sec
    return vr, pi, sp


def _index_operands(index, carrier) -> tuple:
    m_cat, msq_fused = fuse_index_cat(index.m, index.m_sq, index.weights)
    return m_cat.astype(carrier), msq_fused


def make_live_index(
    params, model: Model, dataset,
    capacity_videos: int,
    num_videos: int = 0,
    index_dtype: str = "float32",
    feature_banks: Optional[Dict] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    axis: str = "corpus",
) -> LiveIndex:
    """Build the initial corpus into a ``capacity_videos``-sized arena.

    With ``mesh`` the capacity is rounded up to a multiple of the corpus
    axis size (the extra rows are ordinary free rows) and the operands are
    placed row-sharded; everything else — append/remove/save semantics —
    is identical to the single-device arena."""
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
    if mesh is not None:
        ndev = mesh.shape[axis]
        if capacity_videos < ndev:
            raise ValueError(
                f"capacity_videos={capacity_videos} < mesh corpus axis "
                f"({ndev}): each shard must hold at least one video")
        cap = _mesh_capacity(cap, P, mesh, axis)
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
    video_row, prop_idx, spans_sec = _pad_host_metadata(
        cap, index.video_row, index.prop_idx, index.spans_sec)
    if mesh is None:
        m_cat, msq_fused = jax.device_put(m_cat), jax.device_put(msq_fused)
    else:
        sh_m, sh_sq = _arena_shardings(mesh, axis)
        m_cat = jax.device_put(m_cat, sh_m)
        msq_fused = jax.device_put(msq_fused, sh_sq)
    return LiveIndex(
        m_cat=m_cat,
        msq_fused=msq_fused,
        video_row=video_row,
        prop_idx=prop_idx,
        spans_sec=spans_sec,
        video_ids=list(dataset.video_ids[:V]),
        weights=np.asarray(index.weights, np.float32),
        used_rows=used,
        rows_per_video=P,
        index_dtype=index_dtype,
        mesh=mesh,
        axis=axis,
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


def _make_sharded_splice(mesh, axis):
    """shard_map splice: write the replicated delta [n, D] into the
    row-sharded arena at global row ``start``.  Each shard slices one
    n-row window positioned to cover its overlap with [start, start+n)
    (clamped to the shard), substitutes delta rows where the window's
    global row falls in the update range, and writes the window back —
    O(n) work per shard, no collectives.  Requires n <= rows_per_shard
    (live_append chunks larger deltas across several splice calls)."""
    from jax.sharding import PartitionSpec as P

    def body(m_loc, sq_loc, d_cat, d_sq, start):
        n_loc = m_loc.shape[0]
        n = d_cat.shape[0]
        row0 = jnp.int32(jax.lax.axis_index(axis)) * n_loc
        ls = jnp.clip(start - row0, 0, n_loc - n)     # window local start
        g = row0 + ls + jnp.arange(n, dtype=jnp.int32)  # window global rows
        sel = (g >= start) & (g < start + n)
        didx = jnp.clip(g - start, 0, n - 1)
        win_m = jax.lax.dynamic_slice(m_loc, (ls, 0), (n, m_loc.shape[1]))
        win_m = jnp.where(sel[:, None], d_cat[didx], win_m)
        win_sq = jax.lax.dynamic_slice(sq_loc, (ls,), (n,))
        win_sq = jnp.where(sel, d_sq[didx], win_sq)
        return (jax.lax.dynamic_update_slice(m_loc, win_m, (ls, 0)),
                jax.lax.dynamic_update_slice(sq_loc, win_sq, (ls,)))

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(), P(), P()),
        out_specs=(P(axis, None), P(axis)),
    )


def live_append(
    live: LiveIndex, params, model: Model, dataset,
    video_ids, rgb, flow=None, durations=None,
) -> int:
    """Embed new videos and splice them into the arena IN PLACE (device:
    donated dynamic_update_slice; host: np writes into the padded
    metadata).  Returns the number of rows appended.  O(delta) work and
    bytes; the retriever program is untouched (same operand shapes).

    ATOMIC: every failure mode (duplicate id, over-capacity, weight
    drift) is raised BEFORE the first device splice, so a rejected delta
    leaves the arena exactly as it was — re-adding the same ids after a
    !grow/!compact always works.

    Sharded arena: the splice runs under ``shard_map`` — each shard
    dynamic-slices a window that covers its overlap with the update
    range, selects delta rows into it, and writes it back, so the append
    stays O(delta) per shard with no cross-shard traffic (the delta is
    replicated; a plain global dynamic_update_slice would leave the
    partitioning strategy to GSPMD).  The window must fit one shard, so
    the delta is embedded ONCE and the device splice chunks it at video
    granularity (the constructors guarantee rows_per_shard >=
    rows_per_video via ``_mesh_capacity``)."""
    taken = set(live.video_ids)
    for v in video_ids:
        if v in taken:
            raise ValueError(f"video {v!r} is already in the corpus")
    video_ids = list(video_ids)
    n = len(video_ids) * live.rows_per_video
    if n > live.free_rows:
        raise ValueError(
            f"append of {n} rows exceeds capacity: {live.free_rows} free "
            f"of {live.capacity} (reclaim with live_compact/!compact or "
            "grow with live_grow/!grow)")
    shim = delta_corpus(dataset, video_ids, rgb, flow=flow,
                        durations=durations)
    delta = build_moment_index(params, model, shim,
                               index_dtype=live.index_dtype,
                               with_fingerprint=False)
    if delta.num_rows != n:   # static proposal banks make this impossible
        raise ValueError(f"delta embedded {delta.num_rows} rows, expected "
                         f"{n} ({live.rows_per_video} per video)")
    if not np.allclose(np.asarray(delta.weights),
                       np.asarray(live.weights)):
        raise ValueError("stream weights changed between build and append")
    d_cat, d_sq = _index_operands(delta, live.m_cat.dtype)

    chunk = n if live.mesh is None else \
        (live.rows_per_shard // live.rows_per_video) * live.rows_per_video
    start = live.used_rows
    for lo in range(0, n, chunk):
        c_cat, c_sq = d_cat[lo:lo + chunk], d_sq[lo:lo + chunk]
        upd_key = ("live_update", live.m_cat.shape, live.m_cat.dtype,
                   c_cat.shape, live.mesh, live.axis)
        _update = _JIT_CACHE.get(upd_key)
        if _update is None:
            # donation makes the splice in-place in HBM: no 2x-capacity
            # copy, and the returned buffers alias the arena
            if live.mesh is None:
                def _update_fn(m_cat, msq, d_cat, d_sq, start):
                    return (
                        jax.lax.dynamic_update_slice(m_cat, d_cat,
                                                     (start, 0)),
                        jax.lax.dynamic_update_slice(msq, d_sq, (start,)),
                    )
            else:
                _update_fn = _make_sharded_splice(live.mesh, live.axis)

            _update = jax.jit(_update_fn, donate_argnums=(0, 1))
            _JIT_CACHE[upd_key] = _update
        live.m_cat, live.msq_fused = _update(
            live.m_cat, live.msq_fused, c_cat, c_sq, jnp.int32(start + lo))
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
    like appends — zero recompiles.  Capacity is NOT reclaimed here (rows
    stay tombstoned; the id stays taken, so a re-add of the same id is
    rejected) — ``live_compact`` reclaims tombstones and frees the ids.
    Returns rows removed."""
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

    rm_key = ("live_remove", live.msq_fused.shape, live.mesh, live.axis)
    _remove = _JIT_CACHE.get(rm_key)
    if _remove is None:
        def _remove_fn(msq, mask):
            return jnp.where(mask, 1e30, msq)

        # elementwise over the (possibly sharded) msq column: with a mesh
        # the mask rides in pre-sharded so each shard touches only its rows
        _remove = jax.jit(_remove_fn, donate_argnums=(0,))
        _JIT_CACHE[rm_key] = _remove

    mask_dev = jnp.asarray(full)
    if live.mesh is not None:
        mask_dev = jax.device_put(mask_dev,
                                  _arena_shardings(live.mesh, live.axis)[1])
    live.msq_fused = _remove(live.msq_fused, mask_dev)
    return int(mask.sum())


def live_compact(live: LiveIndex) -> int:
    """Reclaim tombstoned rows IN PLACE: pack the surviving rows to the
    front of the arena (original order preserved), renumber videos
    contiguously, and drop removed ids — freeing their capacity AND
    making the ids re-addable.  Returns rows reclaimed.

    Zero recompiles: the gather runs at fixed capacity shape, and the
    retriever/splice programs are capacity-shaped so they are reused
    untouched.  Cost is O(capacity) (a full-arena gather; on a mesh GSPMD
    routes the cross-shard row moves over ICI) — a maintenance operation,
    not a per-request one.  Tombstones are identified from the arena
    itself (msq >= 1e29, the universal invalid-row guard), so compaction
    works on loaded snapshots too; `live_remove` tombstones all rows of a
    video, so survival is all-or-nothing per video."""
    msq_host = np.asarray(live.msq_fused)        # [cap] f32 — a tiny fetch
    used = live.used_rows
    keep = msq_host[:used] < _INVALID
    n_keep = int(keep.sum())
    reclaimed = used - n_keep
    if reclaimed == 0:
        return 0
    kept_rows = np.nonzero(keep)[0].astype(np.int32)
    old_vids = live.video_row[:used][keep]
    surviving = np.unique(old_vids)              # sorted == original order
    remap = np.full(live.num_videos, -1, np.int32)
    remap[surviving] = np.arange(len(surviving), dtype=np.int32)

    key = ("live_compact", live.m_cat.shape, live.m_cat.dtype,
           live.mesh, live.axis)
    _compact = _JIT_CACHE.get(key)
    if _compact is None:
        def _fn(m_cat, msq, perm, n_keep):
            m2 = jnp.take(m_cat, perm, axis=0)
            sq2 = jnp.take(msq, perm)
            row = jnp.arange(perm.shape[0], dtype=jnp.int32)
            return m2, jnp.where(row < n_keep, sq2, 1e30)

        if live.mesh is None:
            _compact = jax.jit(_fn, donate_argnums=(0, 1))
        else:
            _compact = jax.jit(_fn, donate_argnums=(0, 1),
                               out_shardings=_arena_shardings(
                                   live.mesh, live.axis))
        _JIT_CACHE[key] = _compact

    perm = np.zeros(live.capacity, np.int32)
    perm[:n_keep] = kept_rows
    live.m_cat, live.msq_fused = _compact(
        live.m_cat, live.msq_fused, jnp.asarray(perm), jnp.int32(n_keep))
    # host metadata permutes IN PLACE (fancy-index RHS copies first), so a
    # running daemon's references to these arrays stay valid
    live.video_row[:n_keep] = remap[old_vids]
    live.video_row[n_keep:] = -1
    live.prop_idx[:n_keep] = live.prop_idx[kept_rows]
    live.prop_idx[n_keep:] = 0
    live.spans_sec[:n_keep] = live.spans_sec[kept_rows]
    live.spans_sec[n_keep:] = 0
    live.video_ids[:] = [live.video_ids[int(v)] for v in surviving]
    live.used_rows = n_keep
    return reclaimed


def live_grow(live: LiveIndex, capacity_videos: int) -> int:
    """Grow the arena's capacity IN PLACE to ``capacity_videos`` (rounded
    up to the mesh axis on a sharded arena).  Returns the new capacity in
    rows.  This is the ONE live-index operation that changes operand
    shapes, so the next retrieval (and the next append at a new delta
    shape) compiles once — a documented, operator-initiated cost, unlike
    the per-event recompiles a rebuild-the-retriever design would pay.
    The device op is a pad-concatenate (O(capacity) copy; on a mesh GSPMD
    redistributes rows so every shard holds new_cap/ndev)."""
    new_cap = _mesh_capacity(capacity_videos * live.rows_per_video,
                             live.rows_per_video, live.mesh, live.axis)
    if new_cap < live.capacity:
        raise ValueError(
            f"cannot shrink: capacity_videos={capacity_videos} -> "
            f"{new_cap} rows < current {live.capacity} (reclaim tombstones "
            "with live_compact instead)")
    if new_cap == live.capacity:
        return live.capacity
    pad = new_cap - live.capacity

    key = ("live_grow", live.m_cat.shape, live.m_cat.dtype, pad,
           live.mesh, live.axis)
    _grow = _JIT_CACHE.get(key)
    if _grow is None:
        def _fn(m_cat, msq):
            return (
                jnp.concatenate(
                    [m_cat, jnp.zeros((pad, m_cat.shape[1]), m_cat.dtype)]),
                jnp.concatenate([msq, jnp.full((pad,), 1e30, jnp.float32)]),
            )

        # no donation: a concatenate into a LARGER buffer can never alias
        # its input (donating would just emit a warning per call)
        if live.mesh is None:
            _grow = jax.jit(_fn)
        else:
            _grow = jax.jit(_fn, out_shardings=_arena_shardings(
                live.mesh, live.axis))
        _JIT_CACHE[key] = _grow

    live.m_cat, live.msq_fused = _grow(live.m_cat, live.msq_fused)
    # metadata arrays are REALLOCATED (capacity changed): readers must go
    # through the LiveIndex object, not hold references to the old arrays
    live.video_row, live.prop_idx, live.spans_sec = _pad_host_metadata(
        new_cap, live.video_row, live.prop_idx, live.spans_sec)
    return new_cap


def save_arena(live: LiveIndex, path: str, params=None, model=None) -> str:
    """Snapshot the whole arena (operands + metadata + used region) so a
    daemon restart skips the corpus embed entirely — including every
    append/remove applied so far, which no `cli index` rebuild from the
    base dataset would contain.  bf16 operands round-trip bit-exactly
    (raw uint16).  With ``params``/``model`` a provenance fingerprint is
    stored and validated at load (same contract as save_index).  Written
    atomically (tmp + os.replace, utils/io.py): the arena snapshot is
    exactly the file a daemon restart boots from (`--live-arena`), so a
    crash mid-`!save` must not destroy the previous good snapshot."""
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
    from vfr_tpu.utils.io import atomic_savez

    return atomic_savez(path, dict(
        m_cat=m_store, m_dtype=np.asarray(m_dtype),
        msq_fused=np.asarray(live.msq_fused, np.float32),
        video_row=live.video_row, prop_idx=live.prop_idx,
        spans_sec=live.spans_sec,
        video_ids=np.asarray(live.video_ids),
        weights=np.asarray(live.weights, np.float32),
        used_rows=np.asarray(live.used_rows),
        rows_per_video=np.asarray(live.rows_per_video),
        index_dtype=np.asarray(live.index_dtype),
        **extra))


def load_arena(path: str, params=None, model=None,
               mesh: Optional[jax.sharding.Mesh] = None,
               axis: str = "corpus") -> LiveIndex:
    """Inverse of ``save_arena``.  With ``params``/``model`` the stored
    fingerprint (if any) is validated — a snapshot from a different
    checkpoint or corpus fails loudly instead of serving wrong moments.
    With ``mesh`` the arena comes back row-sharded (capacity padded up to
    a multiple of the corpus axis with free rows if the snapshot was
    written single-device — snapshots are mesh-portable)."""
    import json

    with np.load(path, allow_pickle=False) as z:
        m_dtype = str(z["m_dtype"])
        m_host = (z["m_cat"].view(jnp.bfloat16) if m_dtype == "bfloat16"
                  else z["m_cat"].astype(np.float32))
        msq_host = np.asarray(z["msq_fused"], np.float32)
        video_row = z["video_row"].copy()
        prop_idx = z["prop_idx"].copy()
        spans_sec = z["spans_sec"].copy()
        rows_per_video = int(z["rows_per_video"])
        if mesh is not None:
            # _mesh_capacity also enforces rows_per_shard >=
            # rows_per_video, so a small snapshot loaded onto a larger
            # mesh still accepts appends (the splice window must fit one
            # shard) — without it, every later !add would fail
            cap = _mesh_capacity(m_host.shape[0], rows_per_video,
                                 mesh, axis)
            pad = cap - m_host.shape[0]
            if pad:
                m_host = np.concatenate(
                    [m_host, np.zeros((pad, m_host.shape[1]), m_host.dtype)])
                msq_host = np.concatenate(
                    [msq_host, np.full(pad, 1e30, np.float32)])
                video_row, prop_idx, spans_sec = _pad_host_metadata(
                    cap, video_row, prop_idx, spans_sec)
            sh_m, sh_sq = _arena_shardings(mesh, axis)
            m_cat = jax.device_put(m_host, sh_m)
            msq_fused = jax.device_put(msq_host, sh_sq)
        else:
            m_cat = jnp.asarray(m_host)
            msq_fused = jnp.asarray(msq_host)
        live = LiveIndex(
            m_cat=m_cat,
            msq_fused=msq_fused,
            video_row=video_row,
            prop_idx=prop_idx,
            spans_sec=spans_sec,
            video_ids=[str(v) for v in z["video_ids"]],
            weights=z["weights"],
            used_rows=int(z["used_rows"]),
            rows_per_video=rows_per_video,
            index_dtype=str(z["index_dtype"]),
            mesh=mesh,
            axis=axis,
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
    they carry distances >= 1e29 and video_row -1.  A sharded arena
    retrieves via the hierarchical sharded top-k (local top-k +
    all-gather merge), same zero-recompile guarantee.

    ``k`` is re-clamped to the arena's CURRENT capacity on every call
    (the factory lookup is a cached dict get): a daemon whose requested k
    exceeded a small boot capacity returns the full k after a ``!grow``
    instead of baking the boot-time truncation in forever."""
    k_req = int(k)
    if live.mesh is not None and topk_method == "fused":
        raise ValueError("topk_method='fused' is single-device only; "
                         "a sharded live arena uses exact/approx")

    def retrieve(params, tokens, lengths):
        k_eff = int(min(k_req, live.capacity))
        if live.mesh is not None:
            _retrieve = make_sharded_operand_retriever(
                model, live.weights, k_eff, live.mesh, axis=live.axis,
                topk_method=topk_method, approx_recall=approx_recall,
                rnn_kernel=rnn_kernel)
        else:
            _retrieve = make_operand_retriever(
                model, live.weights, k_eff, topk_method=topk_method,
                approx_recall=approx_recall, rnn_kernel=rnn_kernel)
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

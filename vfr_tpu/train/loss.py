"""Triplet ranking loss with intra-/inter-video negatives (SURVEY.md C11).

Formulation (MCN lineage, BASELINE.json:5): with fused distance D and the
ground-truth proposal g(b) for query b,

  L_intra = mean over valid (b, p != g(b)) of  relu(margin + D[b,b,g(b)] - D[b,b,p])
  L_inter = mean over valid (b, b')        of  relu(margin + D[b,b,g(b)] - D[b,b',n(b')])
  L = lambda_intra * L_intra + lambda_inter * L_inter

where n(b') = g(b) ("same_span" mode: the same temporal span in a different
video) or all spans ("all_spans").  Negatives from a different query on the
SAME video are excluded (they may describe the same moment).  Everything is
computed from the single [B, B, P] cross-distance tensor — one MXU matmul
per stream — with boolean masks carrying validity; no host-side negative
sampling, no dynamic shapes (the TPU-first replacement for the reference's
per-example sampling loop).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vfr_tpu.config import TrainConfig
from vfr_tpu.models.mcn import Model, cross_distances


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def _fused_hard_distances(
    model: Model, q: jnp.ndarray, hard_moments: Dict[str, jnp.ndarray]
) -> jnp.ndarray:
    """Stream-fused distance between each query and ITS mined hard
    negatives: [B, d] (or [S, B, d] per-stream queries) vs stream -> [B, H, d]
    -> [B, H].  Config-consistent per-stream distance + stream weights,
    identical to the in-batch fusion in ``cross_distances``."""
    from vfr_tpu.models.mcn import _stream_distance

    qs = q if q.ndim == 3 else jnp.stack([q] * len(model.streams))
    d_hard = None
    for s, name in enumerate(model.streams):
        d_s = _stream_distance(model.cfg, qs[s][:, None, :],
                               hard_moments[name])
        w = model.cfg.stream_weights[s]
        d_hard = w * d_s if d_hard is None else d_hard + w * d_s
    return d_hard


def ranking_loss(
    model: Model,
    tcfg: TrainConfig,
    q: jnp.ndarray,                      # [B, d]
    moments: Dict[str, jnp.ndarray],     # stream -> [B, P, d]
    target: jnp.ndarray,                 # [B] int32 gt proposal index
    video_idx: jnp.ndarray,              # [B] int32 video identity
    proposal_mask: Optional[jnp.ndarray] = None,   # [B, P] valid proposals
    hard_moments: Optional[Dict[str, jnp.ndarray]] = None,  # -> [B, H, d]
    hard_valid: Optional[jnp.ndarray] = None,               # [B, H] bool
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    D = cross_distances(model, q, moments)          # [B, B, P]
    B, _, P = D.shape
    bidx = jnp.arange(B)

    D_own = D[bidx, bidx]                           # [B, P] own-video distances
    pos = D_own[bidx, target]                       # [B]

    # ---- intra-video negatives: all other proposals of the query's video.
    pmask = jnp.ones((B, P), bool) if proposal_mask is None else proposal_mask
    intra_mask = pmask & (jnp.arange(P)[None, :] != target[:, None])
    intra_viol = jnp.maximum(0.0, tcfg.margin + pos[:, None] - D_own)
    l_intra = _masked_mean(intra_viol, intra_mask)

    # ---- inter-video negatives.
    diff_video = video_idx[:, None] != video_idx[None, :]        # [B, B']
    if tcfg.inter_negatives == "same_span":
        # D_span[b, b'] = D[b, b', g(b)] — the query's gt span on video b'.
        D_span = jnp.take_along_axis(D, target[:, None, None], axis=2)[..., 0]
        neg_valid = diff_video
        if proposal_mask is not None:
            # span g(b) must also be a valid window on video b':
            # pmask[:, target] is [b', b] -> transpose to [b, b'].
            neg_valid = neg_valid & pmask[:, target].T
        inter_viol = jnp.maximum(0.0, tcfg.margin + pos[:, None] - D_span)
        l_inter = _masked_mean(inter_viol, neg_valid)
    elif tcfg.inter_negatives == "all_spans":
        viol = jnp.maximum(0.0, tcfg.margin + pos[:, None, None] - D)  # [B,B',P]
        valid = diff_video[:, :, None] & pmask[None, :, :]
        l_inter = _masked_mean(viol, valid)
    else:
        raise ValueError(f"unknown inter_negatives {tcfg.inter_negatives!r}")

    loss = tcfg.lambda_intra * l_intra + tcfg.lambda_inter * l_inter

    # ---- mined hard inter-video negatives (train/hard_negatives.py):
    # each query's nearest wrong-video moments under the CURRENT index —
    # the rivals the in-batch term never sees.
    l_hard = jnp.float32(0.0)
    if hard_moments is not None:
        d_hard = _fused_hard_distances(model, q, hard_moments)
        viol = jnp.maximum(0.0, tcfg.margin + pos[:, None] - d_hard)
        hv = (
            jnp.ones(viol.shape, bool) if hard_valid is None else hard_valid
        )
        l_hard = _masked_mean(viol, hv)
        lam = tcfg.lambda_hard if tcfg.lambda_hard > 0 else tcfg.lambda_inter
        loss = loss + lam * l_hard

    # rank-0 accuracy on the fly: fraction where gt is the arg-min proposal
    D_masked = jnp.where(pmask, D_own, jnp.inf)
    acc = jnp.mean((jnp.argmin(D_masked, axis=1) == target).astype(jnp.float32))
    aux = {
        "loss": loss,
        "loss_intra": l_intra,
        "loss_inter": l_inter,
        "loss_hard": l_hard,
        "pos_dist": jnp.mean(pos),
        "train_r1": acc,
    }
    return loss, aux


def infonce_loss(
    model: Model,
    tcfg: TrainConfig,
    q: jnp.ndarray,                      # [B, d]
    moments: Dict[str, jnp.ndarray],     # stream -> [B, P, d]
    target: jnp.ndarray,                 # [B] int32 gt proposal index
    video_idx: jnp.ndarray,              # [B] int32 video identity
    proposal_mask: Optional[jnp.ndarray] = None,   # [B, P] valid proposals
    hard_moments: Optional[Dict[str, jnp.ndarray]] = None,  # -> [B, H, d]
    hard_valid: Optional[jnp.ndarray] = None,               # [B, H] bool
    log_tau: Optional[jnp.ndarray] = None,   # learnable log-temperature
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Softmax contrastive objective over the same negatives as
    ``ranking_loss`` (``loss_type="infonce"``).

    Two cross-entropies from ONE [B, B, P] cross-distance tensor with
    logits = -D / temperature:

      L_intra: softmax over the query's OWN video's valid proposals
               (localization — same candidate set the per-video eval ranks)
      L_inter: softmax over every valid (video, proposal) row in the batch
               PLUS the mined hard negatives (retrieval — same candidate
               population corpus eval ranks).  Rows from a different query
               on the SAME video are excluded, exactly like the triplet
               masks: they may describe the positive moment.

      L = lambda_intra * L_intra + lambda_inter * L_inter

    Why offer this next to the reference-lineage margin loss: a margin
    objective stops pushing once every sampled rival clears the margin,
    which is what capped corpus recall before index-based mining
    (docs/DESIGN.md 11); softmax-CE keeps a nonzero gradient on every rival
    proportional to its softmax share, which is the standard objective for
    large-scale retrieval towers.  On TPU both reduce to the same MXU
    matmul + elementwise epilogue; there is no extra memory traffic.
    """
    D = cross_distances(model, q, moments)          # [B, B, P]
    B, _, P = D.shape
    bidx = jnp.arange(B)
    if log_tau is not None:
        # CLIP-style learnable temperature (TrainConfig.learn_temperature):
        # exp keeps tau positive; the clamp floor sits below every tuned
        # optimum but above the saturated-softmax stall region (DESIGN 28)
        tau = jnp.clip(jnp.exp(log_tau), 5e-3, 1.0)
    else:
        tau = jnp.float32(tcfg.temperature)
    logits = -D / tau

    l_own = logits[bidx, bidx]                      # [B, P]
    pos_logit = l_own[bidx, target]                 # [B]
    pmask = jnp.ones((B, P), bool) if proposal_mask is None else proposal_mask

    # ---- intra CE over own-video proposals
    own_masked = jnp.where(pmask, l_own, -jnp.inf)
    l_intra = jnp.mean(jax.nn.logsumexp(own_masked, axis=1) - pos_logit)

    # ---- inter CE over all valid batch rows + mined hard negatives
    same_video = video_idx[:, None] == video_idx[None, :]     # [B, B']
    keep_row = jnp.eye(B, dtype=bool) | ~same_video
    valid = keep_row[:, :, None] & pmask[None, :, :]          # [B, B', P]
    flat = jnp.where(valid, logits, -jnp.inf).reshape(B, B * P)
    l_hard = jnp.float32(0.0)
    if hard_moments is not None:
        d_hard = _fused_hard_distances(model, q, hard_moments)  # [B, H]
        hlog = -d_hard / tau
        hv = (
            jnp.ones(hlog.shape, bool) if hard_valid is None else hard_valid
        )
        hlog = jnp.where(hv, hlog, -jnp.inf)
        flat = jnp.concatenate([flat, hlog], axis=1)
        # observability: the hard negatives' share of the softmax denominator
        # (0 = mined rivals irrelevant, ->1 = they dominate the gradient)
        l_hard = jnp.mean(jnp.exp(
            jax.nn.logsumexp(hlog, axis=1) - jax.nn.logsumexp(flat, axis=1)
        ))
    l_inter = jnp.mean(jax.nn.logsumexp(flat, axis=1) - pos_logit)

    loss = tcfg.lambda_intra * l_intra + tcfg.lambda_inter * l_inter

    # ---- symmetric (reverse) CE: each gt moment classifies its QUERY.
    # rev[b', b] = logits[b', b, target[b]] — query b' scored against b's
    # gt moment; denominator over queries (b' == b, or a different video:
    # same-video queries may describe the positive moment, same exclusion
    # as the forward term).  One gather from the existing tensor.
    l_inter_rev = jnp.float32(0.0)
    if tcfg.lambda_inter_rev > 0.0:
        rev = logits[:, bidx, target]                 # [B', B]
        # keep_row is symmetric (eye | ~same_video with a symmetric
        # same_video), so keep_row[b', b] masks the reverse direction too
        rev = jnp.where(keep_row, rev, -jnp.inf)
        l_inter_rev = jnp.mean(
            jax.nn.logsumexp(rev, axis=0) - pos_logit)
        loss = loss + tcfg.lambda_inter_rev * l_inter_rev

    D_own = D[bidx, bidx]
    D_masked = jnp.where(pmask, D_own, jnp.inf)
    acc = jnp.mean((jnp.argmin(D_masked, axis=1) == target).astype(jnp.float32))
    aux = {
        "loss": loss,
        "loss_intra": l_intra,
        "loss_inter": l_inter,
        "loss_inter_rev": l_inter_rev,
        "loss_hard": l_hard,
        "pos_dist": jnp.mean(D_own[bidx, target]),
        "train_r1": acc,
    }
    if log_tau is not None:
        aux["tau"] = tau                  # observability for the learned tau
    return loss, aux


def compute_loss(model: Model, tcfg: TrainConfig, *args, log_tau=None,
                 **kwargs):
    """Dispatch on ``tcfg.loss_type`` — the single entry the train step uses.

    ``log_tau`` (the learnable-temperature parameter, train/loop.py
    ``init_train_params``) is consumed by infonce only; the triplet loss
    has no temperature, so it is dropped there."""
    if tcfg.loss_type == "triplet":
        return ranking_loss(model, tcfg, *args, **kwargs)
    if tcfg.loss_type == "infonce":
        return infonce_loss(model, tcfg, *args, log_tau=log_tau, **kwargs)
    raise ValueError(f"unknown loss_type {tcfg.loss_type!r}")

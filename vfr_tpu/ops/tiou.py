"""Temporal IoU between [start, end) intervals (SURVEY.md C6).

Written against the array-API subset shared by numpy and jax.numpy so the
same function serves host-side eval (numpy) and on-device vectorized eval
(jnp) — pass ``xp=jax.numpy`` for the latter.
"""

from __future__ import annotations

import numpy as np


def tiou(a, b, xp=np):
    """Elementwise/broadcast temporal IoU.

    ``a``, ``b``: arrays broadcastable to a common shape ``[..., 2]`` of
    (start, end) with end >= start.  Zero-length union -> 0.
    """
    a = xp.asarray(a)
    b = xp.asarray(b)
    inter = xp.maximum(
        0.0, xp.minimum(a[..., 1], b[..., 1]) - xp.maximum(a[..., 0], b[..., 0])
    )
    union = xp.maximum(a[..., 1], b[..., 1]) - xp.minimum(a[..., 0], b[..., 0])
    return xp.where(union > 0, inter / xp.where(union > 0, union, 1.0), 0.0)


def tiou_matrix(a, b, xp=np):
    """Pairwise IoU: ``a [M, 2]``, ``b [N, 2]`` -> ``[M, N]``."""
    a = xp.asarray(a)
    b = xp.asarray(b)
    return tiou(a[:, None, :], b[None, :, :], xp=xp)

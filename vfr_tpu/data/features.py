"""Precomputed clip-feature store (SURVEY.md C3).

Features are frozen inputs — no video decoding, no CNN forward.  On-disk
format: one ``.npz`` per stream (``features_rgb.npz`` / ``features_flow.npz``)
mapping video id -> ``[num_clips, feature_dim]`` float32 (DiDeMo) or
``[T, feature_dim]`` per-second rows (Charades).  ``.npy`` directories
(one file per video) are also accepted — both formats are what public
feature dumps convert to in one line.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable

import numpy as np


class FeatureStore:
    """In-memory map video id -> feature array, with disk round-trip."""

    def __init__(self, table: Dict[str, np.ndarray]):
        self._table = {k: np.asarray(v, dtype=np.float32) for k, v in table.items()}

    def __getitem__(self, video_id: str) -> np.ndarray:
        return self._table[video_id]

    def __contains__(self, video_id: str) -> bool:
        return video_id in self._table

    def __len__(self) -> int:
        return len(self._table)

    def ids(self) -> Iterable[str]:
        return self._table.keys()

    def get_padded(self, video_id: str, rows: int) -> np.ndarray:
        """Features padded/truncated to ``rows`` rows (TPU static shapes).

        Videos shorter than the grid are zero-padded; pooling matrices /
        validity masks account for true length.
        """
        f = self._table[video_id]
        out = np.zeros((rows, f.shape[1]), dtype=np.float32)
        n = min(rows, f.shape[0])
        out[:n] = f[:n]
        return out

    def save_npz(self, path: str) -> None:
        from vfr_tpu.utils.io import atomic_savez

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        atomic_savez(path, dict(self._table), compressed=True)

    @classmethod
    def load(cls, path: str):
        """Load from ``.npz``, a ``<video_id>.npy`` directory, or a packed
        ``.vfrf`` mmap file (native C++ reader, data/packed.py)."""
        if path.endswith(".vfrf"):
            from vfr_tpu.data.packed import PackedFeatureStore

            return PackedFeatureStore(path)
        if os.path.isdir(path):
            table = {}
            for fn in sorted(os.listdir(path)):
                if fn.endswith(".npy"):
                    table[fn[:-4]] = np.load(os.path.join(path, fn))
            return cls(table)
        with np.load(path) as z:
            return cls({k: z[k] for k in z.files})

    @classmethod
    def maybe_load(cls, path: str):
        if os.path.exists(path):
            return cls.load(path)
        vfrf = os.path.splitext(path)[0] + ".vfrf"
        if os.path.exists(vfrf):
            return cls.load(vfrf)
        return None


# feature-stream bank keys eligible for bank_dtype quantization; small
# exact tables (video_tef, masks) always stay at their native dtype
_STREAM_KEYS = ("rgb", "flow")


def banks_to_device(banks: dict, bank_dtype: str = "float32",
                    sharding=None):
    """One-time device upload of full-corpus feature banks.

    ``bank_dtype="bfloat16"`` converts the rgb/flow streams ON THE HOST
    before the transfer — halving the H2D bytes (the dominant spec-scale
    cold-start cost, docs/DESIGN.md 18) and the banks' HBM footprint.
    Consumers upcast to the model compute dtype at gather time, so only
    the stored inputs are quantized.
    """
    import jax
    import jax.numpy as jnp

    if bank_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"unknown bank_dtype {bank_dtype!r}")
    dt = jnp.bfloat16 if bank_dtype == "bfloat16" else jnp.float32
    host = {
        k: (np.asarray(v).astype(dt) if k in _STREAM_KEYS
            else np.asarray(v))
        for k, v in banks.items()
    }
    if sharding is not None:
        return jax.device_put(host, sharding)
    return jax.device_put(host)

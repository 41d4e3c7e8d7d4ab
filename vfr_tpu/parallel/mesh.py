"""Device-mesh helpers.

One real chip trains fine (the model is ~10 MB); the mesh abstraction exists
for (a) data-parallel training (axis "data") and (b) corpus-sharded retrieval
(axis "corpus") where the moment-embedding index rows are distributed over
ICI (BASELINE.json:10).  On this box multi-device paths run on the virtual
CPU backend (tests/conftest.py); the same code runs unchanged on a pod slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np


def make_mesh(
    axis_names: Sequence[str] = ("corpus",),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> jax.sharding.Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    mesh_devices = np.asarray(devices[:n]).reshape(shape)
    return jax.sharding.Mesh(mesh_devices, tuple(axis_names))

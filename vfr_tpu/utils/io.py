"""Crash-safe artifact persistence.

Every snapshot a restart boots from (moment index, live arena, coarse
operands, checkpoints) must be written tmp + ``os.replace`` so an
interrupted save — crash, OOM, SIGKILL mid-write — leaves the PREVIOUS
good file intact instead of a truncated one (VERDICT r3 weak #1; the
pattern train/checkpoint.py has used since r1).
"""

from __future__ import annotations

import os

import numpy as np


def tree_fingerprint(tree) -> str:
    """SHA-1 over every leaf's dtype/shape/bytes of a parameter pytree.

    Quality artifacts record this instead of committing the ~100 MB
    checkpoint binary (VERDICT r4 #7: retrains were growing .git by
    100 MB each): the committed recipe is deterministic, so anyone can
    regenerate the checkpoint from the artifact's config and verify the
    weights byte-for-byte against this hash.  Same per-leaf encoding as
    eval/corpus.index_fingerprint's params hash (which reuses this).

    ONE bulk device_get — per-leaf np.asarray pays a ~100 ms relay
    round-trip per leaf on this runtime (DESIGN 8)."""
    import hashlib

    import jax

    h = hashlib.sha1()
    for leaf in jax.device_get(jax.tree.leaves(tree)):
        a = np.asarray(leaf)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def atomic_savez(path: str, arrays: dict, compressed: bool = False) -> str:
    """``np.savez`` of ``arrays`` (an explicit dict, NOT **kwargs: a
    caller-controlled table could contain a key named "compressed" or
    "path" and silently bind the option instead of saving the array) to
    ``path`` atomically; returns the path written.

    Appends ``.npz`` when missing (matching np.savez's own behavior so
    callers keep their returned-path contract).  The temp file lives in
    the destination directory — ``os.replace`` must not cross
    filesystems."""
    if not path.endswith(".npz"):
        path += ".npz"
    tmp = path + ".tmp"
    try:
        # write through a file OBJECT: np.savez never appends a suffix to
        # an open file, so the replace source is exactly `tmp`
        with open(tmp, "wb") as f:
            (np.savez_compressed if compressed else np.savez)(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        # never leave a stray/partial temp next to the good snapshot
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise
    return path

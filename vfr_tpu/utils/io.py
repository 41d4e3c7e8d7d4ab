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

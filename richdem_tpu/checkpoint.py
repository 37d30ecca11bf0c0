"""Phase-granular checkpoint/resume.

The reference's only resilience mechanism is *restartability*: the
parallel programs evict tiles to ``--cache-dir`` as native ``.dat`` rasters
between phases, so a killed job can rerun a phase from disk (SURVEY.md
§5.3/5.4, ``Array2D::saveNative``/``loadNative``).  The TPU-native
equivalent here: every pipeline phase can persist its output raster(s) to
an ``.npy`` keyed by ``(grid_id, phase, shard)``; a rerun loads finished
phases and recomputes only what is missing.  Batch posture, exactly like
the reference: no in-flight failover, deterministic resume.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

__all__ = ["PhaseCache"]


class PhaseCache:
    """Disk cache of per-phase rasters.

    Layout: ``{root}/{grid_id}/{phase}[.s{shard}].npy`` plus a manifest
    ``meta.json`` recording completion times (a phase is only considered
    present once its write has been atomically renamed into place).
    """

    def __init__(self, root: str, grid_id: str = "grid"):
        self.root = root
        self.grid_id = grid_id
        self.dir = os.path.join(root, grid_id)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, phase: str, shard=None) -> str:
        name = phase if shard is None else f"{phase}.s{int(shard)}"
        return os.path.join(self.dir, f"{name}.npy")

    def _meta_path(self) -> str:
        return os.path.join(self.dir, "meta.json")

    def _meta(self) -> dict:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def has(self, phase: str, shard=None) -> bool:
        key = os.path.basename(self._path(phase, shard))
        return key in self._meta() and os.path.exists(
            self._path(phase, shard))

    def save(self, phase: str, array, shard=None) -> None:
        """Atomic write: tmp file + rename, then manifest update."""
        path = self._path(phase, shard)
        tmp = path + ".tmp.npy"  # .npy suffix stops np.save re-appending
        np.save(tmp, np.asarray(array))
        os.replace(tmp, path)
        meta = self._meta()
        meta[os.path.basename(path)] = {"t": time.time(),
                                        "shape": list(np.shape(array))}
        with open(self._meta_path(), "w") as f:
            json.dump(meta, f)

    def load(self, phase: str, shard=None) -> np.ndarray:
        return np.load(self._path(phase, shard))

    def run(self, phase: str, fn, shard=None):
        """Load ``phase`` if checkpointed, else compute ``fn()`` and
        persist it.  ``fn`` must return one array."""
        if self.has(phase, shard):
            return self.load(phase, shard)
        out = np.asarray(fn())
        self.save(phase, out, shard)
        return out

    def clear(self) -> None:
        for name in os.listdir(self.dir):
            os.remove(os.path.join(self.dir, name))

"""On-disk weight cache keyed by (mesh, grid, method).

The analog of persisting an ESMF route handle — the big rerun win the
reference lacks (SURVEY §5, checkpoint/resume row): weight generation is the
dominant setup cost (the RegridStore search, SURVEY §3.5), and MPASSIT runs
once per forecast hour on the SAME mesh/grid pair.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from .ell import ELLWeights


def grid_fingerprint(target_grid) -> str:
    h = hashlib.sha256()
    for a in (target_grid.lat, target_grid.lon, target_grid.lat_corner,
              target_grid.lon_corner):
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:16]


class WeightCache:
    def __init__(self, cache_dir: str):
        self.dir = cache_dir
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)

    def _path(self, mesh_fp: str, grid_fp: str, tag: str) -> str:
        return os.path.join(self.dir, f"w_{mesh_fp}_{grid_fp}_{tag}.npz")

    def get_or_build(self, tag: str, mesh_fp: str, grid_fp: str, builder):
        """Return cached ELLWeights for (mesh, grid, tag) or build + store."""
        if not self.dir:
            return builder()
        path = self._path(mesh_fp, grid_fp, tag)
        if os.path.exists(path):
            try:
                return ELLWeights.load(path)
            except Exception:
                pass  # corrupt cache entry: rebuild
        ell = builder()
        tmp = path[:-4] + ".tmp.npz"  # keep .npz suffix so savez doesn't append
        ell.save(tmp)
        os.replace(tmp, path)
        return ell

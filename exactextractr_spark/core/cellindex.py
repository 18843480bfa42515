"""H3/S2-style spatial cell index (pure arithmetic quadgrid).

No h3/s2 wheel exists in this environment, so we provide a deterministic
lat/lon (or planar) quad cell index with the same *mechanism* the north rule
requires: polygon/bbox -> covering cell set (for the candidate equi-join) and
ring expansion around a cell (for kNN search). It plays the role of the
reference's GEOS STRtree (raster_sequential_processor.cpp:31-36) re-expressed
as a distributable equi-join key.

Cell ids pack (res, ix, iy) into a signed int64:
    id = (res << 58) | (ix << 29) | iy      with 0 <= ix, iy < 2^res <= 2^28.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_MAX_RES = 28


@dataclass(frozen=True)
class CellIndex:
    """Quad index over a bounded world box. ``res`` r => 2^r x 2^r cells."""

    xmin: float = -180.0
    ymin: float = -90.0
    xmax: float = 180.0
    ymax: float = 90.0

    # --- scalar/vector encoding ------------------------------------------
    def n(self, res: int) -> int:
        return 1 << res

    def _steps(self, res: int) -> tuple[float, float]:
        n = self.n(res)
        return (self.xmax - self.xmin) / n, (self.ymax - self.ymin) / n

    def cell_of(self, x, y, res: int):
        """Vectorized: cell id containing (x, y)."""
        sx, sy = self._steps(res)
        n = self.n(res)
        ix = np.clip(np.floor((np.asarray(x) - self.xmin) / sx).astype(np.int64), 0, n - 1)
        iy = np.clip(np.floor((np.asarray(y) - self.ymin) / sy).astype(np.int64), 0, n - 1)
        return self.pack(res, ix, iy)

    @staticmethod
    def pack(res: int, ix, iy):
        return (np.int64(res) << 58) | (np.asarray(ix, np.int64) << 29) | np.asarray(
            iy, np.int64
        )

    @staticmethod
    def unpack(cid):
        cid = np.asarray(cid, np.int64)
        return (cid >> 58).astype(np.int64), (cid >> 29) & ((1 << 29) - 1), cid & (
            (1 << 29) - 1
        )

    # --- covers ------------------------------------------------------------
    def cover_bbox(self, xmin, ymin, xmax, ymax, res: int) -> np.ndarray:
        """All cell ids intersecting the bbox."""
        sx, sy = self._steps(res)
        n = self.n(res)
        ix0 = max(0, int(np.floor((xmin - self.xmin) / sx)))
        ix1 = min(n - 1, int(np.floor((xmax - self.xmin) / sx)))
        iy0 = max(0, int(np.floor((ymin - self.ymin) / sy)))
        iy1 = min(n - 1, int(np.floor((ymax - self.ymin) / sy)))
        if ix1 < ix0 or iy1 < iy0:
            return np.empty(0, np.int64)
        ix = np.arange(ix0, ix1 + 1, dtype=np.int64)
        iy = np.arange(iy0, iy1 + 1, dtype=np.int64)
        gx, gy = np.meshgrid(ix, iy, indexing="ij")
        return self.pack(res, gx.ravel(), gy.ravel())

    def cell_box(self, cid) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        res, ix, iy = self.unpack(cid)
        # vectorized over uniform res
        r = int(np.atleast_1d(res)[0])
        sx, sy = self._steps(r)
        return (
            self.xmin + ix * sx,
            self.ymin + iy * sy,
            self.xmin + (ix + 1) * sx,
            self.ymin + (iy + 1) * sy,
        )

    # --- ring expansion (kNN) ----------------------------------------------
    def ring(self, cid: int, k: int) -> np.ndarray:
        """Cells at Chebyshev distance exactly k (the H3 'hollow ring'
        analog); k=0 -> the cell itself."""
        res, ix, iy = (int(v) for v in self.unpack(np.int64(cid)))
        n = self.n(res)
        if k == 0:
            return np.array([cid], dtype=np.int64)
        out = []
        for dx in range(-k, k + 1):
            for dy in (-k, k):
                out.append((ix + dx, iy + dy))
        for dy in range(-k + 1, k):
            for dx in (-k, k):
                out.append((ix + dx, iy + dy))
        arr = np.array(out, dtype=np.int64)
        ok = (arr[:, 0] >= 0) & (arr[:, 0] < n) & (arr[:, 1] >= 0) & (arr[:, 1] < n)
        arr = arr[ok]
        return self.pack(res, arr[:, 0], arr[:, 1])

    def disk(self, cid: int, k: int) -> np.ndarray:
        """Cells at Chebyshev distance <= k (filled disk)."""
        res, ix, iy = (int(v) for v in self.unpack(np.int64(cid)))
        n = self.n(res)
        x0, x1 = max(0, ix - k), min(n - 1, ix + k)
        y0, y1 = max(0, iy - k), min(n - 1, iy + k)
        gx, gy = np.meshgrid(
            np.arange(x0, x1 + 1, dtype=np.int64),
            np.arange(y0, y1 + 1, dtype=np.int64),
            indexing="ij",
        )
        return self.pack(res, gx.ravel(), gy.ravel())

    def parent(self, cid: int) -> int:
        res, ix, iy = (int(v) for v in self.unpack(np.int64(cid)))
        if res == 0:
            return int(cid)
        return int(self.pack(res - 1, ix >> 1, iy >> 1))

    def children(self, cid: int) -> np.ndarray:
        res, ix, iy = (int(v) for v in self.unpack(np.int64(cid)))
        if res >= _MAX_RES:
            raise ValueError("max resolution reached")
        xs = np.array([2 * ix, 2 * ix + 1, 2 * ix, 2 * ix + 1], np.int64)
        ys = np.array([2 * iy, 2 * iy, 2 * iy + 1, 2 * iy + 1], np.int64)
        return self.pack(res + 1, xs, ys)

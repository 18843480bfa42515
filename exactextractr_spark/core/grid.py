"""Grid / Box primitives.

Semantics follow the reference grid model (``/root/reference/src/exactextract/
src/grid.h:37-331`` and ``box.h:25-147``): a grid is an extent box plus a
(dx, dy) resolution; rows are indexed from the TOP (row 0 has the highest y),
columns from the LEFT, matching the row-major raster layout of
``numeric_vector_raster.h:23-40``.

These are plain Python dataclasses — grid math is pure arithmetic done on the
driver or inside pandas UDFs; no distributed state.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

#: Default tolerance for origin alignment checks, as a fraction of cell size
#: (reference: ``grid_compat_tol=1e-3`` in R/exact_extract.R:286).
DEFAULT_COMPAT_TOL = 1e-3


@dataclass(frozen=True)
class Box:
    """Axis-aligned box (xmin, ymin, xmax, ymax). Ref: box.h:25-147."""

    xmin: float
    ymin: float
    xmax: float
    ymax: float

    @property
    def width(self) -> float:
        return self.xmax - self.xmin

    @property
    def height(self) -> float:
        return self.ymax - self.ymin

    @property
    def area(self) -> float:
        return self.width * self.height

    def intersects(self, other: "Box") -> bool:
        return (
            self.xmin <= other.xmax
            and self.xmax >= other.xmin
            and self.ymin <= other.ymax
            and self.ymax >= other.ymin
        )

    def intersection(self, other: "Box") -> "Box":
        return Box(
            max(self.xmin, other.xmin),
            max(self.ymin, other.ymin),
            min(self.xmax, other.xmax),
            min(self.ymax, other.ymax),
        )

    def contains(self, x: float, y: float) -> bool:
        return self.xmin <= x <= self.xmax and self.ymin <= y <= self.ymax

    @property
    def empty(self) -> bool:
        return self.xmin >= self.xmax or self.ymin >= self.ymax


@dataclass(frozen=True)
class Grid:
    """Regular grid: extent + resolution. Ref: grid.h:40-46.

    ``nrows``/``ncols`` are derived; row 0 = top band (ymax .. ymax-dy).
    """

    xmin: float
    ymin: float
    xmax: float
    ymax: float
    dx: float
    dy: float

    @property
    def nrows(self) -> int:
        return int(round((self.ymax - self.ymin) / self.dy))

    @property
    def ncols(self) -> int:
        return int(round((self.xmax - self.xmin) / self.dx))

    @property
    def size(self) -> int:
        return self.nrows * self.ncols

    @property
    def extent(self) -> Box:
        return Box(self.xmin, self.ymin, self.xmax, self.ymax)

    # --- row/col lookup (ref grid.h:99-128) -------------------------------
    def get_row(self, y: float) -> int:
        """Row containing y; y on a boundary belongs to the cell below it
        (reference convention: get_row uses floor on (ymax - y)/dy)."""
        r = int(math.floor((self.ymax - y) / self.dy))
        return min(max(r, 0), self.nrows - 1)

    def get_column(self, x: float) -> int:
        c = int(math.floor((x - self.xmin) / self.dx))
        return min(max(c, 0), self.ncols - 1)

    def col_x(self, col: int) -> float:
        """Left edge x of column."""
        return self.xmin + col * self.dx

    def row_y(self, row: int) -> float:
        """Top edge y of row."""
        return self.ymax - row * self.dy

    def cell_center(self, row: int, col: int) -> tuple[float, float]:
        return (
            self.xmin + (col + 0.5) * self.dx,
            self.ymax - (row + 0.5) * self.dy,
        )

    # --- crop / expand (ref grid.h:130-217, snap-consistent) ---------------
    def crop(self, box: Box) -> "Grid":
        """Shrink grid to the cells intersecting ``box``, preserving cell
        boundaries (snap-consistent shrink_to_fit, ref grid.h:138-217)."""
        b = self.extent.intersection(box)
        if b.empty:
            return Grid(self.xmin, self.ymax, self.xmin, self.ymax, self.dx, self.dy)
        c0 = int(math.floor((b.xmin - self.xmin) / self.dx + 1e-12))
        c1 = int(math.ceil((b.xmax - self.xmin) / self.dx - 1e-12))
        r0 = int(math.floor((self.ymax - b.ymax) / self.dy + 1e-12))
        r1 = int(math.ceil((self.ymax - b.ymin) / self.dy - 1e-12))
        c0 = max(0, min(c0, self.ncols))
        c1 = max(c0, min(c1, self.ncols))
        r0 = max(0, min(r0, self.nrows))
        r1 = max(r0, min(r1, self.nrows))
        return Grid(
            self.xmin + c0 * self.dx,
            self.ymax - r1 * self.dy,
            self.xmin + c1 * self.dx,
            self.ymax - r0 * self.dy,
            self.dx,
            self.dy,
        )

    def row_col_offset(self, other: "Grid") -> tuple[int, int]:
        """(row, col) offset of ``other``'s top-left cell within self."""
        return (
            int(round((self.ymax - other.ymax) / self.dy)),
            int(round((other.xmin - self.xmin) / self.dx)),
        )

    # --- compatibility / common grid (ref grid.h:219-282) ------------------
    def compatible_with(self, other: "Grid", tol: float = DEFAULT_COMPAT_TOL) -> bool:
        """True if one grid's resolution is an integer multiple of the
        other's and origins align within ``tol`` of the finer cell size."""
        if self.size == 0 or other.size == 0:
            return True
        for a, b in ((self.dx, other.dx), (self.dy, other.dy)):
            big, small = (a, b) if a > b else (b, a)
            ratio = big / small
            if abs(ratio - round(ratio)) > tol:
                return False
        fdx = min(self.dx, other.dx)
        fdy = min(self.dy, other.dy)
        if abs((self.xmin - other.xmin) / fdx - round((self.xmin - other.xmin) / fdx)) > tol:
            return False
        if abs((self.ymax - other.ymax) / fdy - round((self.ymax - other.ymax) / fdy)) > tol:
            return False
        return True

    def common_grid(self, other: "Grid", tol: float = DEFAULT_COMPAT_TOL) -> "Grid":
        """Finest common grid covering both extents (ref grid.h:244-282)."""
        if not self.compatible_with(other, tol):
            raise ValueError("grids are not compatible")
        if self.size == 0:
            return other
        if other.size == 0:
            return self
        dx = min(self.dx, other.dx)
        dy = min(self.dy, other.dy)
        # snap the union extent to the finer grid whose origin we keep
        fine = self if (self.dx <= other.dx) else other
        xmin = fine.xmin - math.ceil((fine.xmin - min(self.xmin, other.xmin)) / dx) * dx
        xmax = fine.xmax + math.ceil((max(self.xmax, other.xmax) - fine.xmax) / dx) * dx
        ymin = fine.ymin - math.ceil((fine.ymin - min(self.ymin, other.ymin)) / dy) * dy
        ymax = fine.ymax + math.ceil((max(self.ymax, other.ymax) - fine.ymax) / dy) * dy
        return Grid(xmin, ymin, xmax, ymax, dx, dy)

    # --- subdivide (ref grid.cpp:74-99) ------------------------------------
    def subdivide(self, max_cells: int) -> list["Grid"]:
        """Split into row-band subgrids of at most ``max_cells`` cells
        (row bands first, then column splits if a single row is too wide)."""
        if self.size <= max_cells:
            return [self]
        rows_per_band = max(1, max_cells // max(self.ncols, 1))
        out: list[Grid] = []
        for r0 in range(0, self.nrows, rows_per_band):
            r1 = min(r0 + rows_per_band, self.nrows)
            band = Grid(
                self.xmin,
                self.ymax - r1 * self.dy,
                self.xmax,
                self.ymax - r0 * self.dy,
                self.dx,
                self.dy,
            )
            if band.size <= max_cells:
                out.append(band)
            else:
                cols_per = max(1, max_cells)
                for c0 in range(0, self.ncols, cols_per):
                    c1 = min(c0 + cols_per, self.ncols)
                    out.append(
                        Grid(
                            self.xmin + c0 * self.dx,
                            band.ymin,
                            self.xmin + c1 * self.dx,
                            band.ymax,
                            self.dx,
                            self.dy,
                        )
                    )
        return out

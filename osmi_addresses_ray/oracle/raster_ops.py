"""Naive oracle for the raster→vector operator (4-connected components).

Plain BFS flood fill over a python set — a different algorithm family than
the engine's vectorized min-pooling union-find, converging on the same
canonical labels (component id = min linear cell index)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def label_components(cells: list[tuple[int, int]]) -> pd.DataFrame:
    todo = set(cells)
    rows = []
    while todo:
        start = todo.pop()
        comp_cells = [start]
        frontier = [start]
        while frontier:
            cx, cy = frontier.pop()
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nb = (cx + dx, cy + dy)
                if nb in todo:
                    todo.remove(nb)
                    comp_cells.append(nb)
                    frontier.append(nb)
        # canonical id = min biased linear index (matches raster.lin_index;
        # 2^30 bias + 2^31 multiplier stays injective for negative indices
        # without overflowing int64)
        comp_id = min(
            (ix + (1 << 30)) * (1 << 31) + (iy + (1 << 30)) for ix, iy in comp_cells
        )
        for ix, iy in comp_cells:
            rows.append({"ix": ix, "iy": iy, "comp": comp_id})
    out = pd.DataFrame(rows, columns=["ix", "iy", "comp"])
    return out.astype(np.int64) if len(out) else out


def rasterize_cells(lon: np.ndarray, lat: np.ndarray, x0: float, y0: float, res: float):
    ix = np.floor((np.asarray(lon) - x0) / res).astype(np.int64)
    iy = np.floor((np.asarray(lat) - y0) / res).astype(np.int64)
    return ix, iy

"""Point-in-polygon over packed coordinate arrays — vectorized numpy kernel.

Geometry representation (SURVEY.md §1.2): a ring is a packed double array
[x0, y0, x1, y1, ..., xn, yn]; a polygon is {outer: ring, inners: [ring...]}.
This replaces the PostGIS ST_Contains/ST_Within calls the reference delegates
to Postgres.

Algorithm: even-odd ray casting (ray toward +x). Points exactly on an edge
follow the half-open convention (lower endpoint inclusive), which makes
cell-partitioned evaluation consistent — a point on a shared edge lands in
exactly one polygon of a partition.
"""

from __future__ import annotations

import numpy as np


def ring_contains(ring: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Even-odd test of N points against one packed ring.

    ring: float64[2k] packed [x0,y0,...]; closing edge is implicit (the
    kernel wraps), so both closed and unclosed rings work.
    px, py: float64[N]. Returns bool[N].

    Vectorized over points x edges: O(N*E) numpy ops, no Python loop over
    points. Polygon sets are broadcast per-partition, so E is bounded by the
    polygon corpus, N by the Arrow batch.
    """
    xs = ring[0::2]
    ys = ring[1::2]
    if len(xs) >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    n = len(xs)
    if n < 3:
        return np.zeros(px.shape, dtype=bool)
    x1, y1 = xs, ys
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)

    px_ = px[:, None]
    py_ = py[:, None]
    # edge straddles the horizontal line through the point (half-open)
    straddle = (y1[None, :] > py_) != (y2[None, :] > py_)
    # x coordinate of the edge at py; slope is finite wherever straddle holds
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (py_ - y1[None, :]) / (y2[None, :] - y1[None, :])
        xint = x1[None, :] + t * (x2[None, :] - x1[None, :])
    crossings = (straddle & (px_ < xint)).sum(axis=1)
    return (crossings % 2).astype(bool)


def polygon_contains(
    outer: np.ndarray, inners: list[np.ndarray], px: np.ndarray, py: np.ndarray
) -> np.ndarray:
    """Outer ring minus holes."""
    inside = ring_contains(outer, px, py)
    for hole in inners:
        inside &= ~ring_contains(hole, px, py)
    return inside


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    xs = ring[0::2]
    ys = ring[1::2]
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


class PolygonSet:
    """A broadcastable polygon corpus with a grid spatial index.

    Built driver-side from a collected polygon DataFrame, shipped to
    executors via sc.broadcast — the "broadcast R-tree" path of the north
    rule, realized as a uniform grid (hash index on cell -> polygon list):
    per-batch cost is O(points + candidate pairs) instead of O(points x
    polygons). Small corpora (< INDEX_THRESHOLD) skip the index and use a
    plain vectorized bbox scan. The cell-prefix sort-merge path in
    operators/spatial_join.py covers corpora too large to broadcast.
    """

    INDEX_THRESHOLD = 64

    def __init__(self, ids: list, outers: list[np.ndarray], inners: list[list[np.ndarray]]):
        self.ids = np.asarray(ids)
        self.outers = [np.asarray(o, np.float64) for o in outers]
        self.inners = [[np.asarray(h, np.float64) for h in hs] for hs in inners]
        if self.outers:
            self.bboxes = np.array([ring_bbox(o) for o in self.outers])
        else:
            self.bboxes = np.zeros((0, 4))
        self.grid: dict[tuple[int, int], np.ndarray] | None = None
        self.cell_size: float = 0.0
        if len(self.outers) > self.INDEX_THRESHOLD:
            self._build_grid()

    def _build_grid(self) -> None:
        spans = np.maximum(
            self.bboxes[:, 2] - self.bboxes[:, 0], self.bboxes[:, 3] - self.bboxes[:, 1]
        )
        # cell ~ median polygon span: most polygons cover O(1) cells
        self.cell_size = max(float(np.median(spans)), 1e-6)
        buckets: dict[tuple[int, int], list[int]] = {}
        inv = 1.0 / self.cell_size
        for k in range(len(self.outers)):
            minx, miny, maxx, maxy = self.bboxes[k]
            for cx in range(int(np.floor(minx * inv)), int(np.floor(maxx * inv)) + 1):
                for cy in range(int(np.floor(miny * inv)), int(np.floor(maxy * inv)) + 1):
                    buckets.setdefault((cx, cy), []).append(k)
        self.grid = {c: np.asarray(v, np.int64) for c, v in buckets.items()}

    def _match_scan(self, px: np.ndarray, py: np.ndarray, poly_idx=None):
        out_pt: list[np.ndarray] = []
        out_id: list[np.ndarray] = []
        candidates = range(len(self.outers)) if poly_idx is None else poly_idx
        for k in candidates:
            minx, miny, maxx, maxy = self.bboxes[k]
            cand = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            hit = polygon_contains(self.outers[k], self.inners[k], px[idx], py[idx])
            hit_idx = idx[hit]
            if hit_idx.size:
                out_pt.append(hit_idx)
                out_id.append(np.full(hit_idx.shape, self.ids[k]))
        if not out_pt:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=self.ids.dtype)
        return np.concatenate(out_pt), np.concatenate(out_id)

    def match(self, px: np.ndarray, py: np.ndarray):
        """For N points return (point_idx, polygon_id) match pairs
        (a point may fall in several overlapping polygons).

        r08 restructure (~2.5x, pair sets identical): the cell loop only
        ACCUMULATES candidate point groups per polygon; the bbox cull and
        ray cast then run once per polygon over all its candidates. The
        old shape evaluated per (cell, polygon) — thousands of tiny numpy
        calls whose fixed overhead dominated the math."""
        if self.grid is None:
            return self._match_scan(px, py)
        inv = 1.0 / self.cell_size
        cx = np.floor(px * inv).astype(np.int64)
        cy = np.floor(py * inv).astype(np.int64)
        # group points by grid cell; collect each cell-bucket polygon's
        # candidate group
        order = np.lexsort((cy, cx))
        cxs, cys = cx[order], cy[order]
        boundaries = np.nonzero((np.diff(cxs) != 0) | (np.diff(cys) != 0))[0] + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(order)]])
        per_poly: dict[int, list[np.ndarray]] = {}
        for s, e in zip(starts, ends):
            polys = self.grid.get((int(cxs[s]), int(cys[s])))
            if polys is None:
                continue
            grp = order[s:e]
            for k in polys:
                per_poly.setdefault(int(k), []).append(grp)
        out_pt: list[np.ndarray] = []
        out_id: list[np.ndarray] = []
        for k, grps in per_poly.items():
            idx = np.concatenate(grps) if len(grps) > 1 else grps[0]
            minx, miny, maxx, maxy = self.bboxes[k]
            x, y = px[idx], py[idx]
            cand = (x >= minx) & (x <= maxx) & (y >= miny) & (y <= maxy)
            if not cand.any():
                continue
            idx = idx[cand]
            hit = polygon_contains(self.outers[k], self.inners[k], px[idx], py[idx])
            hit_idx = idx[hit]
            if hit_idx.size:
                out_pt.append(hit_idx)
                out_id.append(np.full(hit_idx.shape, self.ids[k]))
        if not out_pt:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=self.ids.dtype)
        return np.concatenate(out_pt), np.concatenate(out_id)

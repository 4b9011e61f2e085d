"""Property-based tests (hypothesis) — the reference uses scalacheck for
its schema/summary laws (SURVEY.md §5 tier 3); here the properties cover
the decode/geometry/indexing contracts."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fs2_osm_spark.functions.geom_ops import line_length_m, simplify_dp
from fs2_osm_spark.functions.hex import hex_cell_np, hex_center_np
from fs2_osm_spark.functions.s2 import s2_cell_np, s2_level, s2_parent
from fs2_osm_spark.operators.assembly import _stitch_rings
from fs2_osm_spark.sources.dense_decode import decode_dense_block_np

coord = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
lat_c = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False)


@given(st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_delta_decode_inverts_delta_encode(values):
    """cumsum(diff-prefix encoding) == original ids, any sequence."""
    arr = np.asarray(values, np.int64)
    deltas = np.diff(arr, prepend=0)
    out = decode_dense_block_np(
        ids=deltas, lats=np.zeros_like(deltas), lons=np.zeros_like(deltas),
        keys_vals=[], string_table=[""],
    )
    assert out["osm_id"].tolist() == values


@given(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.integers(min_value=1, max_value=1000),
    st.integers(min_value=-(10**9), max_value=10**9),
)
@settings(max_examples=100, deadline=None)
def test_coordinate_scaling_formula(raw, granularity, offset):
    out = decode_dense_block_np(
        ids=[1], lats=[raw], lons=[raw], keys_vals=[], string_table=[""],
        granularity=granularity, lat_offset=offset, lon_offset=offset,
    )
    expect = 1e-9 * (offset + granularity * raw)
    assert out["lat"].iloc[0] == expect
    assert out["lon"].iloc[0] == expect


@given(st.lists(st.tuples(coord, lat_c), min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_hex_center_fixpoint(points):
    """hex_cell(center(cell)) == cell for any point's cell (res 5-9)."""
    lon = np.array([p[0] for p in points])
    lat = np.array([p[1] for p in points])
    for res in (5, 7, 9):
        cells = hex_cell_np(lon, lat, res)
        clon, clat = hex_center_np(cells)
        assert (hex_cell_np(clon, clat, res) == cells).all()


@given(st.lists(st.tuples(coord, lat_c), min_size=1, max_size=20),
       st.integers(min_value=1, max_value=29))
@settings(max_examples=60, deadline=None)
def test_s2_parent_is_prefix(points, level):
    lon = np.array([p[0] for p in points])
    lat = np.array([p[1] for p in points])
    leaf = s2_cell_np(lon, lat, 30)
    parent = s2_parent(leaf, level)
    assert (s2_level(parent) == level).all()
    # parent of parent at coarser level == direct parent at that level
    coarser = max(1, level // 2)
    assert (s2_parent(parent, coarser) == s2_parent(leaf, coarser)).all()


@given(
    st.lists(st.tuples(coord, lat_c), min_size=4, max_size=12, unique=True),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=60, deadline=None)
def test_stitch_reassembles_split_ring(points, n_cuts):
    """Any simple closed ring, split into consecutive segments with random
    orientations, stitches back to one closed ring with the same vertex
    multiset. Vertices must be distinct under the engine's 1e-6 quantized
    equality (Coordinate.scala contract) — two vertices quantizing equal ARE
    the same point to the stitcher, by design."""
    from hypothesis import assume

    quantized = {(int(x * 1e6), int(y * 1e6)) for x, y in points}
    assume(len(quantized) == len(points))
    ring = np.array(points + [points[0]])  # closed
    n = len(ring)
    cuts = sorted({1 + (i * (n - 2)) // (n_cuts + 1) for i in range(1, n_cuts + 1)})
    bounds = [0, *cuts, n - 1]
    segs = []
    for i in range(len(bounds) - 1):
        seg = ring[bounds[i] : bounds[i + 1] + 1]
        if len(seg) < 2:
            continue
        if i % 2 == 1:
            seg = seg[::-1]  # flip alternating segments
        segs.append(seg.ravel())
    rings = _stitch_rings(segs)
    assert len(rings) == 1
    out = rings[0].reshape(-1, 2)
    assert (out[0] == out[-1]).all()
    # same vertex multiset (ignoring closure duplicates and direction)
    want = {tuple(np.round(p, 9)) for p in ring}
    got = {tuple(np.round(p, 9)) for p in out}
    assert got == want


@given(st.lists(st.tuples(coord, lat_c), min_size=2, max_size=40),
       st.floats(min_value=1e-6, max_value=1.0))
@settings(max_examples=60, deadline=None)
def test_simplify_never_longer_and_keeps_endpoints(points, tol):
    line = np.array(points).ravel()
    simp = simplify_dp(line, tol)
    assert len(simp) <= len(line)
    assert simp[0] == line[0] and simp[1] == line[1]
    assert simp[-2] == line[-2] and simp[-1] == line[-1]
    assert line_length_m(simp) <= line_length_m(line) + 1e-6

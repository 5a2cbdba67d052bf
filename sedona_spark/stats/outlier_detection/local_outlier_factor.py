"""Reference-parity LOF spelling
(``stats/outlierDetection/LocalOutlierFactor.scala``, python wrapper
``python/sedona/spark/stats/outlier_detection/local_outlier_factor.py``).
Delegates to ``operators/outlier.py`` (kNN-join based, exact)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from sedona_spark.operators.outlier import local_outlier_factor as _lof


def local_outlier_factor(
    dataframe: DataFrame,
    k: int = 20,
    geometry=None,
    handle_ties: bool = False,
    use_spheroid: bool = False,
    result_column_name: str = "lof",
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    if use_spheroid:
        raise NotImplementedError(
            "use_spheroid: planar distances only — see operators/knn.py "
            "spheroid kNN for the geodesic path")
    if geometry is not None:
        raise NotImplementedError(
            "geometry-column sniffing: pass x=/y=/id_col= column names")
    if handle_ties:
        raise NotImplementedError(
            "handle_ties: the operator's kNN uses a total (dist, id) "
            "order, so ties are already deterministic")
    out = _lof(dataframe, k=k, id_col=id_col, x=x, y=y)
    if result_column_name != "lof":
        out = out.withColumnRenamed("lof", result_column_name)
    # reference parity: the result is the ORIGINAL dataframe plus the
    # lof column (the operator returns only (id, lof))
    return dataframe.join(out, id_col)

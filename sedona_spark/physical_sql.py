"""SQL entry points for the reference's *physical* functions.

Reference surface: ``Catalog.scala:30-329`` registers ST_DBSCAN, ST_KNN,
ST_GLocal, ST_LocalOutlierFactor, ST_BinaryDistanceBandColumn and
ST_WeightedDistanceBandColumn as analyzer stubs that
``ExtractPhysicalFunctions`` / ``EvalPhysicalFunctionStrategy``
(``spark/common/src/main/scala/org/apache/sedona/sql``) rewrite into
whole-plan physical operators — they cannot be evaluated row-at-a-time,
so a plain ``spark.udf.register`` cannot carry them. :func:`sql` is the
PySpark analog of that logical-plan rewrite, done at statement level:

1. scan the statement for physical-function calls (paren-aware, case-
   insensitive);
2. run the corresponding distributed DataFrame operator
   (``operators/dbscan.py``, ``knn.py``, ``hotspot.py``, ``outlier.py``,
   ``weighting.py``) over the statement's source table;
3. bind base-table-plus-result as a temp view, replace each call with the
   operator's output column, and hand the rewritten text to
   ``spark.sql`` — so everything AROUND the physical call (projections,
   filters, aggregates, field access like ``.cluster``) stays ordinary
   Catalyst SQL.

Spelling deviation from the reference (documented, engine-model-driven):
the engine's point model is planar ``(x, y)`` DOUBLE columns rather than
a GEOMETRY blob, and results attach by key, so each call names the
id/x/y columns explicitly:

* ``ST_DBSCAN(id, x, y, eps, minPts)`` →
  ``struct<isCore boolean, cluster bigint>`` (DBSCAN.scala output shape);
* ``ST_GLocal(id, x, y, val, radius)`` →
  ``struct<n_band, band_sum, g_star>`` — the reference composes
  ST_*DistanceBandColumn + ST_GLocal(x, weights, star); the engine fuses
  the band build and the statistic (``hotspot.getis_ord_gstar``), so one
  call carries both halves;
* ``ST_LocalOutlierFactor(id, x, y, k)`` → ``double``;
* ``ST_BinaryDistanceBandColumn(id, x, y, threshold)`` and
  ``ST_WeightedDistanceBandColumn(id, x, y, threshold, alpha)`` →
  ``array<struct<neighbor_id, weight>>`` sorted by neighbor id;
* join form  ``FROM <queries> JOIN <objects> ON
  ST_KNN(<qid>, <qx>, <qy>, <ox>, <oy>, k)`` → the exact kNN join
  (``operators/knn.py``), yielding query columns + object columns +
  ``dist_sq`` + ``knn_rank``.

Every rewrite keeps the operator's 100 TB shape (cell-blocked joins,
salting, bounded heaps) — the SQL layer adds no driver-side work beyond
the text rewrite itself.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PHYSICAL_FUNCTIONS = (
    "ST_DBSCAN",
    "ST_KNN",
    "ST_GLocal",
    "ST_LocalOutlierFactor",
    "ST_BinaryDistanceBandColumn",
    "ST_WeightedDistanceBandColumn",
)

_CALL_RE = re.compile(
    r"\b(" + "|".join(PHYSICAL_FUNCTIONS) + r")\s*\(", re.IGNORECASE
)
_FROM_RE = re.compile(r"\bfrom\s+([A-Za-z_][\w.]*)", re.IGNORECASE)
_KNN_JOIN_RE = re.compile(
    r"\bfrom\s+([A-Za-z_][\w.]*)\s+join\s+([A-Za-z_][\w.]*)\s+on\s+"
    r"st_knn\s*\(",
    re.IGNORECASE,
)


def _match_paren(text: str, open_idx: int) -> int:
    """Index just past the ``)`` matching ``text[open_idx] == '('``."""
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced parentheses in physical function call")


def _split_args(arg_text: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in arg_text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def _num(tok: str) -> float:
    return float(tok)


def _dispatch(
    name: str, args: list[str], base: DataFrame, out_col: str
) -> tuple[DataFrame, str]:
    """Run the operator for one scalar-form call; returns (result keyed by
    the id column, id column name). The result carries exactly (id,
    out_col)."""
    lname = name.lower()
    if lname == "st_dbscan":
        from sedona_spark.operators.dbscan import dbscan

        idc, x, y = args[0], args[1], args[2]
        res = dbscan(
            base.select(idc, x, y), eps=_num(args[3]),
            min_pts=int(_num(args[4])), id_col=idc, x=x, y=y,
        )
        return (
            res.select(
                idc,
                F.struct(
                    F.col("is_core").alias("isCore"),
                    F.col("cluster").cast("long").alias("cluster"),
                ).alias(out_col),
            ),
            idc,
        )
    if lname == "st_glocal":
        from sedona_spark.operators.hotspot import getis_ord_gstar

        idc, x, y, val = args[0], args[1], args[2], args[3]
        res = getis_ord_gstar(
            base.select(idc, x, y, val), radius=_num(args[4]),
            value_col=val, id_col=idc, x=x, y=y,
        )
        return (
            res.select(
                idc,
                F.struct(
                    F.col("n_band"),
                    F.col("band_sum").cast("long").alias("band_sum"),
                    F.col("g_star"),
                ).alias(out_col),
            ),
            idc,
        )
    if lname == "st_localoutlierfactor":
        from sedona_spark.operators.outlier import local_outlier_factor

        idc, x, y = args[0], args[1], args[2]
        res = local_outlier_factor(
            base.select(idc, x, y), k=int(_num(args[3])),
            id_col=idc, x=x, y=y,
        )
        return res.select(idc, F.col("lof").alias(out_col)), idc
    if lname in ("st_binarydistancebandcolumn",
                 "st_weighteddistancebandcolumn"):
        from sedona_spark.operators.weighting import add_distance_band_column

        idc, x, y = args[0], args[1], args[2]
        binary = lname == "st_binarydistancebandcolumn"
        # binary bands include zero-distance neighbors, matching the
        # add_binary_distance_band_column wrapper (Weighting.scala:194-211)
        res = add_distance_band_column(
            base.select(idc, x, y), threshold=_num(args[3]), binary=binary,
            alpha=-1.0 if binary else _num(args[4]),
            include_zero=binary,
            id_col=idc, x=x, y=y, result_name=out_col,
        )
        return res.select(idc, out_col), idc
    raise ValueError(f"unknown physical function {name}")


def _rewrite_knn_join(spark: SparkSession, text: str, view: str) -> str:
    """Rewrite ``FROM q JOIN o ON ST_KNN(qid, qx, qy, ox, oy, k)`` into a
    scan of the materialized kNN-join view."""
    m = _KNN_JOIN_RE.search(text)
    if not m:
        return text
    from sedona_spark.operators.knn import knn_join

    open_idx = m.end() - 1
    close = _match_paren(text, open_idx)
    args = _split_args(text[open_idx + 1:close - 1])
    qid, qx, qy, ox, oy = args[:5]
    k = int(_num(args[5]))
    res = knn_join(
        spark.table(m.group(1)), spark.table(m.group(2)), k=k,
        query_id=qid, qx=qx, qy=qy, obj_x=ox, obj_y=oy,
    )
    res.createOrReplaceTempView(view)
    return text[:m.start()] + f"from {view}" + text[close:]


def sql(spark: SparkSession, text: str) -> DataFrame:
    """Execute a SQL statement that may contain physical-function calls
    (see module docstring for the supported spellings). Statements with
    no physical call pass straight through to ``spark.sql``."""
    text = _rewrite_knn_join(spark, text, "__phys_knn")
    n = 0
    # Each rewrite replaces the FROM table with a composite view
    # (base LEFT JOIN operator result). Later operators must still run
    # over the ORIGINAL base — feeding them the composite would re-embed
    # every earlier operator's job (DBSCAN's iterative components, the
    # band self-joins) into each successive input plan, compounding the
    # statement's cost quadratically in the number of physical calls.
    #
    # Phase 1 (sequential): parse + rewrite the TEXT, resolving each
    # call's base table symbolically (a later call's FROM is an earlier
    # call's view; its base is that view's base). No operator runs here.
    originals: dict[str, str] = {}
    specs: list[tuple[str, list[str], str, str]] = []  # (fn, args, src, out)
    while True:
        m = _CALL_RE.search(text)
        if m is None:
            break
        fm = _FROM_RE.search(text, _match_paren(text, m.end() - 1))
        if fm is None:  # physical call after the last FROM: search whole
            fm = _FROM_RE.search(text)
        if fm is None:
            raise ValueError("physical function call needs a FROM table")
        src = fm.group(1)
        base_name = originals.get(src, src)
        open_idx = m.end() - 1
        close = _match_paren(text, open_idx)
        args = _split_args(text[open_idx + 1:close - 1])
        out_col = f"__phys{n}"
        view = f"__phys_view{n}"
        originals[view] = base_name
        specs.append((m.group(1), args, src, out_col))
        # swap the source for the view FIRST, splicing at the exact FROM
        # located above (a textual re.sub could hit an earlier "from src"
        # inside a scalar subquery), then the call for its result column
        # (ALL textually identical occurrences — repeated field accesses
        # like .isCore/.cluster run the operator once)
        call_text = text[m.start():close]
        text = text[:fm.start()] + f"from {view}" + text[fm.end():]
        text = text.replace(call_text, out_col)
        n += 1

    if specs:
        # Phase 2 (concurrent): the physical operators are independent —
        # dispatch them from a small thread pool so one operator's
        # driver-side iteration (DBSCAN's rounds) back-fills executors
        # with another operator's stages instead of serializing the
        # statement (guide §2.6 "overlap independent jobs"). Job
        # descriptions are thread-local, so the UI stays labelled.
        from concurrent.futures import ThreadPoolExecutor

        bases = [spark.table(originals[f"__phys_view{i}"])
                 for i in range(len(specs))]

        def run_i(i):
            fn_name, args, _src, out_col = specs[i]
            return _dispatch(fn_name, args, bases[i], out_col)

        with ThreadPoolExecutor(max_workers=min(4, len(specs))) as pool:
            results = list(pool.map(run_i, range(len(specs))))

        # Phase 3 (sequential): compose the view chain in order.
        for i, ((res, idc), spec) in enumerate(zip(results, specs)):
            composite = spark.table(spec[2])
            composite.join(res, idc, "left").createOrReplaceTempView(
                f"__phys_view{i}")
    return spark.sql(text)

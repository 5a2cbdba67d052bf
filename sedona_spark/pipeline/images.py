"""Training-tensor preparation over the image+caption table.

The graft's input table (BASELINE.json input_hint) is ``(image_id,
bytes, w, h, fmt, caption, phash)``; the ops a vision-training pipeline
runs between "curated images" and "GPU batches" are:

* :func:`tensorize` — decode → nearest-neighbor resize to a fixed
  square → per-channel normalize → CHW float32 tensor bytes (the
  torchvision ``Resize + ToTensor + Normalize`` stack, re-expressed as
  one Arrow-batched pass).
* :func:`aspect_buckets` — aspect-ratio bucketing + deterministic
  batch assembly (the bucketed-batch trick SDXL-style trainers use so
  a batch shares one shape and nothing is cropped to death).
* :func:`patchify_sums` — ViT-style non-overlapping patch grid with
  exact per-patch pixel sums (patch-level stats feed masking/dedup
  heuristics).
* :func:`channel_stats` — dataset per-channel mean/variance (the
  normalization constants every training run pins first).

100 TB shape: every op is a single ``mapInPandas`` pass over the bytes
column (Arrow batches, no per-row Python) or pure Column arithmetic;
the only shuffles are the one-key groupBy in :func:`channel_stats`
(map-side partial aggregation — executors emit 3 rows each) and the
bucket window in :func:`aspect_buckets` (see its docstring for the
at-scale variant). Decoded pixels never leave the executor — only
fixed-width stats and the requested tensor bytes do.

Reference frame: the reference engine stops at raster band math
(``RasterBandAccessors.java``); the tensor/batch stage is the
beyond-reference pipeline tier this repo adds (SURVEY §2 "LLM-data
pipeline" row).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ImageNet normalization constants — the de-facto default for vision
# encoders; callers override per model family.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _nn_index(dst: int, src: int) -> np.ndarray:
    """Nearest-neighbor source indices (floor mapping ``d*src//dst`` —
    exact integer arithmetic, so a SQL oracle reproduces it verbatim)."""
    return (np.arange(dst, dtype=np.int64) * src) // dst


def tensorize(
    df: DataFrame,
    size: int = 32,
    mean: tuple[float, float, float] = IMAGENET_MEAN,
    std: tuple[float, float, float] = IMAGENET_STD,
    keep_tensor: bool = True,
) -> DataFrame:
    """Decode → resize(size×size, nearest) → normalize → CHW float32.

    Output: ``image_id``, ``tensor`` (binary, 3·size²·4 bytes, C-order
    CHW) when ``keep_tensor``, plus exact ``c{0,1,2}_sum`` (int64 sum of
    the SAMPLED decoded uint8s per channel — the value-oracle columns)
    and ``norm_mean_{0,1,2}`` (channel mean of the normalized tensor,
    derived from the exact sum with the same IEEE op sequence an oracle
    uses: ``sum/(size²·255) - mean`` then ``/std``).

    One ``mapInPandas`` pass; nothing shuffles. At 100 TB the tensor
    column dominates output bytes (12 KiB/row at 32²) — write it
    partitioned by the downstream sampler's key so batch assembly reads
    sequentially.
    """
    from sedona_spark.sources.images import decode_image

    n2 = size * size
    out_schema = ("image_id string" +
                  (", tensor binary" if keep_tensor else "") +
                  ", c0_sum long, c1_sum long, c2_sum long, "
                  "norm_mean_0 double, norm_mean_1 double, "
                  "norm_mean_2 double")
    mean_a = np.asarray(mean, dtype=np.float32)
    std_a = np.asarray(std, dtype=np.float32)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for iid, buf in zip(b["image_id"], b["bytes"]):
                arr, _fmt = decode_image(bytes(buf))
                h, w, _c = arr.shape
                samp = arr[np.ix_(_nn_index(size, h), _nn_index(size, w))]
                sums = samp.astype(np.int64).sum(axis=(0, 1))
                if keep_tensor:
                    t = (samp.astype(np.float32) / np.float32(255.0)
                         - mean_a) / std_a
                    t = np.ascontiguousarray(t.transpose(2, 0, 1))  # CHW
                nm = [
                    (float(sums[c]) / (n2 * 255.0) - float(mean[c]))
                    / float(std[c])
                    for c in range(3)
                ]
                row = [iid]
                if keep_tensor:
                    row.append(t.tobytes())
                recs.append(row + [int(sums[0]), int(sums[1]),
                                   int(sums[2]), nm[0], nm[1], nm[2]])
            cols = ["image_id"] + (["tensor"] if keep_tensor else []) + [
                "c0_sum", "c1_sum", "c2_sum",
                "norm_mean_0", "norm_mean_1", "norm_mean_2"]
            yield pd.DataFrame(recs, columns=cols)

    return df.select("image_id", "bytes").mapInPandas(run, out_schema)


def aspect_buckets(
    df: DataFrame,
    batch_size: int = 8,
) -> DataFrame:
    """Aspect-ratio bucketing + deterministic batch assembly.

    Bucket key = ``(w·1000) div h`` (exact integer ratio class — images
    in one bucket share a shape family, so a training batch needs no
    destructive center-crop). Within each bucket rows are ranked by
    ``image_id`` and sliced into batches of ``batch_size``; the result
    is one row per (bucket, batch) with its size and id span — the
    manifest a loader shards by.

    Pure Column + one window. The ``row_number`` per bucket is a
    per-bucket sort: fine while each bucket fits one task's spill
    budget. At 100 TB, salt the window key with the input partition id
    (batches only need to be *within-bucket uniform*, not globally
    ordered) — same output contract, bucket-sized sorts become
    partition-sized.
    """
    bucket = F.expr("w * 1000 div h").alias("bucket_id")
    w = Window.partitionBy("bucket_id").orderBy("image_id")
    rows = (
        df.select("image_id", bucket)
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "batch_id", F.expr(f"(rn - 1) div {int(batch_size)}"))
    )
    return rows.groupBy("bucket_id", "batch_id").agg(
        F.count("*").alias("n_images"),
        F.min("image_id").alias("first_id"),
        F.max("image_id").alias("last_id"),
    )


def patchify_sums(df: DataFrame, patch: int = 16) -> DataFrame:
    """ViT-style non-overlapping ``patch×patch`` grid: one row per
    (image, patch) with the exact int64 pixel sum across channels.
    Requires ``w % patch == h % patch == 0`` (raise otherwise — a real
    pipeline resizes first via :func:`tensorize`).

    One ``mapInPandas`` pass, no shuffle; output is (w·h)/patch² rows
    per image — the fan-out is bounded and columnar.
    """
    from sedona_spark.sources.images import decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, pxs, pys, sums = [], [], [], []
            for iid, buf in zip(b["image_id"], b["bytes"]):
                arr, _fmt = decode_image(bytes(buf))
                h, w, c = arr.shape
                if h % patch or w % patch:
                    raise ValueError(
                        f"patchify_sums: {iid} is {w}x{h}, not a "
                        f"multiple of {patch} — resize first")
                gy, gx = h // patch, w // patch
                s = (arr.astype(np.int64)
                     .reshape(gy, patch, gx, patch, c)
                     .sum(axis=(1, 3, 4)))  # (gy, gx)
                yy, xx = np.mgrid[0:gy, 0:gx]
                ids.extend([iid] * (gy * gx))
                pys.extend(yy.ravel().tolist())
                pxs.extend(xx.ravel().tolist())
                sums.extend(s.ravel().tolist())
            yield pd.DataFrame(
                {"image_id": ids, "px": pxs, "py": pys,
                 "patch_sum": sums})

    return df.select("image_id", "bytes").mapInPandas(
        run, "image_id string, px long, py long, patch_sum long")


def channel_histogram(df: DataFrame) -> DataFrame:
    """Exact per-channel pixel histogram: uint8 pixels make the 256-bin
    histogram EXACT (no t-digest/approx needed), and exact histograms
    give exact dataset percentiles — the robust alternative to mean/std
    when choosing normalization or clipping bounds.

    Executors fold their whole split into ≤768 (channel, value, n)
    partial rows inside ``mapInPandas`` (``np.bincount`` per image), so
    the one groupBy shuffles a fixed-width histogram per partition —
    the same map-side-combine shape as :func:`channel_stats`. Returns
    one row per non-empty (channel, value) bin.
    """
    from sedona_spark.sources.images import decode_image

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hist = np.zeros((3, 256), dtype=np.int64)
        for b in batches:
            for buf in b["bytes"]:
                arr = decode_image(bytes(buf))[0]
                for c in range(3):
                    hist[c] += np.bincount(arr[:, :, c].ravel(),
                                           minlength=256)
        ch, val = np.nonzero(hist)
        yield pd.DataFrame({"channel": ch.astype(np.int64),
                            "value": val.astype(np.int64),
                            "n": hist[ch, val]})

    part = df.select("bytes").mapInPandas(
        partials, "channel long, value long, n long")
    return part.groupBy("channel", "value").agg(
        F.sum("n").alias("n"))


def channel_stats(df: DataFrame) -> DataFrame:
    """Dataset per-channel pixel statistics: exact int64 count / sum /
    sum-of-squares per channel, plus ``mean_val`` and population
    ``var_val`` derived from them (``sum/n`` and ``sumsq/n − mean²`` —
    two IEEE divisions an oracle mirrors op-for-op).

    Executors fold their whole split into 3 partial rows inside the
    ``mapInPandas`` pass, so the one groupBy shuffles only
    3·partitions fixed-width rows — the canonical map-side-combine
    shape for a 100 TB reduction.
    """
    from sedona_spark.sources.images import decode_image

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = np.zeros(3, dtype=np.int64)
        s = np.zeros(3, dtype=np.int64)
        s2 = np.zeros(3, dtype=np.int64)
        for b in batches:
            for buf in b["bytes"]:
                arr = decode_image(bytes(buf))[0].astype(np.int64)
                n += arr.shape[0] * arr.shape[1]
                s += arr.sum(axis=(0, 1))
                s2 += (arr * arr).sum(axis=(0, 1))
        yield pd.DataFrame(
            {"channel": [0, 1, 2], "n_px": n, "px_sum": s,
             "px_sumsq": s2})

    part = df.select("bytes").mapInPandas(
        partials, "channel long, n_px long, px_sum long, px_sumsq long")
    agg = part.groupBy("channel").agg(
        F.sum("n_px").alias("n_px"),
        F.sum("px_sum").alias("px_sum"),
        F.sum("px_sumsq").alias("px_sumsq"),
    )
    mean = F.col("px_sum").cast("double") / F.col("n_px").cast("double")
    return agg.select(
        "channel", "n_px", "px_sum", "px_sumsq",
        mean.alias("mean_val"),
        (F.col("px_sumsq").cast("double") / F.col("n_px").cast("double")
         - mean * mean).alias("var_val"),
    )

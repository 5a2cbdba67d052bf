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


def downsample_stats(df: DataFrame, factor: int = 16) -> DataFrame:
    """Exact area downsample (average pooling): each ``factor×factor``
    block becomes one pixel valued ``block_sum // factor²`` — pure
    integer arithmetic, so thumbnails are bit-reproducible across
    engines and runs (the property a dedup/caching layer needs from a
    thumbnail stage; float resamplers drift across BLAS builds).

    Output: one row per image with the thumbnail dims, the exact int64
    per-channel sums of the POOLED pixels (not the source pixels — the
    floor division is inside the sum, so this oracles the pooled values
    themselves) and a position-weighted checksum
    ``Σ pooled·(1 + ox + oy·out_w + c·out_w·out_h)`` that pins every
    pooled pixel to its location.

    One ``mapInPandas`` pass, no shuffle. Requires ``w % factor ==
    h % factor == 0`` (resize first otherwise — same contract as
    :func:`patchify_sums`).
    """
    from sedona_spark.sources.images import decode_image

    f2 = factor * factor

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for iid, buf in zip(b["image_id"], b["bytes"]):
                arr, _fmt = decode_image(bytes(buf))
                h, w, c = arr.shape
                if h % factor or w % factor:
                    raise ValueError(
                        f"downsample_stats: {iid} is {w}x{h}, not a "
                        f"multiple of {factor} — resize first")
                gy, gx = h // factor, w // factor
                pooled = (arr.astype(np.int64)
                          .reshape(gy, factor, gx, factor, c)
                          .sum(axis=(1, 3)) // f2)  # (gy, gx, c)
                sums = pooled.sum(axis=(0, 1))
                oy, ox, oc = np.mgrid[0:gy, 0:gx, 0:c]
                wsum = int((pooled * (1 + ox + oy * gx + oc * gx * gy))
                           .sum())
                recs.append((iid, gx, gy, int(sums[0]), int(sums[1]),
                             int(sums[2]), wsum))
            yield pd.DataFrame(recs, columns=[
                "image_id", "out_w", "out_h",
                "d0_sum", "d1_sum", "d2_sum", "wsum"])

    return df.select("image_id", "bytes").mapInPandas(
        run, "image_id string, out_w long, out_h long, "
             "d0_sum long, d1_sum long, d2_sum long, wsum long")


def augment_stats(df: DataFrame, crop: int = 32, flip: bool = True) -> DataFrame:
    """Deterministic center-crop + horizontal flip — the reproducible
    flavor of the torchvision ``CenterCrop + RandomHorizontalFlip``
    stack (seeded trainers need the SAME augmentation per (sample,
    epoch), so augmentation must be a pure function of the row, never
    of executor-local RNG state).

    Post-transform pixel ``(x, y, c) = src(x0 + (crop−1−x), y0 + y, c)``
    with ``x0 = (w−crop)//2``, ``y0 = (h−crop)//2``. Channel sums are
    flip-invariant, so the output also carries the position-weighted
    checksum ``Σ v·(1 + x + y·crop + c·crop²)`` over POST-transform
    coordinates — the column that proves the flip and the crop window
    actually happened.

    One ``mapInPandas`` pass, no shuffle.
    """
    from sedona_spark.sources.images import decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for iid, buf in zip(b["image_id"], b["bytes"]):
                arr, _fmt = decode_image(bytes(buf))
                h, w, c = arr.shape
                if w < crop or h < crop:
                    raise ValueError(
                        f"augment_stats: {iid} is {w}x{h} < crop {crop}")
                x0, y0 = (w - crop) // 2, (h - crop) // 2
                win = arr[y0:y0 + crop, x0:x0 + crop].astype(np.int64)
                if flip:
                    win = win[:, ::-1]
                sums = win.sum(axis=(0, 1))
                yy, xx, cc = np.mgrid[0:crop, 0:crop, 0:c]
                wsum = int((win * (1 + xx + yy * crop + cc * crop * crop))
                           .sum())
                recs.append((iid, x0, y0, int(sums[0]), int(sums[1]),
                             int(sums[2]), wsum))
            yield pd.DataFrame(recs, columns=[
                "image_id", "x0", "y0",
                "a0_sum", "a1_sum", "a2_sum", "wsum"])

    return df.select("image_id", "bytes").mapInPandas(
        run, "image_id string, x0 long, y0 long, "
             "a0_sum long, a1_sum long, a2_sum long, wsum long")


#: vocabulary used by the deterministic text-embedding side of
#: :func:`image_text_align` — must match the caption fixture's word list
#: (sources/images.py ``_WORDS``).
_ALIGN_DIM = 8


def image_text_align(df: DataFrame, words: tuple[str, ...] | None = None) -> DataFrame:
    """CLIP-style image↔caption alignment scoring, the multimodal filter
    a web-scale pairs pipeline runs before training (drop rows whose
    caption does not describe the image). No pretrained encoder exists
    in this environment, so both towers are deterministic closed-form
    embeddings — the SPARK-SIDE shape is the real thing: an
    Arrow-batched decode tower for pixels, a pure-Column tower for
    text, a JVM-side fused dot/norm, one mirrored IEEE division.

    * image tower (``mapInPandas`` over ``bytes``): 8 exact int64
      moments — per-channel pixel sums ``s_c``, x-weighted moments
      ``Σ v·x`` per channel, y-weighted moments for channels 0,1.
    * text tower (pure Column over ``caption``): split → lookup each of
      the last 4 words in the vocabulary map → ``te_d = Σ_j
      (((idx_j+1)·(2d+3)) mod 97) − 48`` for ``d in 0..7``.
    * score = ``dot(ie, te) / sqrt(dot(ie,ie)·dot(te,te))`` with the
      integer dots exact and ONE float op sequence both engines mirror.

    At 100 TB: the whole op is one map stage — the decode pass carries
    ``caption`` through, so the text tower is a projection over the
    decode tower's output (never a second scan of the expensive bytes
    source, never a join).
    """
    from sedona_spark.sources.images import _WORDS, decode_image

    vocab = words if words is not None else tuple(_WORDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for iid, buf, cap in zip(b["image_id"], b["bytes"],
                                     b["caption"]):
                arr = decode_image(bytes(buf))[0].astype(np.int64)
                h, w, _c = arr.shape
                xs = np.arange(w, dtype=np.int64)[None, :, None]
                ys = np.arange(h, dtype=np.int64)[:, None, None]
                s = arr.sum(axis=(0, 1)) 			# s0 s1 s2
                mx = (arr * xs).sum(axis=(0, 1))  # mx0 mx1 mx2
                my = (arr * ys).sum(axis=(0, 1))  # my0 my1
                ie = [int(s[0]), int(s[1]), int(s[2]),
                      int(mx[0]), int(mx[1]), int(mx[2]),
                      int(my[0]), int(my[1])]
                recs.append([iid, cap] + ie)
            yield pd.DataFrame(recs, columns=[
                "image_id", "caption"]
                + [f"ie{d}" for d in range(_ALIGN_DIM)])

    ie = df.select("image_id", "bytes", "caption").mapInPandas(
        run, "image_id string, caption string, " + ", ".join(
            f"ie{d} long" for d in range(_ALIGN_DIM)))

    # text tower: caption → last-4 word indices → te_d (pure Column
    # projection over the decode tower's output)
    pairs: list = []
    for i, wd in enumerate(vocab):
        pairs.extend([F.lit(wd), F.lit(i)])
    vmap = F.create_map(*pairs)
    toks = F.slice(F.split(F.col("caption"), " "), -4, 4)
    idxs = F.transform(toks, lambda t: F.element_at(vmap, t).cast("long"))
    te = [
        F.aggregate(
            idxs, F.lit(0).cast("long"),
            lambda acc, ix: acc + ((ix + 1) * (2 * d + 3)) % 97 - 48,
        ).alias(f"te{d}")
        for d in range(_ALIGN_DIM)
    ]
    j = ie.select("image_id", *[f"ie{d}" for d in range(_ALIGN_DIM)], *te)
    dot = sum(F.col(f"ie{d}") * F.col(f"te{d}")
              for d in range(_ALIGN_DIM))
    ii = sum(F.col(f"ie{d}") * F.col(f"ie{d}")
             for d in range(_ALIGN_DIM))
    tt = sum(F.col(f"te{d}") * F.col(f"te{d}")
             for d in range(_ALIGN_DIM))
    raw = dot.cast("double") / F.sqrt(ii.cast("double") * tt.cast("double"))
    return j.select(
        "image_id",
        dot.alias("dot_it"),
        (F.floor(raw * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
        .alias("align_score"),
    )


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

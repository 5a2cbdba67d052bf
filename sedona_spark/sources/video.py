"""Deterministic synthetic video table + real AVI container codec.

Video rides through the pipeline as an opaque ``binary`` column with
typed metadata (width, height, fps, frame count); frame sampling and
per-frame features run as Arrow-batched ``mapInPandas`` — the multimodal
posture shared with the image/audio tiers.

The container is the published RIFF AVI layout (no video library exists
in this environment, and AVI is the one container writable from struct
alone): ``RIFF 'AVI '`` → ``LIST hdrl`` (``avih`` MainAVIHeader +
``LIST strl`` with ``strh``/``strf``) → ``LIST movi`` with one chunk per
frame → ``idx1`` index. Two codecs:

* ``'raw '`` — uncompressed DIB frames (``00db`` chunks,
  biCompression=0): bottom-up BGR rows padded to 4 bytes, the classic
  Windows DIB convention. Pixel-exact → drives the DuckDB value oracles.
* ``'MJPG'`` — Motion-JPEG (``00dc`` chunks), every frame an independent
  baseline JPEG through the stdlib codec (``sources/jpeg.py``). Lossy →
  correctness pinned by the PSNR pytest, like the still-image path.

Anything else (biCompression other than 0/'MJPG', audio streams,
OpenDML extensions) raises the clearly-marked ``NotImplementedError``
seam. Frame pixels come from the image tier's closed-form generator
with the frame index folded into the image key, so the oracle SQL
regenerates any sampled frame exactly.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from sedona_spark.sources.images import make_pixels


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\0" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def _dib_encode(frame: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → bottom-up BGR DIB rows padded to 4 bytes."""
    h, w, _ = frame.shape
    bgr = frame[::-1, :, ::-1]  # bottom-up, RGB→BGR
    stride = (w * 3 + 3) & ~3
    if stride == w * 3:
        return bgr.tobytes()
    out = np.zeros((h, stride), dtype=np.uint8)
    out[:, : w * 3] = bgr.reshape(h, w * 3)
    return out.tobytes()


def _dib_decode(body: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(body, dtype=np.uint8)[: h * stride].reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()


def encode_avi(
    frames: list[np.ndarray] | np.ndarray, fps: int = 10, codec: str = "raw"
) -> bytes:
    """uint8 frames (each (h, w, 3) RGB) → AVI bytes. ``codec`` is
    ``'raw'`` (DIB, pixel-exact) or ``'mjpg'`` (per-frame baseline JPEG,
    quality 90)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w, _ = frames[0].shape
    for t, f in enumerate(frames):
        if f.shape != frames[0].shape:
            raise ValueError(
                f"encode_avi: frame {t} is {f.shape}, expected "
                f"{frames[0].shape} — AVI streams are fixed-shape")
    if codec == "raw":
        fourcc, ckid = b"\0\0\0\0", b"00db"
        payloads = [_dib_encode(f) for f in frames]
        bisize = ((w * 3 + 3) & ~3) * h
    elif codec == "mjpg":
        from sedona_spark.sources.jpeg import encode_jpeg

        fourcc, ckid = b"MJPG", b"00dc"
        payloads = [encode_jpeg(f) for f in frames]
        bisize = max(len(p) for p in payloads)
    else:
        raise NotImplementedError(f"video codec {codec!r} requires a video library")
    n = len(frames)
    maxbuf = max(len(p) for p in payloads)

    # MainAVIHeader (56 bytes): usec/frame, maxbytes/sec, pad, flags
    # (HASINDEX=0x10), totalframes, initial, streams, bufsize, w, h, rsvd[4]
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps, maxbuf * fps, 0, 0x10, n, 0, 1, maxbuf, w, h,
            0, 0, 0, 0,
        ),
    )
    # AVIStreamHeader: fccType 'vids', handler, flags, prio+lang, initial,
    # scale, rate (rate/scale = fps), start, length, bufsize, quality,
    # samplesize, rcFrame
    strh = _chunk(
        b"strh",
        b"vids" + fourcc
        + struct.pack("<IIIIIIIIii4H", 0, 0, 0, 1, fps, 0, n, maxbuf, -1, 0,
                      0, 0, w, h),
    )
    # BITMAPINFOHEADER
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII", 40, w, h, 1, 24,
            fourcc if codec == "mjpg" else b"\0\0\0\0",
            bisize, 0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_chunks, idx, off = [], [], 4  # offsets relative to 'movi' fourcc
    for p in payloads:
        ck = _chunk(ckid, p)
        movi_chunks.append(ck)
        idx.append(struct.pack("<4sIII", ckid, 0x10, off, len(p)))
        off += len(ck)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def decode_avi(buf: bytes) -> tuple[list[np.ndarray], int, str]:
    """AVI bytes → (frames as uint8 (h, w, 3) RGB, fps, codec). Walks the
    RIFF tree generically; only the video stream chunks ``00db``/``00dc``
    are consumed, so extra chunks (JUNK, INFO) are tolerated."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = None
    fps = 0
    compression = b"\0\0\0\0"
    frames: list[np.ndarray] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h, fps, compression
        pos = lo
        while pos + 8 <= hi:
            cid = buf[pos : pos + 4]
            clen = struct.unpack_from("<I", buf, pos + 4)[0]
            body_lo = pos + 8
            if cid == b"LIST":
                walk(body_lo + 4, body_lo + clen)
            elif cid == b"strh":
                if buf[body_lo : body_lo + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", buf, body_lo + 20)
                    fps = rate // max(scale, 1)
            elif cid == b"strf":
                (_sz, bw, bh, _pl, bits, comp) = struct.unpack_from(
                    "<IiiHH4s", buf, body_lo
                )
                if bits != 24:
                    raise NotImplementedError(
                        f"{bits}-bit AVI frames require a video library"
                    )
                w, h, compression = bw, abs(bh), comp
            elif cid in (b"00db", b"00dc"):
                body = buf[body_lo : body_lo + clen]
                if compression == b"\0\0\0\0":
                    # strf says raw DIB — never magic-sniff here (a raw
                    # frame can legitimately start with FF D8 when its
                    # bottom-left pixel is B=255, G=216)
                    if w is None:
                        raise ValueError("AVI frame chunk before strf header")
                    frames.append(_dib_decode(body, w, h))
                elif compression == b"MJPG" or body[:2] == b"\xff\xd8":
                    from sedona_spark.sources.jpeg import decode_jpeg

                    frames.append(decode_jpeg(bytes(body)))
                else:
                    raise NotImplementedError(
                        f"AVI compression {compression!r} requires a video library"
                    )
            pos = body_lo + clen + (clen & 1)

    walk(12, 8 + struct.unpack_from("<I", buf, 4)[0])
    codec = "mjpg" if compression == b"MJPG" else "raw"
    return frames, fps, codec


# --------------------------------------------------------------------------
# deterministic fixture — frame pixels from the image tier's formula with
# the frame index folded into the key: make_pixels(i*131 + t*17, w, h)
# --------------------------------------------------------------------------

_FPS = 10


def n_frames(i: int) -> int:
    """Deterministic per-video frame count (mirrored in oracle SQL)."""
    return 8 + (i % 5) * 2


def frame_key(i: int, t: int) -> int:
    return i * 131 + t * 17


def make_frames(i: int, w: int = 32, h: int = 32) -> np.ndarray:
    return np.stack(
        [make_pixels(frame_key(i, t), w, h) for t in range(n_frames(i))]
    )


_VIDEO_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fps", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("codec", StringType(), False),
    ]
)


def _rows_for_ids(ids: np.ndarray, codec: str = "raw") -> pd.DataFrame:
    recs = []
    for i in map(int, ids):
        fr = make_frames(i)
        recs.append(
            (
                f"vid_{i:012d}",
                encode_avi(list(fr), fps=_FPS, codec=codec),
                fr.shape[2],
                fr.shape[1],
                _FPS,
                len(fr),
                codec,
            )
        )
    return pd.DataFrame(recs, columns=[f.name for f in _VIDEO_SCHEMA.fields])


def videos_from_part(
    spark: SparkSession, sf_dir: str, id_mod: int | None = None,
    codec: str = "raw",
) -> DataFrame:
    """Video table keyed off the driver testdata ``part`` table — same
    scale/oracle posture as ``images_from_part`` (prune ids BEFORE the
    CPU-heavy synth+encode, spread across the cluster first)."""
    from sedona_spark.sources.images import keyed_fixture_table

    return keyed_fixture_table(
        spark, lambda ids: _rows_for_ids(ids, codec), _VIDEO_SCHEMA,
        sf_dir=sf_dir, id_mod=id_mod)

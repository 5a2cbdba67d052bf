"""Audio/video multimodal tier: codecs + Arrow-batched pipeline ops."""

import struct

import numpy as np
import pytest

from sedona_spark.sources.audio import (
    clip_len,
    decode_wav,
    encode_wav,
    make_samples,
    synthesize_audio,
)
from sedona_spark.sources.video import (
    decode_avi,
    encode_avi,
    make_frames,
    n_frames,
    videos_from_part,
)

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------- WAV


def test_wav_roundtrip_mono_and_stereo():
    s = make_samples(7, clip_len(7))
    out, sr = decode_wav(encode_wav(s, 16000))
    assert sr == 16000 and (out[:, 0] == s).all()
    st = np.stack([s, (-s).astype(np.int16)], axis=1)
    out2, sr2 = decode_wav(encode_wav(st, 8000))
    assert sr2 == 8000 and (out2 == st).all()


def test_wav_tolerates_extra_chunks_and_8bit():
    # hand-build a WAV with a LIST chunk before data, 8-bit PCM
    raw8 = bytes((np.arange(16) * 16).astype(np.uint8))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw8)) + raw8
    )
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    out, sr = decode_wav(buf)
    assert sr == 8000 and out[0, 0] == (0 - 128) * 256
    assert out[8, 0] == (128 - 128) * 256


def test_wav_compressed_seams():
    with pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x04" + b"\0" * 64)
    with pytest.raises(NotImplementedError):
        decode_wav(b"fLaC" + b"\0" * 64)
    # genuinely compressed format tag (2 = MS ADPCM); IEEE float (3) is
    # now a supported decode path, see test_decode_wav_wide_formats
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 32000, 4, 4)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_fixture_has_silent_frames():
    s = make_samples(3, 4000).astype(np.int64)
    frames = s[: (4000 // 400) * 400].reshape(-1, 400)
    peaks = np.abs(frames).max(axis=1)
    assert (peaks == 0).any() and (peaks > 200).any()


# --------------------------------------------------------------------- AVI


def test_avi_raw_roundtrip_exact():
    fr = make_frames(3)
    out, fps, codec = decode_avi(encode_avi(list(fr), fps=10, codec="raw"))
    assert fps == 10 and codec == "raw" and len(out) == len(fr)
    assert all((a == b).all() for a, b in zip(out, fr))


def test_avi_dib_row_padding():
    fr = make_frames(5, w=33, h=17)  # 33*3=99 → stride 100
    out, _, _ = decode_avi(encode_avi(list(fr), codec="raw"))
    assert all((a == b).all() for a, b in zip(out, fr))


def test_avi_mjpg_psnr():
    fr = make_frames(9)
    out, _, codec = decode_avi(encode_avi(list(fr), codec="mjpg"))
    assert codec == "mjpg" and len(out) == len(fr)
    mse = np.mean((np.stack(out).astype(float) - fr.astype(float)) ** 2)
    psnr = 10 * np.log10(255.0**2 / mse)
    # quality-90 baseline JPEG on the high-frequency interference fixture
    assert psnr > 28.0, psnr


def test_avi_unknown_codec_seam():
    fr = make_frames(1)
    buf = bytearray(encode_avi(list(fr), codec="raw"))
    i = buf.find(b"strf")
    # biCompression field sits 16 bytes into the BITMAPINFOHEADER body
    buf[i + 8 + 16 : i + 8 + 20] = b"XVID"
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(buf))


# ----------------------------------------------------------------- ops


def test_wav_stats_matches_numpy(spark):
    from sedona_spark.pipeline.audio import wav_stats

    df = synthesize_audio(spark, 6)
    rows = {r["clip_id"]: r for r in wav_stats(df).collect()}
    assert len(rows) == 6
    for i in range(1, 7):
        s = make_samples(i, clip_len(i)).astype(np.int64)
        r = rows[f"clip_{i:012d}"]
        assert r["n_samples"] == len(s)
        assert r["peak"] == int(np.abs(s).max())
        assert r["sumsq"] == int((s * s).sum())
        neg = s < 0
        assert r["zcr"] == int((neg[1:] != neg[:-1]).sum())


def test_audio_resample_nearest_and_linear(spark):
    from sedona_spark.pipeline.audio import audio_resample

    df = synthesize_audio(spark, 3)
    out = {r["clip_id"]: r for r in audio_resample(df, 4000).collect()}
    for i in range(1, 4):
        s = make_samples(i, clip_len(i)).astype(np.int64)
        m = len(s) // 4
        exp = s[(np.arange(m) * 16000) // 4000]
        r = out[f"clip_{i:012d}"]
        assert r["n_samples"] == m and r["sum_s"] == int(exp.sum())
        dec, sr = decode_wav(bytes(r["bytes"]))
        assert sr == 4000 and (dec[:, 0].astype(np.int64) == exp).all()
    lin = audio_resample(df, 4000, linear=True).collect()
    assert len(lin) == 3 and all(r["sr"] == 4000 for r in lin)


def test_audio_chunks_cover_clip(spark):
    from sedona_spark.pipeline.audio import audio_chunks

    df = synthesize_audio(spark, 2)
    rows = audio_chunks(df, 512).collect()
    for i in (1, 2):
        mine = sorted(
            (r for r in rows if r["clip_id"] == f"clip_{i:012d}"),
            key=lambda r: r["chunk_idx"],
        )
        n = clip_len(i)
        assert len(mine) == (n + 511) // 512
        assert sum(r["n"] for r in mine) == n
        s = make_samples(i, n).astype(np.int64)
        assert sum(r["sumsq"] for r in mine) == int((s * s).sum())
        dec, _ = decode_wav(bytes(mine[0]["bytes"]))
        assert (dec[:, 0] == s[:512].astype(np.int16)).all()


def test_silence_stats(spark):
    from sedona_spark.pipeline.audio import silence_stats

    df = synthesize_audio(spark, 4)
    for r in silence_stats(df, frame=400, threshold=200).collect():
        i = int(r["clip_id"].split("_")[1])
        n = clip_len(i)
        nf = (n + 399) // 400
        exp_silent = sum(1 for k in range(nf) if (k + i) % 4 == 0)
        assert r["n_frames"] == nf and r["n_silent"] == exp_silent


def test_spectral_pure_tone(spark):
    """Analytic pin: a bin-64 cosine at sr=16000/n_fft=1024 is 1000 Hz —
    the dominant bin must land exactly there and the centroid nearby."""
    from sedona_spark.pipeline.audio import spectral_features
    import pandas as pd

    t = np.arange(4096)
    tone = (10000 * np.cos(2 * np.pi * 64 * t / 1024)).astype(np.int16)
    pdf = pd.DataFrame(
        {"clip_id": ["tone"], "bytes": [encode_wav(tone, 16000)]}
    )
    df = spark.createDataFrame(pdf)
    r = spectral_features(df).collect()[0]
    assert r["dominant_hz"] == pytest.approx(1000.0)
    assert r["centroid_hz"] == pytest.approx(1000.0, abs=25.0)
    assert r["flatness"] < 0.1


def test_video_meta_and_frame_stats(spark):
    from sedona_spark.pipeline.video import frame_sample_stats, video_meta

    vids = videos_from_part(spark, SF, id_mod=500)
    meta = video_meta(vids).collect()
    assert meta
    for r in meta:
        i = int(r["video_id"].split("_")[1])
        fr = make_frames(i).astype(np.int64)
        assert r["n_frames"] == n_frames(i)
        assert r["pix_sum"] == int(fr.sum())
    stats = frame_sample_stats(vids, every=4).collect()
    byv = {}
    for r in stats:
        byv.setdefault(r["video_id"], []).append(r)
    for vid, rs in byv.items():
        i = int(vid.split("_")[1])
        fr = make_frames(i).astype(np.int64)
        assert sorted(r["frame_idx"] for r in rs) == list(
            range(0, n_frames(i), 4)
        )
        for r in rs:
            f = fr[r["frame_idx"]]
            assert r["sum_r"] == int(f[:, :, 0].sum())
            assert r["sum_b"] == int(f[:, :, 2].sum())


def test_scene_changes_planted_cut(spark):
    """A video whose frames repeat then jump must put the single cut at
    the jump."""
    import pandas as pd

    from sedona_spark.pipeline.video import scene_changes

    a = make_frames(1)[0]
    b = 255 - a
    frames = [a, a, a, b, b]
    pdf = pd.DataFrame(
        {"video_id": ["planted"], "bytes": [encode_avi(frames, codec="raw")]}
    )
    df = spark.createDataFrame(pdf)
    r = scene_changes(df, threshold=1000).collect()[0]
    assert r["n_cuts"] == 1
    d = np.abs(b.astype(np.int64) - a.astype(np.int64)).sum()
    assert r["max_l1"] == int(d)


def test_keyframe_tensors_byte_exact(spark):
    from sedona_spark.pipeline.video import keyframe_tensors

    vids = videos_from_part(spark, SF, id_mod=1000)
    rows = keyframe_tensors(vids, every=4, size=16).collect()
    assert rows
    r = rows[0]
    i = int(r["video_id"].split("_")[1])
    fr = make_frames(i)[r["frame_idx"]]
    yi = (np.arange(16) * fr.shape[0]) // 16
    xi = (np.arange(16) * fr.shape[1]) // 16
    exp = np.ascontiguousarray(fr[yi[:, None], xi[None, :]].transpose(2, 0, 1))
    assert bytes(r["tensor"]) == exp.tobytes()


def test_decode_wav_wide_formats():
    """24-bit / 32-bit / IEEE-float / EXTENSIBLE layouts decode without
    an audio library; only compressed codecs stay behind the seam."""
    import struct

    import numpy as np

    from sedona_spark.sources.audio import decode_wav

    def wav(tag, ch, sr, bits, payload, extensible=False):
        if extensible:
            sub = struct.pack("<H", tag) + b"\x00\x00" + bytes(12)
            fmt = struct.pack("<HHIIHH", 0xFFFE, ch, sr,
                              sr * ch * bits // 8, ch * bits // 8, bits)
            fmt += struct.pack("<HHI", 22, bits, 0) + sub
        else:
            fmt = struct.pack("<HHIIHH", tag, ch, sr,
                              sr * ch * bits // 8, ch * bits // 8, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 24-bit PCM: full precision incl. sign extension
    vals = [0, 1, -1, 8_388_607, -8_388_608, 123_456, -654_321]
    payload = b"".join(struct.pack("<i", v)[:3] for v in vals)
    s, sr = decode_wav(wav(1, 1, 48000, 24, payload))
    assert sr == 48000 and s.dtype == np.int32
    assert list(s[:, 0]) == vals

    # 32-bit PCM
    v32 = [0, 2**31 - 1, -(2**31), 42]
    s, _ = decode_wav(wav(1, 1, 16000, 32,
                          b"".join(struct.pack("<i", v) for v in v32)))
    assert list(s[:, 0]) == v32

    # IEEE float32 → int16 round/clip
    f = [0.0, 0.5, -0.5, 1.0, -1.0, 2.0, -2.0]
    s, _ = decode_wav(wav(3, 1, 16000, 32,
                          b"".join(struct.pack("<f", v) for v in f)))
    assert list(s[:, 0]) == [0, 16384, -16384, 32767, -32767, 32767, -32767]

    # EXTENSIBLE wrapper resolving to 24-bit PCM, stereo
    st = [10, -10, 300000, -300000]
    s, _ = decode_wav(wav(1, 2, 44100, 24,
                          b"".join(struct.pack("<i", v)[:3] for v in st),
                          extensible=True))
    assert s.shape == (2, 2) and list(s.reshape(-1)) == st

    # EXTENSIBLE resolving to a compressed subformat still raises
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        decode_wav(wav(2, 1, 16000, 16, b"\x00\x00", extensible=True))


def test_encode_wav24_roundtrip():
    import numpy as np

    from sedona_spark.sources.audio import decode_wav, encode_wav24

    v = np.array([0, 1, -1, 8_388_607, -8_388_608, 2048 * 800, -2048 * 800],
                 dtype=np.int32)
    s, sr = decode_wav(encode_wav24(v, 16000))
    assert sr == 16000 and list(s[:, 0]) == list(v)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        encode_wav24(np.array([1 << 23], dtype=np.int32), 16000)

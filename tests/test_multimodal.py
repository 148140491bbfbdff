"""Real image decode: the minimal PPM/BMP parser against constructed
images with known statistics, directly and through the Spark
mapInPandas pipeline (poison payloads quarantined, not fatal)."""

from __future__ import annotations

import struct

import pytest

from hadoop_hive_analysis_spark.operators.multimodal import (
    decode_image_batch,
    decode_images,
)


def make_ppm(width: int, height: int, pixel: bytes = None) -> tuple[bytes, float]:
    """Binary PPM with a header comment; returns (payload, mean_pixel)."""
    n = width * height * 3
    pixels = bytes((i * 7 + 13) % 256 for i in range(n)) if pixel is None else (
        pixel * (n // len(pixel) + 1)
    )[:n]
    payload = b"P6\n# synthetic test image\n%d %d\n255\n" % (width, height) + pixels
    return payload, sum(pixels) / n


def make_bmp(
    width: int, height: int, bpp: int = 24
) -> tuple[bytes, float]:
    """Uncompressed bottom-up BMP (BITMAPINFOHEADER); returns
    (payload, mean over pixel bytes excluding row padding)."""
    channels = bpp // 8
    row_bytes = width * channels
    stride = (row_bytes + 3) & ~3
    rows = []
    total = 0
    for r in range(height):
        row = bytes((r * 31 + c * 11 + 5) % 256 for c in range(row_bytes))
        total += sum(row)
        rows.append(row + b"\x00" * (stride - row_bytes))
    data = b"".join(rows)
    data_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(data), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(data), 2835, 2835, 0, 0
        )
    )
    return header + data, total / (row_bytes * height)


def test_decode_ppm_direct():
    payload, mean = make_ppm(4, 3)
    assert decode_image_batch(payload) == (4, 3, 3, mean)


def test_decode_ppm_comment_and_odd_dims():
    payload, mean = make_ppm(7, 5, pixel=b"\x10\x80\xf0")
    w, h, c, m = decode_image_batch(payload)
    assert (w, h, c) == (7, 5, 3)
    assert m == pytest.approx(mean)


def test_decode_bmp_24bpp_with_padding():
    # width 5 * 3 = 15 bytes/row -> 1 padding byte per row, which must
    # NOT contaminate the mean
    payload, mean = make_bmp(5, 2, bpp=24)
    assert decode_image_batch(payload) == (5, 2, 3, mean)


def test_decode_bmp_32bpp():
    payload, mean = make_bmp(3, 4, bpp=32)
    assert decode_image_batch(payload) == (3, 4, 4, mean)


def make_pgm(width: int, height: int) -> tuple[bytes, float]:
    """Binary PGM (P5, single channel); returns (payload, mean_pixel)."""
    n = width * height
    pixels = bytes((i * 11 + 3) % 256 for i in range(n))
    payload = b"P5\n# gray test\n%d %d\n255\n" % (width, height) + pixels
    return payload, sum(pixels) / n


def test_decode_pgm_direct():
    payload, mean = make_pgm(6, 4)
    assert decode_image_batch(payload) == (6, 4, 1, mean)


def test_decode_rejects_unknown_and_truncated():
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image_batch(b"GIF89a not supported")
    ppm, _ = make_ppm(4, 4)
    with pytest.raises(ValueError, match="truncated PNM"):
        decode_image_batch(ppm[:-5])
    pgm, _ = make_pgm(4, 4)
    with pytest.raises(ValueError, match="truncated PNM"):
        decode_image_batch(pgm[:-2])
    bmp, _ = make_bmp(4, 4)
    with pytest.raises(ValueError, match="truncated BMP"):
        decode_image_batch(bmp[:-3])


def _corrupt_corpus() -> list[bytes]:
    """Deterministic corrupt-header fuzz corpus: valid PPM/PGM/BMP
    payloads with single-byte header mutations at every header offset
    (plus truncations and value-level edits) — the decoder must either
    return a 4-tuple or raise ValueError, never anything else."""
    base = [make_ppm(4, 3)[0], make_pgm(5, 2)[0], make_bmp(4, 3)[0],
            make_bmp(3, 2, bpp=32)[0]]
    corpus: list[bytes] = list(base)
    for p in base:
        header_len = min(56, len(p) - 1)
        for off in range(header_len):
            for delta in (1, 0x7F):
                b = bytearray(p)
                b[off] = (b[off] + delta) % 256
                corpus.append(bytes(b))
        corpus.extend(p[:k] for k in (0, 1, 2, 5, 13, len(p) - 1))
    # value-level nasties for the PNM header parser
    corpus.extend([
        b"P6\n-4 3\n255\n" + b"\x00" * 36,       # negative width
        b"P6\n4 3\n65535\n" + b"\x00" * 72,      # 16-bit maxval
        b"P5\n999999999 999999999\n255\n\x00",   # huge dims
        b"P6\n4 x\n255\n" + b"\x00" * 36,        # non-numeric token
        b"P6",                                    # header only
        b"P5\n# comment never ends",             # unterminated comment
    ])
    return corpus


def test_decode_corrupt_header_fuzz():
    """Every corrupt payload either decodes or raises ValueError — no
    IndexError/struct.error/OverflowError/hang escapes the parser."""
    for payload in _corrupt_corpus():
        try:
            w, h, c, m = decode_image_batch(payload)
            assert isinstance(c, int) and c in (1, 3, 4)
        except ValueError:
            pass


def test_decode_closure_parity_with_module(spark):
    """The mapInPandas closure re-states the parsers locally (cloudpickle
    ships local functions by value); this pins the two copies together:
    over a shared corpus of valid + corrupt payloads, the closure path
    and decode_image_batch must agree on every decoded tuple and on
    exactly WHICH payloads fail (drift in one copy fails here)."""
    corpus = [
        make_ppm(4, 3)[0],
        make_ppm(7, 5, pixel=b"\x10\x80\xf0")[0],
        make_pgm(6, 4)[0],
        make_bmp(5, 2, bpp=24)[0],
        make_bmp(3, 4, bpp=32)[0],
        make_ppm(4, 4)[0][:-5],      # truncated PNM
        make_bmp(4, 4)[0][:-3],      # truncated BMP rows
        make_bmp(4, 4)[0][:20],      # truncated BMP header
        b"P6\n4 3\n65535\n" + b"\x00" * 72,  # 16-bit maxval
        b"GIF89a not supported",
        b"",
    ]
    expected = {}
    for i, p in enumerate(corpus):
        try:
            expected[i] = decode_image_batch(p)
        except ValueError:
            expected[i] = None
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(corpus)],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in decode_images(df).collect()}
    assert set(got) == set(expected)
    for i, exp in expected.items():
        r = got[i]
        if exp is None:
            assert r.width is None and r.decode_error is not None, i
        else:
            assert r.decode_error is None, (i, r.decode_error)
            assert (r.width, r.height, r.channels) == exp[:3], i
            assert r.mean_pixel == pytest.approx(exp[3]), i


def test_decode_images_pipeline(spark):
    """The mapInPandas path: real decodes land real features; poison
    payloads keep their row with NULLs + the error message."""
    ppm, ppm_mean = make_ppm(4, 3)
    bmp, bmp_mean = make_bmp(5, 2)
    rows = [
        (1, bytearray(ppm)),
        (2, bytearray(bmp)),
        (3, bytearray(b"not an image at all")),
        (4, bytearray(ppm[:-5])),  # truncated
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_images(df).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (4, 3, 3)
    assert got[1].mean_pixel == pytest.approx(ppm_mean)
    assert got[1].decode_error is None
    assert (got[2].width, got[2].height, got[2].channels) == (5, 2, 3)
    assert got[2].mean_pixel == pytest.approx(bmp_mean)
    assert got[3].width is None and "unsupported" in got[3].decode_error
    assert got[4].width is None and "truncated PNM" in got[4].decode_error
    assert got[3].n_bytes == len(b"not an image at all")


# ------------------------------------------------ real audio decode (WAV)


def _make_wav(
    samples, sample_rate=16000, n_channels=1, extra_chunk=False
) -> bytes:
    """Hand-assemble a RIFF/WAVE PCM16 payload (optionally with a
    LIST chunk before data, exercising the chunk walk)."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        meta = b"INFOsoftware"
        chunks += b"LIST" + struct.pack("<I", len(meta)) + meta
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_decode_known_signal():
    """A constant-amplitude square wave has RMS exactly |amplitude|;
    sample counts, rate, and duration recover the constructed values."""
    from hadoop_hive_analysis_spark.operators.multimodal import (
        decode_audio_batch,
    )

    samples = [1000, -1000] * 800  # 1600 samples at 16 kHz = 0.1 s
    sr, nc, ns, dur, rms = decode_audio_batch(_make_wav(samples))
    assert (sr, nc, ns) == (16000, 1, 1600)
    assert dur == pytest.approx(0.1)
    assert rms == pytest.approx(1000.0)
    # stereo: frames = samples // channels
    sr, nc, ns, dur, rms = decode_audio_batch(
        _make_wav(samples, n_channels=2)
    )
    assert (nc, ns) == (2, 800)
    # extra chunk before data is walked over, not fatal
    sr, nc, ns, dur, rms = decode_audio_batch(
        _make_wav(samples, extra_chunk=True)
    )
    assert ns == 1600


def test_wav_decode_rejects_corruption():
    """Every corruption class decodes-or-ValueErrors, never crashes."""
    from hadoop_hive_analysis_spark.operators.multimodal import (
        decode_audio_batch,
    )

    good = _make_wav([100, -100] * 50)
    bad = [
        b"",                            # empty
        b"RIFX" + good[4:],             # wrong magic
        good[:30],                      # truncated chunk
        good[:8] + b"AVI " + good[12:],  # not WAVE
        good.replace(b"data", b"datx"),  # missing data chunk
        # PCM8 format word
        good[:20] + b"\x02\x00" + good[22:],
    ]
    for payload in bad:
        with pytest.raises(ValueError):
            decode_audio_batch(payload)
    # odd data length (half a frame) rejected
    import struct

    truncated = _make_wav([100, -100, 100])
    truncated = truncated[:-1]
    truncated = truncated[:40] + truncated[40:]  # keep structure
    # rebuild with a data size that is not frame-aligned
    data = struct.pack("<h", 5) + b"\x01"
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    payload = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    with pytest.raises(ValueError):
        decode_audio_batch(payload)


def test_decode_audio_pipeline_quarantines_poison(spark):
    """The mapInPandas path: valid rows decode, poison rows keep their
    row with the error; closure results must match the module parser
    exactly (drift guard, same contract as the image family)."""
    from hadoop_hive_analysis_spark.operators.multimodal import (
        decode_audio,
        decode_audio_batch,
    )

    payloads = [
        (0, _make_wav([2000, -2000] * 400)),
        (1, _make_wav([0] * 64)),
        (2, b"not audio at all"),
        (3, _make_wav([123] * 33, n_channels=2)[:-3]),  # truncated
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_audio(df).collect()}
    assert len(got) == 4
    for doc_id, payload in payloads:
        r = got[doc_id]
        try:
            sr, nc, ns, dur, rms = decode_audio_batch(payload)
            assert r.decode_error is None
            assert (r.sample_rate, r.n_channels, r.n_samples) == (sr, nc, ns)
            assert r.rms == pytest.approx(rms, rel=1e-12)
            assert r.duration_sec == pytest.approx(dur, rel=1e-12)
        except ValueError as ex:
            assert r.decode_error is not None
            assert r.rms is None
            assert str(ex)[:50] in r.decode_error or r.decode_error
    assert got[0].rms == pytest.approx(2000.0)
    assert got[1].rms == 0.0
    assert got[2].decode_error and got[3].decode_error


# --------------------------------------------- image perceptual hashing


def _gradient_ppm(width=32, height=32, noise_cell=None):
    """Left-dark/right-bright gradient; optionally brighten one 8x8 cell
    region slightly (enough to flip at most that cell's bit)."""
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            v = x * 255 // (width - 1)
            if noise_cell is not None:
                cx, cy = noise_cell
                if x * 8 // width == cx and y * 8 // height == cy:
                    v = min(255, v + 24)
            row += bytes((v, v, v))
        rows.append(bytes(row))
    return b"P6\n%d %d\n255\n" % (width, height) + b"".join(rows)


def test_image_ahash_known_8x8(spark):
    """On an 8x8 grayscale image every hash cell is one pixel: the hash
    must be exactly the 'pixel > mean' bitmap, row-major, MSB-first."""
    from hadoop_hive_analysis_spark.operators.multimodal import image_ahash

    px = bytes(range(0, 256, 4))  # 64 bytes: 0,4,...,252 — mean 126
    payload = b"P5\n8 8\n255\n" + px
    mean_num, mean_den = sum(px), len(px)
    want = 0
    for v in px:
        want = (want << 1) | (1 if v * mean_den > mean_num else 0)
    if want >= 1 << 63:
        want -= 1 << 64
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = image_ahash(df).collect()[0]
    assert row.decode_error is None
    assert row.ahash == want


def test_image_phash_neardup_planted(spark):
    """A brightness-perturbed copy must pair with its original within the
    hamming budget; an inverted gradient must not pair with either; a
    poison payload quarantines without killing the job."""
    from hadoop_hive_analysis_spark.operators.multimodal import (
        image_ahash,
        image_phash_neardup,
    )

    base = _gradient_ppm()
    near = _gradient_ppm(noise_cell=(4, 3))
    inverted = b"P6\n32 32\n255\n" + bytes(
        255 - b for b in _gradient_ppm()[len(b"P6\n32 32\n255\n") :]
    )
    rows = [
        (1, bytearray(base)),
        (2, bytearray(near)),
        (3, bytearray(inverted)),
        (4, bytearray(b"JUNK not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    sigs = {r.doc_id: r for r in image_ahash(df).collect()}
    assert sigs[4].decode_error is not None and sigs[4].ahash is None
    assert sigs[1].ahash is not None
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in image_phash_neardup(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert not any(3 in p for p in pairs)
    # candidate generation must be a band equi-join, never all-pairs
    plan = image_phash_neardup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_resize_images_exact_block_means(spark):
    """A 4x4 P5 image resized to 2x2 must produce exactly the integer
    block means; a poison row quarantines; output size is bounded."""
    from hadoop_hive_analysis_spark.operators.multimodal import resize_images

    px = bytes([0, 10, 100, 110,
                20, 30, 120, 130,
                200, 210, 40, 50,
                220, 230, 60, 70])
    payload = b"P5\n4 4\n255\n" + px
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"nope"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in resize_images(df, 2, 2).collect()}
    r = rows[1]
    assert (r.width, r.height, r.out_w, r.out_h) == (4, 4, 2, 2)
    # block means: TL (0+10+20+30)//4=15, TR (100+110+120+130)//4=115,
    # BL (200+210+220+230)//4=215, BR (40+50+60+70)//4=55
    assert list(bytes(r.pixels)) == [15, 115, 215, 55]
    assert r.decode_error is None
    assert rows[2].decode_error is not None and rows[2].pixels is None


def test_ahash_and_resize_agree_across_ppm_and_bmp(spark):
    """The SAME image stored as P6 and as a standard bottom-up 24bpp BMP
    must produce an IDENTICAL aHash (hamming 0) and identical resized
    thumbnails — the bottom-up row flip in the shared parser is what
    makes the cross-container near-dup claim true."""
    import struct

    from hadoop_hive_analysis_spark.operators.multimodal import (
        image_ahash,
        resize_images,
    )

    w, h = 16, 12
    # vertical gradient (top dark, bottom bright) — orientation-sensitive
    rows = [bytes([y * 255 // (h - 1)] * (w * 3)) for y in range(h)]
    ppm = b"P6\n%d %d\n255\n" % (w, h) + b"".join(rows)
    # bottom-up BMP: file stores the rows REVERSED
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    data = b"".join(
        r + b"\x00" * (stride - row_bytes) for r in reversed(rows)
    )
    data_off = 14 + 40
    bmp = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(data), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
        )
        + data
    )
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(bmp))], "doc_id long, payload binary"
    )
    sigs = {r.doc_id: r.ahash for r in image_ahash(df).collect()}
    assert sigs[1] == sigs[2]
    thumbs = {r.doc_id: bytes(r.pixels) for r in resize_images(df, 4, 4).collect()}
    assert thumbs[1] == thumbs[2]
    # and the thumbnail is upright: top row darker than bottom row
    t = thumbs[1]
    assert sum(t[:4]) < sum(t[12:])


def test_audio_stats_signed_pcm_and_odd_byte(spark, tmp_path):
    """PCM16 semantics on adversarial payloads: non-ASCII text UTF-8-
    encodes to bytes with the sign bit set, so samples go NEGATIVE —
    sum_sq/peak/zero_crossings must match an independent numpy
    reference on the encoded bytes; a trailing odd byte is dropped."""
    import os

    import numpy as np
    import pandas as pd

    from hadoop_hive_analysis_spark.operators.multimodal import (
        multimodal_audio_stats,
    )

    texts = {
        1: "abcd",          # even ASCII
        2: "éué½x",         # multi-byte UTF-8 -> high-bit bytes, odd len
        3: "",              # empty -> zero samples
        4: "é" * 51,        # 102 bytes of alternating 0xC3 0xA9
    }
    pdf = pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values()),
         "lang": ["en"] * 4, "source": ["t"] * 4,
         "n_chars": [len(v) for v in texts.values()]}
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    got = {
        r.doc_id: r
        for r in multimodal_audio_stats(spark, str(tmp_path)).collect()
    }
    for doc_id, text in texts.items():
        b = text.encode("utf-8")
        n = len(b) // 2
        s = np.frombuffer(b[: 2 * n], dtype="<i2").astype(np.int64)
        r = got[doc_id]
        assert r.n_samples == n
        assert r.sum_sq == int((s * s).sum()) if n else r.sum_sq == 0
        assert r.peak == (int(np.abs(s).max()) if n else 0)
        assert r.zero_crossings == (
            int(((s[:-1] * s[1:]) < 0).sum()) if n > 1 else 0
        )
        if n:
            import math

            assert r.rms == math.sqrt(int((s * s).sum()) / n)
        else:
            assert r.rms is None
    # the multi-byte docs must actually exercise negative samples
    neg = np.frombuffer(texts[2].encode("utf-8")[:8], dtype="<i2")
    assert (neg < 0).any()


def _write_documents(tmp_path, sf_dir, rows):
    """Tmp sf_dir with planted documents + symlinks to the real tables
    (the oracle helper binds a view for every testdata table)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_hive_analysis_spark.schemas import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", tmp_path / f"{t}.parquet")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dhash_neardup_detects_planted_perceptual_dups(spark, sf_dir, tmp_path):
    """dHash's invariance model is 'same grid, small value changes'
    (re-encode/noise on same-dimension media): byte-identical payloads
    pair at hamming 0, a same-length few-byte corruption pairs within
    the radius, an unrelated payload pairs with nothing — and the whole
    planted corpus hash-matches the DuckDB twin."""
    from hadoop_hive_analysis_spark.operators.multimodal import (
        MULTIMODAL_DHASH_SQL,
        multimodal_dhash_neardup,
    )

    from .oracle import assert_matches_oracle

    def dhash_ref(p: bytes) -> int:  # mirror of the executor closure
        n = len(p)
        v = [p[(k * (n - 1)) // 62] for k in range(63)]
        h = 0
        for r in range(7):
            for c in range(8):
                if v[r * 9 + c] > v[r * 9 + c + 1]:
                    h |= 1 << (r * 8 + c)
        return h

    base = "the quick brown fox jumps over the lazy dog " * 8  # 352 bytes
    # corrupt a byte the 63-sample grid actually reads; of the two
    # candidate values one must invert that sample's comparison bit
    idx = (18 * (len(base) - 1)) // 62
    for ch in ("~", "\x01"):
        corrupt = list(base)
        corrupt[idx] = ch
        expected = bin(
            dhash_ref(base.encode()) ^ dhash_ref("".join(corrupt).encode())
        ).count("1")
        if 1 <= expected <= 3:
            break
    assert 1 <= expected <= 3, "test construction must perturb the grid"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, "".join(corrupt)),  # perceptual near-dup of 1/2
        (4, "completely different content with other words entirely " * 7),
    ]
    d = _write_documents(tmp_path, sf_dir, rows)
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in multimodal_dhash_neardup(spark, d).collect()
    }
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == expected
    assert got[(2, 3)] == expected
    assert not any(4 in p for p in got)
    assert_matches_oracle(
        multimodal_dhash_neardup(spark, d), MULTIMODAL_DHASH_SQL, d
    )

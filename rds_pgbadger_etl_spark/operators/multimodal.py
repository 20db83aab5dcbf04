"""Multimodal column plumbing (SURVEY X5 / charter "multimodal columns").

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side mechanics — schema, Arrow batch shape,
``mapInPandas`` signatures, partitioning — are real and tested, and so
is one decoder per modality: a dependency-free 24-bpp BMP codec
(encode / header decode / nearest-neighbor resize) and a 16-bit PCM WAV
codec (encode / fmt-chunk decode). Formats needing external libraries
(JPEG/PNG/MP3/ffmpeg) plug into the same ``mapInPandas`` batch shape.

Scale notes: binary payloads ride in the same parquet row groups as the
rest of the row; decode/feature extraction is an Arrow-batched
``mapInPandas`` over whatever partitioning the input has (no shuffle).
For 100 TB media, partition by content-defined buckets (e.g.
hash(doc_id) % N) so batches stay near
``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, byte_len bigint, first_byte int, "
    "fake_width int, fake_height int, n_frames int"
)


def attach_binary(docs: DataFrame) -> DataFrame:
    """Model a media table: binary payload + typed metadata columns.

    (Synthesizes the payload from text since the corpus has no real
    media; a production table would read the bytes from parquet/object
    storage directly.)
    """
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.length("text").alias("declared_len"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Dependency-free codecs: 24-bpp uncompressed BMP and 16-bit mono PCM WAV.
# Pure Python by necessity (the container has no PIL/ffmpeg); at scale the
# same mapInPandas sites call a vectorized library — the batch shape,
# schema, and partitioning below are exactly what such a decoder plugs
# into.


def _bmp_encode(width: int, height: int, seed: int) -> bytes:
    """24-bpp bottom-up BMP; deterministic pixel pattern from ``seed``."""
    row_len = width * 3
    pad = (4 - row_len % 4) % 4
    img_size = (row_len + pad) * height
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            v = (x * 7 + y * 13 + seed) % 256
            row += bytes((v, (v * 3) % 256, (v * 5) % 256))
        rows.append(bytes(row) + b"\x00" * pad)
    return hdr + info + b"".join(rows)


def _bmp_decode_header(b: bytes) -> tuple[int, int, int]:
    """-> (width, height, bits_per_pixel); raises on a non-BMP payload."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    return width, abs(height), bpp


def _bmp_resize(b: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample of a 24-bpp BMP, re-encoded as BMP."""
    w, h, bpp = _bmp_decode_header(b)
    if bpp != 24:
        raise ValueError(f"only 24-bpp BMP supported, got {bpp}")
    off = struct.unpack_from("<I", b, 10)[0]
    stride = (w * 3 + (4 - (w * 3) % 4) % 4)
    px = b[off:]
    out_rows = []
    pad = (4 - (new_w * 3) % 4) % 4
    for y in range(new_h):
        sy = y * h // new_h
        base = sy * stride
        row = bytearray()
        for x in range(new_w):
            sx = (x * w // new_w) * 3
            row += px[base + sx : base + sx + 3]
        out_rows.append(bytes(row) + b"\x00" * pad)
    img = b"".join(out_rows)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, new_w, new_h, 1, 24, 0, len(img), 2835, 2835, 0, 0
    )
    return hdr + info + img


def _wav_encode(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """16-bit mono PCM WAV; deterministic samples from ``seed``."""
    data = b"".join(
        struct.pack("<h", ((seed * 31 + i * 17) % 65536) - 32768)
        for i in range(n_samples)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16)
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def _wav_decode_header(b: bytes) -> tuple[int, int, int, int]:
    """-> (channels, sample_rate, bit_depth, n_samples); walks the RIFF
    chunk list, so extra chunks (LIST/fact) before ``data`` are fine."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, channels, rate, bits, block = 12, 0, 0, 0, 1
    n_samples = 0
    while pos + 8 <= len(b):
        cid, clen = struct.unpack_from("<4sI", b, pos)
        if cid == b"fmt ":
            _, channels, rate, _, block, bits = struct.unpack_from(
                "<HHIIHH", b, pos + 8
            )
        elif cid == b"data":
            n_samples = clen // max(block, 1)
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    return channels, rate, bits, n_samples


DECODE_SCHEMA = (
    "doc_id bigint, media_kind string, width int, height int, "
    "bit_depth int, channels int, sample_rate int, n_samples bigint, "
    "byte_len bigint"
)


def decode_media(df: DataFrame) -> DataFrame:
    """Real media decode: per-payload format sniff + header parse.

    Input batches carry ``(doc_id, payload)``; output is one typed
    metadata row per payload (-1 for fields the modality lacks). This is
    the X5 decode step the charter names — BMP and WAV are decoded
    natively; other formats would dispatch to a library here.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b)
                if b[:2] == b"BM":
                    w, h, bpp = _bmp_decode_header(b)
                    rows.append((did, "bmp", w, h, bpp, 3, -1, -1, len(b)))
                elif b[:4] == b"RIFF":
                    ch, rate, bits, n = _wav_decode_header(b)
                    rows.append((did, "wav", -1, -1, bits, ch, rate, n, len(b)))
                else:
                    rows.append((did, "unknown", -1, -1, -1, -1, -1, -1, len(b)))
            out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_kind", "width", "height", "bit_depth",
                    "channels", "sample_rate", "n_samples", "byte_len",
                ],
            )
            for c, t in [
                ("doc_id", "int64"), ("width", "int32"), ("height", "int32"),
                ("bit_depth", "int32"), ("channels", "int32"),
                ("sample_rate", "int32"), ("n_samples", "int64"),
                ("byte_len", "int64"),
            ]:
                out[c] = out[c].astype(t)
            yield out

    return df.mapInPandas(batches, DECODE_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize (nearest-neighbor) for BMP payloads; non-image
    payloads pass through untouched. Same 1→1 ``mapInPandas`` shape as
    :func:`decode_media` — no shuffle, Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                _bmp_resize(bytes(b), width, height)
                if bytes(b)[:2] == b"BM"
                else bytes(b)
                for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    return df.mapInPandas(batches, "doc_id bigint, payload binary")


def attach_real_media(docs: DataFrame) -> DataFrame:
    """Synthesize REAL media payloads deterministically from doc fields:
    even doc_ids get a BMP (dims from text length), odd get a WAV
    (rate/samples from text length). The encode→decode roundtrip is what
    the ``multimodal_decode`` oracle checks — the decoded header values
    must reproduce the closed-form size formulas in SQL."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, kinds, payloads = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                ln, seed = len(text), did % 256
                if did % 2 == 0:
                    kinds.append("image/bmp")
                    payloads.append(
                        _bmp_encode(ln % 31 + 1, ln % 17 + 1, seed)
                    )
                else:
                    kinds.append("audio/wav")
                    payloads.append(
                        _wav_encode(8000 + (ln % 5) * 2000, ln % 1000 + 1, seed)
                    )
                ids.append(did)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "media_type": kinds,
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        batches, "doc_id bigint, media_type string, payload binary"
    )


FRAME_SCHEMA = "doc_id bigint, frame_id int, frame_bytes bigint"


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: the 1→N ``mapInPandas`` shape (one output
    row per sampled frame). Frame count and per-frame byte length are
    deterministic functions of the payload so the oracle can verify the
    fan-out exactly: ``n_frames = len % 7 + 1``; frame i (stride
    ``every_n``) carries the ``payload[i::n_frames]`` interleave slice.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            doc_ids: list[int] = []
            frame_ids: list[int] = []
            frame_bytes: list[int] = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                nf = len(b) % 7 + 1
                for i in range(0, nf, every_n):
                    doc_ids.append(did)
                    frame_ids.append(i)
                    frame_bytes.append(len(b[i::nf]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_id": pd.Series(frame_ids, dtype="int32"),
                    "frame_bytes": pd.Series(frame_bytes, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


AHASH_SCHEMA = "doc_id bigint, ahash string, hi bigint, lo bigint"


def _ahash_words_from_bmp(b: bytes) -> tuple[int, int]:
    """(hi, lo) aHash words of one BMP payload: 8x8 nearest-neighbor
    resample, per-cell channel-sum luminance, threshold against the
    exact /64 mean, bits packed row-major MSB-first (the image_ahash
    convention — factored out so the video frame-hash path computes the
    IDENTICAL hash per frame)."""
    small = _bmp_resize(b, 8, 8)
    px = small[54:]  # 8x8x24bpp: stride 24, zero pad
    lums = [
        px[y * 24 + x * 3]
        + px[y * 24 + x * 3 + 1]
        + px[y * 24 + x * 3 + 2]
        for y in range(8)
        for x in range(8)
    ]
    mean = sum(lums) / 64
    hi = lo = 0
    for i, lum in enumerate(lums):
        if lum > mean:
            if i < 32:
                hi |= 1 << (31 - i)
            else:
                lo |= 1 << (63 - i)
    return hi, lo


def image_ahash(df: DataFrame) -> DataFrame:
    """Perceptual average-hash over the REAL image payloads: decode the
    BMP, nearest-neighbor resample to 8x8 (the same ``_bmp_resize``
    kernel the resize operator uses), sum the three channel bytes into
    a luminance per cell, threshold against the image mean (an exact
    comparison: the mean's denominator is 64 = 2^6, so the double is
    exact), and pack the 64 bits into a 16-hex string (bit i = row-major
    cell y*8+x; bits 0-31 -> the high word, MSB-first; the two 32-bit
    words also ride along as bigints for the Hamming-banded near-dup
    join). Two images that render alike hash alike regardless of their
    stored resolution — the image-dedup primitive. Arrow-batched
    mapInPandas; non-image rows are dropped (hash what can be hashed,
    route the rest by media_type).

    Deployment sizing (measured, tools/multimodal_rehearsal.py): Arrow
    batches are ROW-capped (spark.sql.execution.arrow.maxRecordsPerBatch,
    default 10000), so large payloads make multi-GB pandas batches and
    the pass collapses into GC — at ~200 KB/image, cap rows so batches
    stay ~tens of MB, and shrink spark.sql.files.maxPartitionBytes so
    scan splits track the DECODED volume (media parquet compresses
    ~12x). With both set the pass is map-only linear (9.2 GB decoded in
    16 s on local[32])."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            hashes: list[str] = []
            his: list[int] = []
            los: list[int] = []
            for did, kind, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if kind != "image/bmp":
                    continue
                hi, lo = _ahash_words_from_bmp(bytes(payload))
                ids.append(int(did))
                hashes.append(f"{hi:08x}{lo:08x}")
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "ahash": pd.Series(hashes, dtype=object),
                    "hi": pd.Series(his, dtype="int64"),
                    "lo": pd.Series(los, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, AHASH_SCHEMA)


_AHASH_BANDS = 4
_AHASH_MAX_HAMMING = 3  # pigeonhole: <= 3 wrong bits -> one clean band

# Auto hot-band threshold for PERCEPTUAL-hash bands: hot = carried by
# more than this FRACTION of the corpus (floored at dedup's 64). Text
# minhash bands are md5-uniform, so dedup.py can judge absolute
# frequency (anything far above the median is duplication); perceptual
# 16-bit words are LOW-entropy on structured content — at sf0.1 the
# video fixture's densest natural band value is carried by ~2% of
# videos with nothing degenerate about it — so here "degenerate
# boilerplate" means a MACROSCOPIC corpus fraction (a black frame, a
# constant intro card), not a fixed count. The cap therefore scales
# with the corpus: natural perceptual clustering stays under it, while
# a corpus-wide constant key blows past it at any scale. Mid-frequency
# boilerplate (say 0.1% of a billion frames) is below this guard's
# radar by design — that's what the manual int override and upstream
# exact frame dedup are for.
AUTO_BAND_DOC_FRAC = 0.05


def _auto_band_cap(bands: DataFrame, max_band_freq) -> int | None:
    """Resolve the multimodal hot-band cap: ``"auto"`` → max(64,
    AUTO_BAND_DOC_FRAC × distinct docs in the bands table); int/None
    pass through (same contract as dedup.resolve_band_freq_cap)."""
    if max_band_freq is None or isinstance(max_band_freq, int):
        return max_band_freq
    import math

    from rds_pgbadger_etl_spark.operators.dedup import (
        AUTO_BAND_FREQ_FLOOR,
    )

    n_docs = bands.select("doc_id").distinct().count()
    return max(
        AUTO_BAND_FREQ_FLOOR, math.ceil(AUTO_BAND_DOC_FRAC * n_docs)
    )


DHASH_SCHEMA = "doc_id bigint, dhash string, hi bigint, lo bigint"


def _dhash_words_from_bmp(b: bytes) -> tuple[int, int]:
    """(hi, lo) dHash (horizontal-gradient) words of one BMP payload:
    9x8 nearest-neighbor resample (one extra column so every hash cell
    has a right neighbor), per-cell channel-sum luminance, bit y*8+x
    set when lum(x+1, y) > lum(x, y), packed row-major MSB-first like
    the aHash words. The gradient is MEAN-INVARIANT: a global or
    regional brightness shift moves every aHash cell against the image
    mean (the documented mean-shift recall flips) but moves both sides
    of each gradient comparison together — the second hash family whose
    failure modes are disjoint from aHash's."""
    small = _bmp_resize(b, 9, 8)
    px = small[54:]
    stride = 28  # 9 px x 3 B = 27, BMP-padded to the 4-byte boundary
    lums = [
        [
            px[y * stride + x * 3]
            + px[y * stride + x * 3 + 1]
            + px[y * stride + x * 3 + 2]
            for x in range(9)
        ]
        for y in range(8)
    ]
    hi = lo = 0
    for y in range(8):
        for x in range(8):
            i = y * 8 + x
            if lums[y][x + 1] > lums[y][x]:
                if i < 32:
                    hi |= 1 << (31 - i)
                else:
                    lo |= 1 << (63 - i)
    return hi, lo


def image_dhash(df: DataFrame) -> DataFrame:
    """Per-image dHash words over the REAL BMP payloads — the gradient
    sibling of :func:`image_ahash`, same Arrow-batched mapInPandas
    shape and (doc_id, hash string, hi, lo) contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            hashes: list[str] = []
            his: list[int] = []
            los: list[int] = []
            for did, kind, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if kind != "image/bmp":
                    continue
                hi, lo = _dhash_words_from_bmp(bytes(payload))
                ids.append(int(did))
                hashes.append(f"{hi:08x}{lo:08x}")
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype=object),
                    "hi": pd.Series(his, dtype="int64"),
                    "lo": pd.Series(los, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, DHASH_SCHEMA)


IMAGE_HASHES_SCHEMA = (
    "doc_id bigint, ahash string, a_hi bigint, a_lo bigint, "
    "dhash string, d_hi bigint, d_lo bigint"
)


def image_hashes(df: DataFrame) -> DataFrame:
    """BOTH perceptual hash families — aHash (luminance threshold) and
    dHash (horizontal gradient) — from ONE Arrow-batched decode pass.
    The per-image hash math is O(64) regardless of payload size (the
    nearest-neighbor resample touches only the sampled bytes), so the
    dominant cost of an image-hash pass is moving and decoding the
    payload bytes themselves; running :func:`image_ahash` and
    :func:`image_dhash` as separate passes pays that byte-level cost —
    scan, Arrow transfer, BMP parse — once PER FAMILY. This kernel pays
    it once total and emits both families' words per row, bit-identical
    to the single-family kernels (it calls the same word helpers).
    Consumers project (doc_id, ahash, a_hi, a_lo) or
    (doc_id, dhash, d_hi, d_lo) to recover each family's contract.
    Non-image rows are dropped, as in the single-family kernels."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            ahashes: list[str] = []
            a_his: list[int] = []
            a_los: list[int] = []
            dhashes: list[str] = []
            d_his: list[int] = []
            d_los: list[int] = []
            for did, kind, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if kind != "image/bmp":
                    continue
                b = bytes(payload)
                a_hi, a_lo = _ahash_words_from_bmp(b)
                d_hi, d_lo = _dhash_words_from_bmp(b)
                ids.append(int(did))
                ahashes.append(f"{a_hi:08x}{a_lo:08x}")
                a_his.append(a_hi)
                a_los.append(a_lo)
                dhashes.append(f"{d_hi:08x}{d_lo:08x}")
                d_his.append(d_hi)
                d_los.append(d_lo)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "ahash": pd.Series(ahashes, dtype=object),
                    "a_hi": pd.Series(a_his, dtype="int64"),
                    "a_lo": pd.Series(a_los, dtype="int64"),
                    "dhash": pd.Series(dhashes, dtype=object),
                    "d_hi": pd.Series(d_his, dtype="int64"),
                    "d_lo": pd.Series(d_los, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, IMAGE_HASHES_SCHEMA)


def _attach_hamming(
    cand: DataFrame, words: DataFrame, out_col: str
) -> DataFrame:
    """Join a (a, b) pair table to one hash family's words on both
    sides and add the popcount Hamming distance as ``out_col``."""
    wa = words.select(
        F.col("doc_id").alias("a"),
        F.col("hi").alias(f"_hi_a_{out_col}"),
        F.col("lo").alias(f"_lo_a_{out_col}"),
    )
    wb = words.select(
        F.col("doc_id").alias("b"),
        F.col("hi").alias(f"_hi_b_{out_col}"),
        F.col("lo").alias(f"_lo_b_{out_col}"),
    )
    ham = (
        F.bit_count(
            F.col(f"_hi_a_{out_col}").bitwiseXOR(F.col(f"_hi_b_{out_col}"))
        )
        + F.bit_count(
            F.col(f"_lo_a_{out_col}").bitwiseXOR(F.col(f"_lo_b_{out_col}"))
        )
    ).cast("int")
    return (
        cand.join(wa, "a")
        .join(wb, "b")
        .withColumn(out_col, ham)
        .drop(
            f"_hi_a_{out_col}",
            f"_lo_a_{out_col}",
            f"_hi_b_{out_col}",
            f"_lo_b_{out_col}",
        )
    )


def image_fused_bands(
    hashes: DataFrame, dhashes: DataFrame
) -> DataFrame:
    """The fused two-family banded rows (fam, doc_id, band, val) as a
    standalone plan — the deterministic corpus property
    :func:`image_near_dup_pairs` banding starts from. Exposed so
    repeated evaluations over a staged corpus (bench/driver/tests)
    can materialize it ONCE per process (plans/llm_ops stages it like
    the hash words and the band cap) instead of paying the
    explode+persist chain on every call."""
    w2 = (
        hashes.select("doc_id", "hi", "lo")
        .withColumn("fam", F.lit(0))
        .unionByName(
            dhashes.select("doc_id", "hi", "lo").withColumn(
                "fam", F.lit(1)
            )
        )
    )
    return _banded(w2, ["fam"])


def image_near_dup_pairs(
    hashes: DataFrame,
    dhashes: DataFrame | None = None,
    max_band_freq: int | str | None = "auto",
    bands: DataFrame | None = None,
) -> DataFrame:
    """Hamming near-dup pairs over aHash words: band each 64-bit hash
    into four 16-bit words, equi-join on (band, value) — candidates ∝
    near-duplicate volume, never images² — and verify
    popcount(hi⊕hi') + popcount(lo⊕lo') <= 3. With 4 bands the
    pigeonhole gives GUARANTEED recall at the <= 3 threshold: three
    wrong bits can dirty at most three bands. The SimHash banding trick
    (operators/dedup.py) applied to the image modality.

    ``dhashes`` adds the SECOND hash family (:func:`image_dhash`,
    mean-invariant gradients): both families band in one fused pass
    (the family tag rides every bucket and hot-cap key, so candidates
    equal per-family banding) and a
    pair qualifies when EITHER family verifies within <= 3 — a
    brightness shift that flips >3 aHash threshold bits (the measured
    0.94-recall failure, tools/multimodal_rehearsal.py) leaves the
    gradients nearly untouched, and a gradient-heavy edit leaves the
    means alone, so flips that break one family rarely break both.
    Output gains the ``dhamming`` column (both distances are reported
    for every qualifying pair).

    ``bands`` lets a caller hand in an already-staged fused band table
    (:func:`image_fused_bands` — it is a deterministic corpus property
    like the hash words and the cap, so plans/llm_ops persists it once
    per process/corpus); without it the banding is built and persisted
    here, and that persist lives for the Spark session (self-join input
    — unpersisting before the result is consumed would recompute the
    explode twice; ad-hoc single-shot callers accept the cached
    partitions, repeated-evaluation callers should pass ``bands``)."""
    if dhashes is None:
        return hamming_band_pairs(hashes, max_band_freq=max_band_freq)
    # FUSED two-family banding: both families ride ONE persist, ONE
    # auto-cap aggregate, ONE self-join — the family tag in every key
    # keeps buckets and hot-cap counts per family, so candidates are
    # identical to banding each family separately. Verification is the
    # either-family rule applied to BOTH attached distances; by the
    # pigeonhole guarantee any pair within a family's threshold is
    # found by that family's own bands, so this equals the
    # verify-per-family-then-union composition (and in the capped
    # regime can only ADD recall: a pair whose clean bands are hot in
    # one family can still surface through the other family's bucket).
    # callers that evaluate repeatedly over a staged corpus pass the
    # resolved int cap (a corpus property) to skip the per-evaluation
    # distinct-docs action "auto" needs
    if bands is None:
        bands = image_fused_bands(hashes, dhashes).persist()
    cap = _auto_band_cap(bands, max_band_freq)
    pruned = prune_hot_bands(bands, cap, ["fam"])
    cand = (
        pruned.alias("l")
        .join(
            pruned.alias("r"),
            (F.col("l.fam") == F.col("r.fam"))
            & (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    both = _attach_hamming(
        _attach_hamming(cand, hashes, "hamming"), dhashes, "dhamming"
    )
    return both.filter(
        (F.col("hamming") <= _AHASH_MAX_HAMMING)
        | (F.col("dhamming") <= _AHASH_MAX_HAMMING)
    ).select("a", "b", "hamming", "dhamming")


def prune_hot_bands(
    bands: DataFrame, cap: int | None, keys: list[str]
) -> DataFrame:
    """Drop band rows whose (keys, band, val) bucket holds more than
    ``cap`` docs — the hot-band guard shared by the fused two-family
    path and the staged-evaluation plans (the pruned table is itself a
    deterministic corpus property once the cap is resolved, so
    plans/llm_ops can stage it per process/corpus and skip the
    count+anti-join per evaluation). ``cap=None`` passes through."""
    if cap is None:
        return bands
    hot = (
        bands.groupBy(*keys, "band", "val")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
        .select(*keys, "band", "val")
    )
    return bands.join(F.broadcast(hot), [*keys, "band", "val"], "left_anti")


def _banded(w: DataFrame, extra: list[str]) -> DataFrame:
    """Explode (hi, lo) 64-bit signatures into 4x16-bit band rows
    (doc_id, *extra, band, val) — the one banding expression shared by
    the single-family and fused two-family paths."""
    return w.select(
        *extra,
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(
                            F.col("hi") if i < 2 else F.col("lo"),
                            16 if i % 2 == 0 else 0,
                        )
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(_AHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select(*extra, "doc_id", "bv.band", "bv.val")


def signature_bands(words: DataFrame) -> DataFrame:
    """The 4x16-bit banded rows (doc_id, band, val) of a 64-bit
    (hi, lo) signature table — :func:`hamming_band_pairs`' candidate
    source as a standalone plan, exposed (like
    :func:`image_fused_bands`) so repeated evaluations over a staged
    corpus can persist it once per process instead of re-exploding per
    call."""
    return _banded(words.select("doc_id", "hi", "lo"), [])


def hamming_band_pairs(
    words: DataFrame,
    max_hamming: int = _AHASH_MAX_HAMMING,
    max_band_freq: int | str | None = "auto",
    bands: DataFrame | None = None,
) -> DataFrame:
    """Banded Hamming pair join over any 64-bit signature split into
    (doc_id, hi, lo) 32-bit words — the shared engine behind image aHash
    AND audio contour near-dups: 4x16-bit bands, equi-join candidates,
    popcount verify. Pigeonhole recall guarantee: ``max_hamming`` wrong
    bits can dirty at most ``max_hamming`` of the 4 bands, so any pair
    within the default <= 3 threshold shares a clean band. All JVM-side
    bit arithmetic (shift/and/xor/bit_count) — no Python in the join.

    ``max_band_freq`` bounds the equi-join's hot keys: a band value
    shared by f signatures contributes f^2/2 candidate rows, so a
    constant signature region (black frames, silence) occurring in a
    large fraction of the corpus makes one 16-bit value quadratic. With
    the cap, (band, val) buckets larger than the cap are excluded from
    candidate generation — the hot set is metadata-sized by construction
    (< 4*2^16 values can ever exceed a fixed cap... in practice a
    handful), so the exclusion is a broadcast anti-join. Recall: a true
    pair is lost only if EVERY clean band it shares is globally hot —
    for near-identical variants of non-degenerate content the clean
    bands carry the content's own bits, so planted-variant recall is
    unharmed (rehearsed in tools/multimodal_rehearsal.py). Default
    ``"auto"`` (:func:`_auto_band_cap` — hot = carried by more than
    AUTO_BAND_DOC_FRAC of the corpus, floored at 64): perceptual words
    cluster naturally on structured content, so the degeneracy test is
    a corpus FRACTION, under which the fixture-scale outputs equal the
    uncapped join the oracle twins model; an int pins it, None
    disables. With a cap active the bands are persisted — the doc
    count, the hot-set groupBy, the anti-join, and both self-join sides
    re-read them (the persist lives for the session; repeated-
    evaluation callers pass ``bands`` instead).

    ``bands`` hands in an already-staged band table
    (:func:`signature_bands`, hot-pruned by the caller if a cap
    applies) — ``max_band_freq`` is then ignored: the caller owns the
    pruning, exactly like the image path's staged variant."""
    w = words.select("doc_id", "hi", "lo")
    if bands is None:
        bands = _banded(w, [])
        if max_band_freq is not None:
            bands = bands.persist()
            cap = _auto_band_cap(bands, max_band_freq)
            bands = prune_hot_bands(bands, cap, [])
    cand = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    wa = w.select(
        F.col("doc_id").alias("a"),
        F.col("hi").alias("hi_a"),
        F.col("lo").alias("lo_a"),
    )
    wb = w.select(
        F.col("doc_id").alias("b"),
        F.col("hi").alias("hi_b"),
        F.col("lo").alias("lo_b"),
    )
    hamming = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("int")
    return (
        cand.join(wa, "a")
        .join(wb, "b")
        .select("a", "b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


FP_SCHEMA = "doc_id bigint, fingerprint string"
_FP_WINDOWS = 16

AUDIO64_SCHEMA = "doc_id bigint, afp string, hi bigint, lo bigint"
_CONTOUR_WINDOWS = 64


def audio_contour64(df: DataFrame) -> DataFrame:
    """64-window energy contour over the REAL audio payloads — the
    near-dup-grade signature (the 16-window fingerprint of
    :func:`audio_fingerprint` stays the exact-dedup key; 16 bits is too
    coarse to band: each 4-bit band would bucket 1/16 of the corpus).
    Same RIFF walk and EXACT integer cross-multiplied mean threshold
    (``win_sum * n_total > total_sum * win_count`` — no FP anywhere),
    64 windows ``i*64//n``, bits packed MSB-first into the same
    (hi, lo) 32-bit-word pair the image aHash uses, so
    :func:`hamming_band_pairs` bands it identically. Clips shorter than
    64 samples leave their empty windows' bits 0. Non-audio rows drop."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            fps: list[str] = []
            his: list[int] = []
            los: list[int] = []
            for did, kind, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if kind != "audio/wav":
                    continue
                b = bytes(payload)
                pos, data = 12, b""
                while pos + 8 <= len(b):
                    cid, clen = struct.unpack_from("<4sI", b, pos)
                    if cid == b"data":
                        data = b[pos + 8 : pos + 8 + clen]
                        break
                    pos += 8 + clen + (clen % 2)
                n = len(data) // 2
                if n == 0:
                    continue
                s = np.frombuffer(data[: 2 * n], dtype="<i2").astype(
                    np.int64
                )
                a = np.abs(s)
                wdx = (np.arange(n) * _CONTOUR_WINDOWS) // n
                total = int(a.sum())
                # all 64 window sums/counts in two bincount passes, not
                # 64 masked scans (float64 weights are exact: sums of
                # ints < 2^53); the 64 threshold comparisons stay in
                # Python ints — total*nw can exceed int64 on hour-long
                # clips — so the contour is bit-identical to the old
                # per-window integer loop
                ws = np.bincount(
                    wdx, weights=a, minlength=_CONTOUR_WINDOWS
                ).astype(np.int64).tolist()
                nw = np.bincount(wdx, minlength=_CONTOUR_WINDOWS).tolist()
                hot = np.fromiter(
                    (w * n > total * c for w, c in zip(ws, nw)),
                    dtype=bool,
                    count=_CONTOUR_WINDOWS,
                )
                packed = np.packbits(hot)  # MSB-first, like 1<<(31-wi)
                hi = int.from_bytes(packed[:4].tobytes(), "big")
                lo = int.from_bytes(packed[4:8].tobytes(), "big")
                ids.append(int(did))
                fps.append(f"{hi:08x}{lo:08x}")
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "afp": pd.Series(fps, dtype=object),
                    "hi": pd.Series(his, dtype="int64"),
                    "lo": pd.Series(los, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, AUDIO64_SCHEMA)


def audio_near_dup_pairs(
    contours: DataFrame, bands: DataFrame | None = None
) -> DataFrame:
    """Hamming near-dup pairs over the 64-window audio contour — the
    banded join :func:`image_near_dup_pairs` runs on image hashes,
    applied to the audio modality via the shared
    :func:`hamming_band_pairs` (4x16-bit bands, pigeonhole recall
    guarantee at hamming <= 3, popcount verify on candidates only).

    The auto hot-band cap is DISABLED here, deliberately: frequency
    capping assumes band values are high-entropy (md5 bands, aHash
    words), so a globally-frequent value marks degenerate boilerplate.
    Energy-contour words are LOW-entropy by construction — clips with
    similar loudness shapes saturate whole 16-bit regions identically —
    so on real audio corpora the most frequent band values ARE the
    signal, and a frequency cap would cap legitimate near-dups (the
    sf0.01 fixture: all four band values are corpus-wide, yet ~all
    pairs genuinely verify at hamming <= 3). Hot-key pressure for this
    modality belongs upstream in exact dedup over the contour itself.
    ``bands`` passes a staged :func:`signature_bands` table through
    (no pruning in this modality, so it is used as-is)."""
    return hamming_band_pairs(contours, max_band_freq=None, bands=bands)


def audio_fingerprint(df: DataFrame) -> DataFrame:
    """Energy-contour fingerprint over the REAL audio payloads: walk the
    RIFF chunks to the PCM data, split the int16 samples into 16 windows
    (sample i -> window i*16//n), and set window bit (MSB-first) when
    the window's mean |amplitude| exceeds the clip mean. The threshold
    is the exact integer cross-multiplication ``win_sum * n_total >
    total_sum * win_count`` — no floating point anywhere, so the 4-hex
    fingerprint is bit-deterministic and the closed-form SQL twin can
    replay it. Clips shorter than 16 samples leave their empty windows'
    bits 0. Non-audio rows are dropped."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            fps: list[str] = []
            for did, kind, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if kind != "audio/wav":
                    continue
                b = bytes(payload)
                pos, data = 12, b""
                while pos + 8 <= len(b):
                    cid, clen = struct.unpack_from("<4sI", b, pos)
                    if cid == b"data":
                        data = b[pos + 8 : pos + 8 + clen]
                        break
                    pos += 8 + clen + (clen % 2)
                n = len(data) // 2
                if n == 0:
                    continue
                s = np.frombuffer(data[: 2 * n], dtype="<i2").astype(
                    np.int64
                )
                a = np.abs(s)
                wdx = (np.arange(n) * _FP_WINDOWS) // n
                total = int(a.sum())
                fp = 0
                for wi in range(_FP_WINDOWS):
                    mask = wdx == wi
                    nw = int(mask.sum())
                    ws = int(a[mask].sum())
                    if ws * n > total * nw:
                        fp |= 1 << (_FP_WINDOWS - 1 - wi)
                ids.append(int(did))
                fps.append(f"{fp:04x}")
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "fingerprint": pd.Series(fps, dtype=object),
                }
            )

    return df.mapInPandas(batches, FP_SCHEMA)


# ---------------------------------------------------------------------------
# Video: a dependency-free multi-frame container (concatenated 24-bpp BMP
# frames behind a tiny length-prefixed header) so the video dedup path
# exercises REAL bytes end-to-end — container parse → per-frame decode →
# per-frame aHash → set-containment pair join. A production deployment
# swaps the frame iterator for ffmpeg keyframe extraction; everything
# downstream of the (doc_id, frame_id, hi, lo) table is format-agnostic.

VIDEO_MAGIC = b"VID0"
VFRAME_SCHEMA = "doc_id bigint, frame_id int, ahash string, hi bigint, lo bigint"


def _video_encode(frames: list[bytes], junk: bytes = b"") -> bytes:
    """Length-prefixed frame container; trailing ``junk`` models
    re-encoder metadata — byte-different payloads, identical frames."""
    out = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    out.append(junk)
    return b"".join(out)


def _video_frames(b: bytes) -> list[bytes]:
    if b[:4] != VIDEO_MAGIC:
        raise ValueError("not a video payload")
    (nf,) = struct.unpack_from("<I", b, 4)
    pos, frames = 8, []
    for _ in range(nf):
        (ln,) = struct.unpack_from("<I", b, pos)
        frames.append(b[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
    return frames


def attach_real_video(docs: DataFrame) -> DataFrame:
    """Synthesize REAL multi-frame video payloads with PLANTED variants,
    deterministically from doc_id (family = doc_id // 4, j = doc_id % 4):

    - j=0  canonical: nf = fam%3+2 frames, frame k's BMP pattern seeded
           ``(fam*31 + k*7) % 256`` at per-family dims
           (w = fam%13+9, h = fam%9+9);
    - j=1  re-encoded copy: SAME frames + trailing container junk —
           byte-different payload, hash-identical frame set;
    - j=2  trimmed: the first nf-1 frames;
    - j=3  unrelated: same shape, seeds offset by 101.

    The closed forms are what the ``multimodal_video_dedup`` oracle
    replays; a production table reads real containers instead."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                fam, j = did // 4, did % 4
                w, h = fam % 13 + 9, fam % 9 + 9
                nf = fam % 3 + 2
                soff = 101 if j == 3 else 0
                n_out = nf - 1 if j == 2 else nf
                frames = [
                    _bmp_encode(w, h, (fam * 31 + k * 7 + soff) % 256)
                    for k in range(n_out)
                ]
                junk = b"\x00" * (fam % 5 + 1) if j == 1 else b""
                ids.append(did)
                payloads.append(_video_encode(frames, junk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "media_type": "video/bmps",
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id bigint, media_type string, payload binary"
    )


def video_frame_hashes(df: DataFrame) -> DataFrame:
    """Per-frame perceptual hashes: walk the container, aHash every
    frame with the EXACT image kernel (:func:`_ahash_words_from_bmp`) —
    one output row per frame. Map-only Arrow-batched 1→N fan-out; the
    payload never leaves the map side (only 64-bit words shuffle in the
    downstream pair join, the image-near-dup scale property)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            fids: list[int] = []
            hashes: list[str] = []
            his: list[int] = []
            los: list[int] = []
            for did, kind, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if kind != "video/bmps":
                    continue
                for k, fb in enumerate(_video_frames(bytes(payload))):
                    hi, lo = _ahash_words_from_bmp(fb)
                    ids.append(int(did))
                    fids.append(k)
                    hashes.append(f"{hi:08x}{lo:08x}")
                    his.append(hi)
                    los.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_id": pd.Series(fids, dtype="int32"),
                    "ahash": pd.Series(hashes, dtype=object),
                    "hi": pd.Series(his, dtype="int64"),
                    "lo": pd.Series(los, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, VFRAME_SCHEMA)


def video_dedup_pairs(frame_hashes: DataFrame) -> DataFrame:
    """Video near-dup pairs from frame-hash set containment: two videos
    pair when >= half of the smaller one's DISTINCT frame hashes appear
    in the other — catches re-encodes (identical hash sets) AND
    trims/extensions (subset hash sets), which a whole-signature equality
    can't. Candidates come from an equi-join on frame hash, so work is
    ∝ shared-frame volume, never videos²; the integer filter
    ``2*shared >= least(n_a, n_b)`` keeps the decision FP-free and the
    reported containment is derived after it."""
    hset = frame_hashes.select("doc_id", "hi", "lo").distinct()
    sizes = hset.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        hset.alias("l")
        .join(
            hset.alias("r"),
            (F.col("l.hi") == F.col("r.hi"))
            & (F.col("l.lo") == F.col("r.lo"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("shared_frames"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("n_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("n_b")), "b")
        .filter(2 * F.col("shared_frames") >= F.least("n_a", "n_b"))
        .select(
            "a",
            "b",
            F.col("shared_frames").cast("int").alias("shared_frames"),
            F.round(
                F.col("shared_frames") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
    )


def video_frame_bands(frame_hashes: DataFrame) -> DataFrame:
    """The distinct per-video frame hashes exploded into 4x16-bit band
    rows (doc_id, ahash, hi, lo, band, val) — the candidate source of
    :func:`video_near_dup_pairs` as a standalone plan, exposed so
    repeated evaluations can stage it (hot-pruned at the resolved cap)
    once per process, like the image and audio band tables."""
    hset = frame_hashes.select("doc_id", "ahash", "hi", "lo").distinct()
    return hset.select(
        "doc_id",
        "ahash",
        "hi",
        "lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(
                            F.col("hi") if i < 2 else F.col("lo"),
                            16 if i % 2 == 0 else 0,
                        )
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(_AHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "ahash", "hi", "lo", "bv.band", "bv.val")


def video_near_dup_pairs(
    frame_hashes: DataFrame,
    max_hamming: int = _AHASH_MAX_HAMMING,
    max_band_freq: int | str | None = "auto",
    bands: DataFrame | None = None,
) -> DataFrame:
    """Video near-dup pairs where frames need only be PERCEPTUALLY
    close, not hash-identical — the near-match refinement of
    :func:`video_dedup_pairs` (which catches re-encodes/trims whose
    frames hash equal, but not re-renders that nudge a frame within a
    few aHash bits). Frame-level candidates come from the same 4x16-bit
    banding (pigeonhole recall guarantee at hamming <= max_hamming);
    per video pair, a frame "matches" when it has >= 1 counterpart
    within the threshold, and the pair survives when at least half of
    the smaller side's DISTINCT frame hashes match (the integer
    ``2*matched >= least(n_a, n_b)`` decision again). Only 64-bit
    words and band values shuffle.

    ``max_band_freq`` is the hot-band cap of :func:`hamming_band_pairs`
    applied at FRAME granularity — the exposure is worse here because a
    degenerate frame (black/uniform: constant aHash words) recurs across
    most videos, making its band values quadratic in the corpus's frame
    count. Buckets above the cap are excluded via a broadcast anti-join;
    a video pair is lost only if every matching frame pair's every
    clean band is globally hot — i.e. pairs held together ONLY by
    boilerplate frames, which the containment decision should not count
    anyway. Default ``"auto"`` (:func:`_auto_band_cap` over the
    frame-band table — hot = a band value carried by more than
    AUTO_BAND_DOC_FRAC of the corpus's videos): a corpus-wide
    degenerate frame blows past the threshold with no knob passed while
    natural perceptual clustering stays below it, so the oracle twins'
    uncapped model is unchanged at fixture scale; an int pins the cap,
    None disables (rehearsed with a planted hot band in
    tools/multimodal_rehearsal.py). ``bands`` hands in a staged
    :func:`video_frame_bands` table (hot-pruned by the caller) and
    ``max_band_freq`` is then ignored, like the image/audio paths; the
    containment sizes always come from the UNPRUNED distinct frame set
    (pruning affects candidates, never the denominator)."""
    hset = frame_hashes.select("doc_id", "ahash", "hi", "lo").distinct()
    if bands is None:
        bands = video_frame_bands(frame_hashes)
        if max_band_freq is not None:
            bands = bands.persist()
            cap = _auto_band_cap(bands, max_band_freq)
            bands = prune_hot_bands(bands, cap, [])
    hamming = (
        F.bit_count(F.col("l.hi").bitwiseXOR(F.col("r.hi")))
        + F.bit_count(F.col("l.lo").bitwiseXOR(F.col("r.lo")))
    ).cast("int")
    fpairs = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .filter(hamming <= max_hamming)
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.col("l.ahash").alias("ha"),
            F.col("r.ahash").alias("hb"),
        )
        .distinct()
    )
    matched = fpairs.groupBy("a", "b").agg(
        F.countDistinct("ha").alias("ma"),
        F.countDistinct("hb").alias("mb"),
    )
    sizes = hset.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    joined = (
        matched.join(
            sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("n_a")),
            "a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("n_b")),
            "b",
        )
        .withColumn(
            "matched_frames",
            F.when(F.col("n_a") <= F.col("n_b"), F.col("ma")).otherwise(
                F.col("mb")
            ),
        )
    )
    return (
        joined.filter(2 * F.col("matched_frames") >= F.least("n_a", "n_b"))
        .select(
            "a",
            "b",
            F.col("matched_frames").cast("int").alias("matched_frames"),
            F.round(
                F.col("matched_frames") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched fake feature extraction over the binary payload.

    Deterministic functions of the bytes (so the oracle can verify the
    plumbing): byte length, first byte, and derived fake dimensions.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload = pdf["payload"]
            byte_len = payload.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": byte_len.astype("int64"),
                    "first_byte": payload.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "fake_width": (byte_len % 64 + 1).astype("int32"),
                    "fake_height": (byte_len % 48 + 1).astype("int32"),
                    "n_frames": (byte_len % 7 + 1).astype("int32"),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)

"""Multimodal-family scale rehearsal (round 8): image dedup at GB scale.

The text dedup, ANN, stream, parse, dedup-store and composed-pipeline
families all carry GB-scale rehearsals; this one gives the image-dedup
path (operators/multimodal.image_ahash → image_near_dup_pairs) the same
treatment: a generated corpus of REAL 256x256 24-bpp BMP payloads
(~197 KB each) with a CONTROLLED duplicate structure, hashed and
near-dup-joined by the production operators, at 1x/2x/4x corpus.

Corpus: families of ``FAMILY`` consecutive ids. Every image is the
reference gradient plus a per-aHash-cell random brightness offset drawn
from a per-image RNG stream — 64 effectively-random hash bits, so
non-family images are unique with probability ~1 (the reference
encoder's bare gradient has only 256 distinct base images — seed enters
mod 256 — which a first cut of this rehearsal measured as tens of
thousands of accidental exact-dup pairs; uniqueness has to be painted
in). The family head draws its cells from the FAMILY seed; ids
j = 1..DUPS are NEAR-DUPS of the head — same pixels with ONE 32x32
cell (aHash cell j) painted white — so hamming(head, variant) is 0-1
plus whatever borderline cells the mean shift flips, and
hamming(variant_i, variant_j) ~ 2. Planted pairs: C(DUPS+1, 2) per
family; the joined recall against that closed form is REPORTED and
should hold constant across scales (the mean-shift flips are
scale-free), while candidates and wall time scale with duplicate
volume, never images².

The generator is numpy-vectorized (the operator's struct-based encoder
is the readable reference; building 10⁵ x 65k-pixel images through it
would measure Python, not the engine); header layout is asserted
byte-identical to the reference encoder per run.

Usage:  python tools/multimodal_rehearsal.py [n_images]
One JSON line to stdout; corpus parquet under $REHEARSAL_DIR
(default /tmp/mm_rehearsal), reused if present.
"""

from __future__ import annotations

import json
import os
import struct
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parse_rehearsal import stage_metrics  # noqa: E402

BASE = os.environ.get("REHEARSAL_DIR", "/tmp/mm_rehearsal")
FAMILY = 100
DUPS = 9  # near-dup variants per family head
W = H = 256  # 8x8 aHash cells of 32x32 pixels each


def _np_bmp(seed: int, paint_cell: int | None) -> bytes:
    """Numpy image builder, same container layout as
    operators/multimodal._bmp_encode (24-bpp, stride = W*3, no pad at
    W=256): the reference gradient plus a per-cell brightness offset
    from RandomState(seed) — 64 effectively-random hash bits per seed —
    with an optional 32x32 aHash cell painted white."""
    x = np.arange(W, dtype=np.int64)
    y = np.arange(H, dtype=np.int64)
    offs = np.random.RandomState(seed).randint(0, 256, (8, 8))
    cell = np.kron(offs, np.ones((32, 32), dtype=np.int64))
    v = (x[None, :] * 7 + y[:, None] * 13 + cell) % 256
    px = np.stack(((v) % 256, (v * 3) % 256, (v * 5) % 256), axis=-1).astype(
        np.uint8
    )
    if paint_cell is not None:
        cy, cx = divmod(paint_cell, 8)
        px[cy * 32 : (cy + 1) * 32, cx * 32 : (cx + 1) * 32, :] = 255
    img = px.tobytes()
    off = 54
    hdr = struct.pack("<2sIHHI", b"BM", off + len(img), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, W, H, 1, 24, 0, len(img), 2835, 2835, 0, 0
    )
    return hdr + info + img


def generate_corpus(spark, path: str, n_images: int) -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    def batches(it):
        for pdf in it:
            ids, kinds, payloads = [], [], []
            for i in pdf["id"]:
                i = int(i)
                fam = (i // FAMILY) * FAMILY
                j = i % FAMILY
                if 1 <= j <= DUPS:
                    b = _np_bmp(fam, paint_cell=j)
                else:
                    b = _np_bmp(i, None)
                ids.append(i)
                kinds.append("image/bmp")
                payloads.append(b)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "media_type": kinds,
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    (
        spark.range(n_images)
        .repartition(64)
        .mapInPandas(
            batches, "doc_id bigint, media_type string, payload binary"
        )
        .write.mode("overwrite")
        .parquet(path)
    )


AUDIO_SAMPLES = 4_096  # per clip: 8 KB of 16-bit PCM, 64 samples/window


def _np_wav(seed: int, flip: int | None) -> bytes:
    """Numpy WAV builder, same container layout as
    operators/multimodal._wav_encode: the family's contour is a random
    32-of-64 loud-window pattern from RandomState(seed) (so families
    are unique w.p. ~1), with per-sample jitter; ``flip`` swaps the
    flip-th loud window with the flip-th quiet window — hamming(head,
    variant) == 2 exactly (the loud count stays 32, so the clip mean
    is unmoved), hamming(variant_i, variant_j) == 4 (outside the <= 3
    threshold): planted pairs are precisely (head, variant)."""
    rs = np.random.RandomState(seed)
    order = rs.permutation(64)
    loud = set(order[:32].tolist())
    if flip is not None:
        loud.discard(int(order[flip]))
        loud.add(int(order[32 + flip]))
    wdx = (np.arange(AUDIO_SAMPLES) * 64) // AUDIO_SAMPLES
    base = np.where(np.isin(wdx, list(loud)), 28000, 10)
    samples = (base + rs.randint(0, 1000, AUDIO_SAMPLES)).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16)
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def generate_audio_corpus(spark, path: str, n_clips: int) -> None:
    """Families of FAMILY consecutive ids: head (j=0) + DUPS planted
    hamming-2 variants (j=1..DUPS) + unique fillers."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for did in pdf["id"]:
                did = int(did)
                fam, j = did // FAMILY, did % FAMILY
                if j == 0:
                    b = _np_wav(fam, None)
                elif j <= DUPS:
                    b = _np_wav(fam, j - 1)
                else:
                    b = _np_wav(10_000_019 + did, None)  # unique filler
                ids.append(did)
                payloads.append(b)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "media_type": "audio/wav",
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    (
        spark.range(n_clips)
        .repartition(64)
        .mapInPandas(
            batches, "doc_id bigint, media_type string, payload binary"
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 12_500
    corpus = f"{BASE}/imgs_{n_images}"
    evdir = f"{BASE}/eventlog_{n_images}"
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.operators.multimodal import (
        _bmp_encode,
        image_hashes,
        image_near_dup_pairs,
    )
    from rds_pgbadger_etl_spark.session import get_spark

    # same container layout as the reference encoder (pixels differ by
    # design: the rehearsal paints in per-cell uniqueness)
    assert _np_bmp(7, None)[:54] == _bmp_encode(W, H, 7)[:54], "header drift"

    spark = get_spark(
        app_name="mm-rehearsal",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            # Binary-payload UDF sizing — the rehearsal's own first
            # scale lesson: Arrow batches are ROW-capped (default
            # 10000), so 197 KB payloads make ~2 GB pandas batches and
            # the hash pass collapses into GC (measured 1560 -> 365
            # images/s from 1x to 2x). Cap batch BYTES via rows
            # (128 x 197 KB ~ 25 MB) and shrink scan splits so the
            # snappy-compressed parquet (~12x) yields tasks sized to
            # the DECODED volume, not the on-disk bytes.
            "spark.sql.execution.arrow.maxRecordsPerBatch": "128",
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )

    t_gen = 0.0
    if not os.path.isdir(corpus):
        t0 = time.perf_counter()
        generate_corpus(spark, corpus, n_images)
        t_gen = time.perf_counter() - t0
    input_bytes = sum(
        os.path.getsize(os.path.join(corpus, f))
        for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )
    media = spark.read.parquet(corpus)

    # --- stage 1: the map-only hash pass — round 12: ONE fused decode
    # emitting BOTH families (aHash luminance + mean-invariant dHash
    # gradient), the registered query's shape; each family projects its
    # words back out of the fused table, no second byte-level pass
    t0 = time.perf_counter()
    fused = image_hashes(media).persist()
    n_hashes = fused.count()
    t_hash = time.perf_counter() - t0
    hashes = fused.select(
        "doc_id",
        "ahash",
        F.col("a_hi").alias("hi"),
        F.col("a_lo").alias("lo"),
    )
    dhashes = fused.select(
        "doc_id",
        "dhash",
        F.col("d_hi").alias("hi"),
        F.col("d_lo").alias("lo"),
    )

    # --- stage 2: banded Hamming near-dup join over the hash table
    t0 = time.perf_counter()
    pairs = image_near_dup_pairs(hashes, dhashes).persist()
    n_pairs = pairs.count()
    by_h = {
        int(r.hamming): int(r.n)
        for r in pairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    t_join = time.perf_counter() - t0
    # the single-family baseline the dual join is graded against (the
    # documented 0.94 mean-shift recall)
    n_pairs_ahash_only = image_near_dup_pairs(hashes).count()

    # --- stage 3 (round 9): audio near-dup leg — 64-window contour +
    # the same banded Hamming join, over a planted hamming-2 corpus
    from rds_pgbadger_etl_spark.operators.multimodal import (
        audio_contour64,
        audio_near_dup_pairs,
    )

    audio_corpus = f"{BASE}/wavs_{n_images}"
    t_agen = 0.0
    if not os.path.isdir(audio_corpus):
        t0 = time.perf_counter()
        generate_audio_corpus(spark, audio_corpus, n_images)
        t_agen = time.perf_counter() - t0
    clips = spark.read.parquet(audio_corpus)
    t0 = time.perf_counter()
    contours = audio_contour64(clips).persist()
    n_contours = contours.count()
    t_contour = time.perf_counter() - t0
    t0 = time.perf_counter()
    apairs = audio_near_dup_pairs(contours).persist()
    n_apairs = apairs.count()
    a_by_h = {
        int(r.hamming): int(r.n)
        for r in apairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    t_ajoin = time.perf_counter() - t0

    # --- stage 4 (round 10): the hot-band quadratic + its cap — every
    # video carries a BOILERPLATE black frame (constant words: its band
    # values are shared by the whole corpus), so uncapped, EVERY video
    # pair is a candidate AND passes the containment rule via that one
    # frame: the output itself is C(n, 2). The frame-hash table is
    # synthesized directly (metadata-sized; the payload decode path is
    # covered by the video oracle queries) with planted families: head
    # + DUPS variants whose DISTINCTIVE frames sit 1-2 bits apart.
    from rds_pgbadger_etl_spark.operators.multimodal import (
        video_near_dup_pairs,
    )

    def video_fh(n_videos: int):
        import pandas as pd

        rows = []
        for v in range(n_videos):
            rows.append((v, 0, "0" * 16, 0, 0))  # boilerplate black frame
            famv, j = v // FAMILY, v % FAMILY
            if j <= DUPS:
                rs = np.random.RandomState(900_000 + famv)
                hi, lo = int(rs.randint(0, 2**31)), int(rs.randint(0, 2**31))
                if j >= 1:
                    lo ^= 1 << j  # bits 1..9: all inside one 16-bit band
            else:
                rs = np.random.RandomState(10_000_019 + v)
                hi, lo = int(rs.randint(0, 2**31)), int(rs.randint(0, 2**31))
            rows.append((v, 1, f"{hi:08x}{lo:08x}", hi, lo))
        return spark.createDataFrame(
            pd.DataFrame(
                rows,
                columns=["doc_id", "frame_id", "ahash", "hi", "lo"],
            )
        )

    n_small = min(2_000, n_images)
    fh_small = video_fh(n_small).persist()
    fh_small.count()
    t0 = time.perf_counter()
    # the quadratic reference needs the guard DISABLED (round 11 made
    # the auto cap the default)
    n_uncapped = video_near_dup_pairs(fh_small, max_band_freq=None).count()
    t_uncapped = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_capped_small = video_near_dup_pairs(fh_small, max_band_freq=64).count()
    t_capped_small = time.perf_counter() - t0
    fh_big = video_fh(n_images).persist()
    fh_big.count()
    t0 = time.perf_counter()
    capped_big = video_near_dup_pairs(fh_big, max_band_freq=64).persist()
    n_capped_big = capped_big.count()
    t_capped_big = time.perf_counter() - t0
    # round 11: the DEFAULT (no knob) — the auto threshold must exclude
    # the boilerplate frame's bands on its own and keep planted recall
    t0 = time.perf_counter()
    auto_big = video_near_dup_pairs(fh_big).persist()
    n_auto_big = auto_big.count()
    t_auto_big = time.perf_counter() - t0
    auto_fam_pairs = auto_big.filter(
        (F.col("a") % FAMILY <= DUPS)
        & (F.col("b") % FAMILY <= DUPS)
        & ((F.col("a") / FAMILY).cast("long") == (F.col("b") / FAMILY).cast("long"))
    ).count()
    auto_big.unpersist()
    # planted recall under the cap: every within-family pair must
    # survive via its distinctive frames (1-2 bits apart, family-unique
    # bands far below the cap)
    planted_small = (n_small // FAMILY) * (DUPS + 1) * DUPS // 2
    planted_big = (n_images // FAMILY) * (DUPS + 1) * DUPS // 2
    capped_fam_pairs = capped_big.filter(
        (F.col("a") % FAMILY <= DUPS)
        & (F.col("b") % FAMILY <= DUPS)
        & ((F.col("a") / FAMILY).cast("long") == (F.col("b") / FAMILY).cast("long"))
    ).count()
    capped_big.unpersist()
    fh_small.unpersist()
    fh_big.unpersist()

    fam = n_images // FAMILY
    expected = fam * (DUPS + 1) * DUPS // 2  # C(DUPS+1, 2) per family
    audio_expected = fam * DUPS  # exactly (head, variant) pairs
    stages = stage_metrics(evdir)
    print(
        json.dumps(
            {
                "n_images": n_images,
                "input_gb": round(input_bytes / 2**30, 2),
                # parquet+snappy compresses the synthetic pattern ~12x;
                # the hash pass decodes the full payload regardless
                "decoded_gb": round(n_images * (54 + W * H * 3) / 2**30, 2),
                "gen_s": round(t_gen, 1),
                "hash_s": round(t_hash, 1),
                "images_per_s": round(n_hashes / t_hash, 0),
                "join_s": round(t_join, 1),
                "near_pairs": n_pairs,
                "near_pairs_ahash_only": n_pairs_ahash_only,
                "expected_pairs": expected,
                "recall_vs_planted": round(n_pairs / expected, 4),
                "recall_ahash_only": round(
                    n_pairs_ahash_only / expected, 4
                ),
                "pairs_by_hamming": by_h,
                "audio_clips": n_contours,
                "audio_gen_s": round(t_agen, 1),
                "audio_contour_s": round(t_contour, 1),
                "audio_clips_per_s": round(n_contours / t_contour, 0),
                "audio_join_s": round(t_ajoin, 1),
                "audio_near_pairs": n_apairs,
                "audio_expected_pairs": audio_expected,
                "audio_recall_vs_planted": round(
                    n_apairs / audio_expected, 4
                ),
                "audio_pairs_by_hamming": a_by_h,
                "video_hot_band": {
                    "n_small": n_small,
                    "uncapped_pairs": n_uncapped,
                    "uncapped_s": round(t_uncapped, 1),
                    "capped_pairs_small": n_capped_small,
                    "capped_s_small": round(t_capped_small, 1),
                    "planted_small": planted_small,
                    "n_big": n_images,
                    "capped_pairs_big": n_capped_big,
                    "capped_s_big": round(t_capped_big, 1),
                    "planted_big": planted_big,
                    "capped_family_pairs_big": capped_fam_pairs,
                    "cap_recall_vs_planted": round(
                        capped_fam_pairs / planted_big, 4
                    ),
                    "auto_pairs_big": n_auto_big,
                    "auto_s_big": round(t_auto_big, 1),
                    "auto_family_pairs_big": auto_fam_pairs,
                    "auto_recall_vs_planted": round(
                        auto_fam_pairs / planted_big, 4
                    ),
                },
                "shuffle_write_mb": round(
                    sum(s.get("shuffle_write_mb", 0) for s in stages), 1
                ),
                "spill_mb": round(
                    sum(s.get("spill_mb", 0) for s in stages), 1
                ),
            }
        )
    )
    pairs.unpersist()
    fused.unpersist()
    apairs.unpersist()
    contours.unpersist()


if __name__ == "__main__":
    main()

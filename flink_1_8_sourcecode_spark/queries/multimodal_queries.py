"""Multimodal-column inventory (SURVEY.md §2.16).

The decode kernel is a deterministic md5-derived stub (image libraries
are not in this container), which makes the whole pipeline ORACLE-ABLE:
every derived value — fake dimensions, fake channel means, frame
explosion, resize arithmetic — is replicated in DuckDB SQL, so these
queries get full rows+schema+hash checks despite the stubbed codec.
The Spark-side plumbing (binary column, Arrow-batched mapInPandas,
metadata-driven explode) is the real deliverable; swap `_fake_decode`
for Pillow/ffmpeg in deployment (strict=True path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.operators import multimodal
from flink_1_8_sourcecode_spark.queries import export_path, register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return multimodal.attach_fake_media(docs, "doc_id", "text")


# shared CTE: replicate attach_fake_media's md5-derived metadata
_MEDIA_CTE = """
    m AS (
      SELECT doc_id AS media_id, md5(text) AS hx,
             ('0x' || substr(md5(text), 1, 8))::BIGINT AS n
      FROM documents
    ),
    meta AS (
      SELECT media_id, hx,
             (n % 640 + 16)::INT AS width,
             ((n // 256) % 480 + 16)::INT AS height,
             (n % 8 + 1)::INT AS n_frames
      FROM m
    )
"""


def _byte(i: int) -> str:
    """SQL for byte i (0-based) of the md5 digest, from its hex form."""
    return f"('0x' || substr(hx, {2 * i + 1}, 2))::INT"


@register(
    "multimodal_decode_features",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT media_id, width, height,
           {_byte(0)} / 255.0 AS mean_r,
           {_byte(1)} / 255.0 AS mean_g,
           {_byte(2)} / 255.0 AS mean_b,
           ({" + ".join(_byte(i) for i in range(16))}) / {16 * 255.0} AS entropy
    FROM meta
    """,
    doc="Binary media column -> Arrow-batched mapInPandas feature "
    "extraction; the deterministic md5 decode stub is replicated "
    "byte-for-byte in the oracle.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.decode_features(_media(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH {_MEDIA_CTE},
    exploded AS (
      SELECT media_id, n_frames,
             unnest(range(n_frames))::INT AS frame_idx
      FROM meta
    )
    SELECT media_id, n_frames, frame_idx
    FROM exploded WHERE frame_idx % 2 = 0
    """,
    doc="Video frame sampling: metadata-driven frame explode, every 2nd "
    "frame kept.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.frame_sample(_media(spark, sf_dir), every_nth=2).select(
        "media_id", F.col("meta.n_frames").alias("n_frames"), "frame_idx"
    )


@register(
    "multimodal_resize_plan",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT media_id,
           round(width / (CASE WHEN greatest(width, height) > 128
                 THEN greatest(width, height) / 128.0 ELSE 1.0 END))::INT
             AS target_width,
           round(height / (CASE WHEN greatest(width, height) > 128
                 THEN greatest(width, height) / 128.0 ELSE 1.0 END))::INT
             AS target_height
    FROM meta
    """,
    doc="Resize planning (pure metadata arithmetic, JVM-side): target "
    "dims bounded by max side 128.",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.resize_plan(_media(spark, sf_dir), max_side=128).select(
        "media_id", "target_width", "target_height"
    )


@register(
    "multimodal_audio_stats",
    oracle="""
    WITH src AS (SELECT doc_id AS media_id,
                        (doc_id % 100) / 128.0 AS amp,
                        1000 + (doc_id % 50)::INT AS n
                 FROM documents),
         q AS (SELECT media_id, n,
                      -- encode truncates toward zero into int16
                      -- (astype), decode normalizes by 32768
                      trunc(amp * 32767.0) / 32768.0 AS qa
               FROM src)
    SELECT media_id,
           8000 AS sample_rate,
           n::BIGINT AS n_samples,
           n / 8000.0 AS duration_s,
           qa AS rms,
           qa AS peak
    FROM q
    """,
    doc="The REAL audio path end-to-end, hash-checked: per document a "
    "constant-amplitude 16-bit PCM WAV is SYNTHESIZED (multimodal.py:"
    "encode_wav), parsed back by the built-in RIFF/WAVE codec "
    "(audio_features), and the signal stats must equal the closed form "
    "— a constant signal's rms and peak are exactly its int16-quantized "
    "amplitude, so DuckDB verifies the full encode->container-walk->"
    "decode->stats pipeline without any audio library (including the "
    "exact int16 truncate-encode / 32768-normalize-decode arithmetic).",
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        audio_features,
        encode_wav,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [
                        encode_wav(
                            np.full(1000 + int(i % 50), (i % 100) / 128.0), 8000
                        )
                        for i in ids
                    ],
                }
            )

    media = docs.mapInPandas(synth, "media_id long, content binary")
    return audio_features(media).select(
        "media_id", "sample_rate", "n_samples", "duration_s", "rms", "peak"
    )


@register(
    "multimodal_image_resize",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             16 + doc_id % 5 AS w, 16 + doc_id % 3 AS h
      FROM documents
    ),
    grid AS (
      SELECT media_id, w, h,
             (ty * h) // 8 AS sy, (tx * w) // 8 AS sx
      FROM m, UNNEST(range(0, 8)) AS gy(ty), UNNEST(range(0, 8)) AS gx(tx)
    )
    SELECT media_id, w::INT AS src_width, h::INT AS src_height,
           avg(((media_id*7 + sy*3 + sx*5) % 256) / 255.0)      AS mean_r,
           avg(((media_id*7 + sy*3 + sx*5 + 11) % 256) / 255.0) AS mean_g,
           avg(((media_id*7 + sy*3 + sx*5 + 22) % 256) / 255.0) AS mean_b
    FROM grid GROUP BY media_id, w, h
    """,
    doc="REAL nearest-neighbor image resize through the built-in PPM "
    "codec (upgrade of resize_plan's metadata-only arithmetic): "
    "deterministic formula-pixel P6 images are ENCODED to real PPM "
    "bytes, parsed back by the numpy codec, NN-sampled to an 8x8 "
    "thumbnail (src = floor(dst*src_dim/target)), and the resized "
    "means emitted — the oracle recomputes the sampled-pixel means in "
    "closed form, so header parse, raster reshape, and the NN index "
    "rule are all value-checked "
    "(operators/multimodal.py:resize_image_stats).",
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        encode_ppm,
        resize_image_stats,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            out = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                w, h = 16 + mid % 5, 16 + mid % 3
                y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                px = np.stack(
                    [(mid * 7 + y * 3 + x * 5 + c * 11) % 256 for c in range(3)],
                    axis=-1,
                ).astype(np.uint8)
                out.append((mid, bytearray(encode_ppm(px))))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = docs.mapInPandas(synth, "media_id long, content binary")
    return resize_image_stats(media, target_side=8)


@register(
    "multimodal_video_frames",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, 2 + doc_id % 5 AS nf FROM documents),
    fr AS (
      SELECT media_id, f FROM m, UNNEST(range(0, nf)) AS u(f) WHERE f % 2 = 0
    ),
    px AS (
      SELECT media_id, f,
             ((media_id*7 + f*13 + y*3 + x*5) % 256) / 255.0      AS r,
             ((media_id*7 + f*13 + y*3 + x*5 + 11) % 256) / 255.0 AS g,
             ((media_id*7 + f*13 + y*3 + x*5 + 22) % 256) / 255.0 AS b
      FROM fr, UNNEST(range(0, 8)) AS gy(y), UNNEST(range(0, 8)) AS gx(x)
    )
    SELECT media_id, f::INT AS frame_idx, 8 AS width, 8 AS height,
           avg(r) AS mean_r, avg(g) AS mean_g, avg(b) AS mean_b
    FROM px GROUP BY media_id, f
    """,
    doc="REAL video frame sampling: per-doc 'videos' of 2-6 formula-"
    "pixel 8x8 frames ENCODED as concatenated binary P6 and walked "
    "back frame-by-frame by the byte-level stream parser; every 2nd "
    "frame kept (ffmpeg select=not(mod(n,2)) semantics) with "
    "per-frame channel means — container walk, per-frame raster "
    "reshape, and the sampling rule all value-checked in closed form "
    "(operators/multimodal.py:video_frame_stats).",
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        encode_ppm,
        video_frame_stats,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            out = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                y, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
                frames = b"".join(
                    encode_ppm(
                        np.stack(
                            [
                                (mid * 7 + f * 13 + y * 3 + x * 5 + c * 11) % 256
                                for c in range(3)
                            ],
                            axis=-1,
                        ).astype(np.uint8)
                    )
                    for f in range(2 + mid % 5)
                )
                out.append((mid, bytearray(frames)))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = docs.mapInPandas(synth, "media_id long, content binary")
    return video_frame_stats(media, every_nth=2)


@register(
    "multimodal_shot_boundaries",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, 2 + doc_id % 5 AS nf FROM documents),
    fr AS (SELECT media_id, f FROM m, UNNEST(range(0, nf)) AS u(f)),
    px AS (
      SELECT media_id, f, y, x, c,
             (media_id*7 + f*13 + 100*(f//3) + y*3 + x*5 + c*11) % 256 AS v
      FROM fr,
           UNNEST(range(0, 8)) AS gy(y),
           UNNEST(range(0, 8)) AS gx(x),
           UNNEST(range(0, 3)) AS gc(c)
    ),
    d AS (
      SELECT a.media_id, a.f AS frame_idx, avg(abs(a.v - b.v)) / 255.0 AS diff
      FROM px a JOIN px b
        ON a.media_id = b.media_id AND b.f = a.f - 1
       AND a.y = b.y AND a.x = b.x AND a.c = b.c
      GROUP BY a.media_id, a.f
    )
    SELECT media_id, frame_idx::INT AS frame_idx, diff, diff > 0.2 AS is_cut
    FROM d
    """,
    doc="Shot-boundary (scene-cut) detection: consecutive-frame mean "
    "absolute pixel difference over the real concatenated-P6 container "
    "walk; frames get an extra +100 intensity shift every 3rd frame, "
    "and the detector flags exactly those boundaries at threshold 0.2 "
    "(smooth motion ~0.10, cuts ~0.50) — the classic pixel-difference "
    "detector a video curation pipeline runs before per-shot sampling "
    "(operators/multimodal.py:shot_boundaries).",
)
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        encode_ppm,
        shot_boundaries,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            out = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                y, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
                frames = b"".join(
                    encode_ppm(
                        np.stack(
                            [
                                (mid * 7 + f * 13 + 100 * (f // 3)
                                 + y * 3 + x * 5 + c * 11) % 256
                                for c in range(3)
                            ],
                            axis=-1,
                        ).astype(np.uint8)
                    )
                    for f in range(2 + mid % 5)
                )
                out.append((mid, bytearray(frames)))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = docs.mapInPandas(synth, "media_id long, content binary")
    return shot_boundaries(media, threshold=0.2)


@register(
    "multimodal_dhash_pairs",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, 16 + doc_id % 5 AS w, 16 + doc_id % 3 AS h
               FROM documents),
    g AS (SELECT media_id, w, h, ty, tx, (ty * h) // 8 AS sy
          FROM m, UNNEST(range(0, 8)) AS gy(ty), UNNEST(range(0, 8)) AS gx(tx)),
    bits AS (
      SELECT media_id, ty, tx,
        CASE WHEN ((media_id*7 + 13*sy*sy + 29*(((tx+1)*w)//9)*(((tx+1)*w)//9)
                    + 7*sy*(((tx+1)*w)//9)) % 256) >
                  ((media_id*7 + 13*sy*sy + 29*((tx*w)//9)*((tx*w)//9)
                    + 7*sy*((tx*w)//9)) % 256)
             THEN 1 ELSE 0 END AS b
      FROM g
    ),
    words AS (
      SELECT media_id,
        sum(CASE WHEN ty < 4 THEN b * (1::BIGINT << (ty*8+tx)::INT) ELSE 0 END)::BIGINT AS w0,
        sum(CASE WHEN ty >= 4 THEN b * (1::BIGINT << ((ty-4)*8+tx)::INT) ELSE 0 END)::BIGINT AS w1
      FROM bits GROUP BY media_id
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           (bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)))::INT AS dist
    FROM words a JOIN words b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 3
    """,
    doc="Perceptual image near-dup detection: REAL PPM decode -> dHash "
    "(difference hash over the NN-sampled 8x9 red plane, packed into "
    "two exact int64 words) -> EXACT Hamming<=3 pairs via multi-index "
    "hashing (Norouzi et al. 2012: 4 disjoint 16-bit bands; pigeonhole "
    "makes the banded equi-join COMPLETE, unlike LSH's probabilistic "
    "recall).  The oracle recomputes hash bits in closed form from the "
    "formula pixels and brute-forces all pairs — candidate generation, "
    "packing, and popcount all value-checked "
    "(operators/multimodal.py:dhash64,dhash_near_pairs).",
)
def multimodal_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        dhash64,
        dhash_near_pairs,
        encode_ppm,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            out = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                w, h = 16 + mid % 5, 16 + mid % 3
                y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                px = np.stack(
                    [
                        (mid * 7 + 13 * y * y + 29 * x * x + 7 * y * x + 11 * c) % 256
                        for c in range(3)
                    ],
                    axis=-1,
                ).astype(np.uint8)
                out.append((mid, bytearray(encode_ppm(px))))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = docs.mapInPandas(synth, "media_id long, content binary")
    return dhash_near_pairs(dhash64(media), max_dist=3)


@register(
    "multimodal_audio_decimate",
    oracle="""
    WITH src AS (SELECT doc_id AS media_id, 64 + (doc_id % 5) * 16 AS n
                 FROM documents),
    samp AS (
      SELECT media_id, i,
             trunc((((media_id*31 + i*17) % 201 - 100) / 128.0) * 32767.0)
               / 32768.0 AS v
      FROM src, UNNEST(range(0, n)) AS u(i)
      WHERE i % 4 = 0
    )
    SELECT media_id, 2000 AS sample_rate_out,
           count(*)::BIGINT AS n_out,
           avg(v) AS mean_amp,
           max(abs(v)) AS peak
    FROM samp GROUP BY media_id
    """,
    doc="REAL audio decimation through the RIFF/WAVE codec: per doc a "
    "varying 16-bit PCM signal (closed-form sawtooth) is encoded, "
    "parsed back, and decimated 4x (drop resampler, every 4th frame "
    "kept); the oracle recomputes the SIGNED mean and peak of exactly "
    "the kept samples — including the int16 truncate-encode / 32768-"
    "normalize arithmetic — so a wrong stride or off-by-one start "
    "index hash-mismatches (operators/multimodal.py:audio_decimate).",
)
def multimodal_audio_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        audio_decimate,
        encode_wav,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            out = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                n = 64 + (mid % 5) * 16
                i = np.arange(n)
                sig = ((mid * 31 + i * 17) % 201 - 100) / 128.0
                out.append((mid, encode_wav(sig, 8000)))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = docs.mapInPandas(synth, "media_id long, content binary")
    return audio_decimate(media, factor=4)


_PHASH_EXPORT = export_path("phash_sigs")


@register(
    "multimodal_phash_pairs",
    oracle=f"""
    WITH s AS (SELECT media_id, w0, w1
               FROM read_parquet('{_PHASH_EXPORT}/*.parquet'))
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           (bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)))::INT AS dist
    FROM s a JOIN s b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 3
    """,
    doc="DCT perceptual hash near-dup pairs (operators/multimodal.py:"
    "phash64 — orthonormal 2-D DCT-II over the NN-sampled red plane, "
    "median-thresholded 8x8 low-frequency block; robust to monotonic "
    "brightness maps where dHash is gradient-bound) + the SAME "
    "pigeonhole multi-index Hamming join as dhash_near_pairs.  Images "
    "are synthesized in GROUPS of four sharing a base pattern (members "
    "1-3 add a +/-1 ripple), so near-dup pairs exist by construction.  "
    "The oracle is HASH-CONDITIONED: signatures export to parquet and "
    "DuckDB brute-forces all pairs with bit_count(xor(...)) — the "
    "banded candidate generation and popcount filter are value-checked "
    "against an exhaustive independent pairing.",
)
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        dhash_near_pairs,
        encode_ppm,
        phash64,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def synth(batches):
        for pdf in batches:
            out = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                g = mid // 4  # four images share a base pattern
                y, x = np.meshgrid(np.arange(24), np.arange(24), indexing="ij")
                base = (g * 37 + 19 * y * y + 23 * x * x + 5 * y * x) % 256
                ripple = (mid % 4) * (((y + x + mid) % 2))  # +/-1-ish noise
                px = np.stack(
                    [(base + ripple + 11 * c) % 256 for c in range(3)], axis=-1
                ).astype(np.uint8)
                out.append((mid, bytearray(encode_ppm(px))))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = docs.mapInPandas(synth, "media_id long, content binary")
    sig = phash64(media)
    sig.write.mode("overwrite").parquet(_PHASH_EXPORT)
    return dhash_near_pairs(spark.read.parquet(_PHASH_EXPORT), max_dist=3)


@register(
    "multimodal_exact_dedup",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50
    )
    SELECT sha256(text) AS content_sha256, min(media_id) AS keep_id,
           count(*) AS n_copies
    FROM m GROUP BY 1
    """,
    doc="Exact byte-identical media dedup (operators/multimodal.py:"
    "exact_dedup): 50 planted duplicate payloads collapse onto their "
    "originals via one groupBy on sha2(content, 256) — the shuffle "
    "moves 32-byte digests, never media bytes.  The digest itself is "
    "in the output, so the oracle cross-checks Spark's sha2 against "
    "DuckDB's sha256 byte-for-byte.",
)
def multimodal_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir).select("media_id", "content")
    dup = m.filter(F.col("media_id") < 50).withColumn(
        "media_id", F.col("media_id") + 1000000
    )
    return multimodal.exact_dedup(m.unionByName(dup))

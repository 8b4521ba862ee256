"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star extension (SURVEY.md §2.16).  Design for 100 TB:
- media travels as a ``binary`` column with a sibling metadata struct
  (format, width/height or sample_rate/duration, codec) — never decoded
  during relational ops, so pruning/filtering stays columnar.
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages (one Python worker per input split; batch shape
  = spark.sql.execution.arrow.maxRecordsPerBatch).

The actual codec work is STUBBED (image/audio libraries are not in this
container): ``decode_image`` computes a deterministic fake decode from
the bytes so the plumbing — schema, partitioning, UDF signature, batch
flow — is real and tested; swap ``_fake_decode`` for PIL/ffmpeg in a
real deployment (raising ``NotImplementedError`` when strict=True).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, content binary, "
    "meta struct<format: string, width: int, height: int, n_frames: int>"
)


def attach_fake_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build a media-typed frame from any byte-bearing column (test path:
    documents.text encoded as bytes stands in for image payloads).

    The fake dimensions derive from the first 8 hex chars of md5(content)
    — md5 (not crc32/sha) because every engine in the toolchain has it,
    so a SQL oracle can replicate the derivation exactly:
    ``('0x' || substr(md5(text), 1, 8))::BIGINT`` in DuckDB equals
    ``conv(substring(md5(content), 1, 8), 16, 10)`` here."""
    content = F.encode(F.col(payload_col), "UTF-8")
    h = F.conv(F.substring(F.md5(content), 1, 8), 16, 10).cast("long")
    return df.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("fake/rgb8").alias("format"),
            (h % 640 + 16).cast("int").alias("width"),
            (F.floor(h / 256) % 480 + 16).cast("int").alias("height"),
            (h % 8 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> dict:
    """Deterministic stand-in for a real image decode: derives 'pixel'
    statistics from the md5 digest of the bytes (md5 so a SQL oracle can
    reproduce each byte as ('0x' || substr(md5_hex, 2i+1, 2))::INT).
    REPLACE with a real codec."""
    d = hashlib.md5(content).digest()
    return {
        "mean_r": d[0] / 255.0,
        "mean_g": d[1] / 255.0,
        "mean_b": d[2] / 255.0,
        "entropy": sum(d[:16]) / (16 * 255.0),
    }


def _pil_decode(content: bytes) -> dict:
    """Real image decode via Pillow: per-channel means + a byte-histogram
    entropy over the decoded RGB pixels."""
    import io
    import math

    from PIL import Image

    img = Image.open(io.BytesIO(content)).convert("RGB")
    px = list(img.getdata())
    n = max(len(px), 1)
    sums = [0, 0, 0]
    hist = [0] * 256
    for r, g, b in px:
        sums[0] += r
        sums[1] += g
        sums[2] += b
        hist[r] += 1
    # entropy over the red-channel byte histogram, normalized to [0, 1]
    ent = -sum((c / n) * math.log2(c / n) for c in hist if c) / 8.0
    return {
        "mean_r": sums[0] / (255.0 * n),
        "mean_g": sums[1] / (255.0 * n),
        "mean_b": sums[2] / (255.0 * n),
        "entropy": ent,
    }


def _parse_p6(content: bytes, pos: int = 0):
    """Parse one binary PPM (P6) image starting at ``pos``; return
    ``(pixels, next_pos)`` — the primitive both the single-image parser
    and the concatenated-P6 video stream walker build on."""
    import numpy as np

    # header: b"P6" <ws> width <ws> height <ws> maxval <single ws> raster
    if content[pos : pos + 2] != b"P6":
        raise ValueError(f"not a binary PPM (P6) payload at offset {pos}")
    pos, tokens = pos + 2, []
    while len(tokens) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(content[start:pos]))
    pos += 1  # the single whitespace byte before the raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (8-bit only)")
    px = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).astype(np.float64), pos + w * h * 3


def _ppm_pixels(content: bytes):
    """Parse a binary PPM (P6) payload into an (h, w, 3) float64 pixel
    array — the shared front half of decode and resize.  Pure numpy, no
    image library; '#' comment lines allowed between header tokens per
    the Netpbm spec."""
    px, _ = _parse_p6(content)
    return px


def _ppm_decode(content: bytes) -> dict:
    """Real image decode for binary PPM (P6) — a pure-numpy parser of
    the public Netpbm format, so the REAL codec path (parse header,
    reshape the pixel buffer, compute channel statistics) executes even
    where Pillow is absent.  Same feature definitions as ``_pil_decode``
    (per-channel means in [0,1], red-histogram entropy / 8)."""
    import numpy as np

    px = _ppm_pixels(content)
    h, w = px.shape[0], px.shape[1]
    n = w * h
    hist = np.bincount(px[:, :, 0].astype(np.int64).ravel(), minlength=256)
    p = hist[hist > 0] / n
    return {
        "mean_r": float(px[:, :, 0].mean() / 255.0),
        "mean_g": float(px[:, :, 1].mean() / 255.0),
        "mean_b": float(px[:, :, 2].mean() / 255.0),
        "entropy": float(-(p * np.log2(p)).sum() / 8.0),
    }


def encode_ppm(pixels) -> bytes:
    """Inverse of ``_ppm_decode`` for tests/fixtures: (h, w, 3) uint8
    array -> binary PPM bytes."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _real_decode(content: bytes) -> dict:
    """Strict-mode codec dispatch: built-in PPM parser for P6 payloads,
    Pillow for everything else when importable, otherwise a loud
    NotImplementedError (never a silent fake)."""
    if content.startswith(b"P6"):
        return _ppm_decode(content)
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "strict media decode: payload is not PPM (the built-in codec) "
            "and Pillow is not in this environment; see "
            "operators/multimodal.py"
        ) from exc
    return _pil_decode(content)


def decode_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract over mapInPandas (Arrow batches).

    strict=True uses a REAL codec — the built-in numpy PPM (P6) parser,
    or Pillow for other formats when importable — and raises
    NotImplementedError otherwise (never a silent fake); strict=False
    uses the deterministic fake so the Spark-side plumbing is testable
    on arbitrary bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _real_decode if strict else _fake_decode
        for pdf in batches:
            feats = pdf["content"].map(lambda b: decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "mean_r": [f["mean_r"] for f in feats],
                    "mean_g": [f["mean_g"] for f in feats],
                    "mean_b": [f["mean_b"] for f in feats],
                    "entropy": [f["entropy"] for f in feats],
                }
            )

    return media.mapInPandas(
        run,
        "media_id long, width int, height int, "
        "mean_r double, mean_g double, mean_b double, entropy double",
    )


def resize_plan(media: DataFrame, max_side: int) -> DataFrame:
    """Resize planning is pure metadata arithmetic — stays JVM-side; only
    the (stubbed) pixel resample would touch Python."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side, F.greatest(w, h).cast("double") / F.lit(max_side)
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "content",
        "meta",
        F.round(w / scale).cast("int").alias("target_width"),
        F.round(h / scale).cast("int").alias("target_height"),
    )


def frame_sample(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Video frame sampling: explode frame indices 0..n_frames-1, keep
    every nth — the shuffle-free explode pattern a real sampler uses."""
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1)
    return (
        media.select("media_id", "meta", F.explode(idx).alias("frame_idx"))
        .filter(F.col("frame_idx") % every_nth == 0)
    )


def _wav_samples(content: bytes):
    """Parse a PCM WAV (RIFF/WAVE) payload into ``(samples, sample_rate,
    n_channels)`` with samples normalized to [-1, 1] float64 — the
    sample-level primitive both the stats decode and the decimation
    resampler build on."""
    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = int.from_bytes(content[pos + 4 : pos + 8], "little")
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format {audio_format} (PCM only)")
    dtype, scale = {
        8: (np.uint8, 128.0),
        16: (np.int16, 32768.0),
        32: (np.int32, 2147483648.0),
    }.get(bits, (None, None))
    if dtype is None:
        raise ValueError(f"unsupported PCM width {bits}")
    samples = np.frombuffer(data, dtype=dtype).astype(np.float64)
    if bits == 8:
        samples -= 128.0  # 8-bit WAV is unsigned
    samples /= scale
    return samples, sample_rate, n_channels


def _wav_decode(content: bytes) -> dict:
    """Real audio decode for PCM WAV (RIFF/WAVE) — a pure-numpy parser
    of the public format (fmt + data chunks, 8/16/32-bit integer PCM),
    so the REAL audio path (container walk, sample reshape, signal
    stats) executes even though audio libraries are absent here.
    Returns sample_rate, n_channels, n_samples, duration_s, rms, peak
    (rms/peak over samples normalized to [-1, 1])."""
    import numpy as np

    samples, sample_rate, n_channels = _wav_samples(content)
    n_frames = len(samples) // n_channels
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_samples": n_frames,
        "duration_s": n_frames / sample_rate if sample_rate else 0.0,
        "rms": float(np.sqrt((samples**2).mean())) if len(samples) else 0.0,
        "peak": float(np.abs(samples).max()) if len(samples) else 0.0,
    }


def encode_wav(samples, sample_rate: int, n_channels: int = 1) -> bytes:
    """Inverse of ``_wav_decode`` for tests/fixtures: float array in
    [-1, 1] -> 16-bit PCM WAV bytes."""
    import numpy as np

    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def audio_features(media: DataFrame) -> DataFrame:
    """Audio decode + signal stats over mapInPandas (Arrow batches):
    the built-in numpy RIFF/WAVE parser runs per payload (a REAL codec,
    like the strict PPM image path), yielding (media_id, sample_rate,
    n_channels, n_samples, duration_s, rms, peak).  Non-WAV payloads
    raise readably — never a silent fake on the audio path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(lambda b: _wav_decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "n_channels": [f["n_channels"] for f in feats],
                    "n_samples": [f["n_samples"] for f in feats],
                    "duration_s": [f["duration_s"] for f in feats],
                    "rms": [f["rms"] for f in feats],
                    "peak": [f["peak"] for f in feats],
                }
            )

    return media.mapInPandas(
        run,
        "media_id long, sample_rate int, n_channels int, n_samples long, "
        "duration_s double, rms double, peak double",
    )


def resize_image_stats(media: DataFrame, target_side: int) -> DataFrame:
    """REAL nearest-neighbor image resize over the built-in PPM codec:
    parse each P6 payload to its (h, w, 3) pixel array, sample the
    ``target_side`` x ``target_side`` nearest-neighbor grid
    (``src = floor(dst * src_dim / target)`` — the standard NN rule),
    and emit the RESIZED image's per-channel means — the thumbnail
    stats a multimodal curation pipeline gates on.

    This is the real pixel path (upgrade of ``resize_plan``'s
    metadata-only arithmetic): the codec work is numpy over Arrow
    batches via ``mapInPandas``, one Python stage, no shuffle.
    Non-PPM payloads raise loudly (strict-codec gate).
    """
    import numpy as np
    import pandas as pd

    out_ddl = (
        "media_id long, src_width int, src_height int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = _ppm_pixels(bytes(content))
                h, w = px.shape[0], px.shape[1]
                sy = (np.arange(target_side) * h) // target_side
                sx = (np.arange(target_side) * w) // target_side
                small = px[np.ix_(sy, sx)]
                rows.append(
                    (
                        mid, w, h,
                        float(small[:, :, 0].mean() / 255.0),
                        float(small[:, :, 1].mean() / 255.0),
                        float(small[:, :, 2].mean() / 255.0),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "src_width", "src_height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return media.select("media_id", "content").mapInPandas(run, out_ddl)


def video_frame_stats(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """REAL video frame sampling over a concatenated-P6 stream (the
    "video" container here is N back-to-back binary PPM frames — the
    same stand-in trade the WAV/PPM codecs document: the CONTAINER WALK
    is real byte-level parsing even though a production deployment
    would swap in ffmpeg).  Walks the stream frame by frame, keeps
    every ``every_nth`` frame (0, n, 2n, ... — ffmpeg
    ``select=not(mod(n\\,k))`` semantics), and emits per-kept-frame
    channel means — the shot-sampling front half of a video curation
    pipeline.

    One Arrow-batched ``mapInPandas`` stage, no shuffle; relational ops
    never touch the raster (the 100 TB multimodal contract).
    """
    import pandas as pd

    out_ddl = (
        "media_id long, frame_idx int, width int, height int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content, pos, idx = bytes(content), 0, 0
                while pos < len(content):
                    px, pos = _parse_p6(content, pos)
                    if idx % every_nth == 0:
                        rows.append(
                            (
                                mid, idx, px.shape[1], px.shape[0],
                                float(px[:, :, 0].mean() / 255.0),
                                float(px[:, :, 1].mean() / 255.0),
                                float(px[:, :, 2].mean() / 255.0),
                            )
                        )
                    idx += 1
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return media.select("media_id", "content").mapInPandas(run, out_ddl)


def shot_boundaries(media: DataFrame, threshold: float) -> DataFrame:
    """Shot-boundary (scene-cut) detection over the concatenated-P6
    stream: mean absolute per-pixel difference between CONSECUTIVE
    frames, a cut flagged where the normalized difference exceeds
    ``threshold`` — the classic histogram/pixel-difference detector
    every video curation pipeline runs before per-shot sampling.

    Emits one row per consecutive frame pair (media_id, frame_idx of
    the LATER frame, diff in [0,1], is_cut).  Same single Arrow-batched
    ``mapInPandas`` shape as ``video_frame_stats`` — the raster never
    enters a relational op.
    """
    import numpy as np
    import pandas as pd

    out_ddl = "media_id long, frame_idx int, diff double, is_cut boolean"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content, pos, idx, prev = bytes(content), 0, 0, None
                while pos < len(content):
                    px, pos = _parse_p6(content, pos)
                    if prev is not None:
                        if px.shape != prev.shape:
                            raise ValueError(
                                "shot_boundaries: frame size changed mid-"
                                f"stream at frame {idx} (media {mid})"
                            )
                        d = float(np.abs(px - prev).mean() / 255.0)
                        rows.append((mid, idx, d, d > threshold))
                    prev = px
                    idx += 1
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "diff", "is_cut"]
            )

    return media.select("media_id", "content").mapInPandas(run, out_ddl)


def dhash64(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash, Krawetz 2013) over the RED
    plane of each binary-PPM payload: NN-sample the image to a
    ``grid x (grid+1)`` grid (src = floor(dst*src_dim/target), the same
    index rule as ``resize_image_stats``), set bit (ty, tx) when the
    pixel right of (ty, tx) is strictly brighter, and pack the
    ``grid*grid`` bits into two exact int64 words (rows 0..grid/2-1 ->
    ``w0``, rest -> ``w1``; bit index ty*grid+tx within each word).

    Two 32-bit halves rather than one 64-bit word keeps every value
    exactly representable across engines (same trick as
    ``similarity.binary_sketch``).  Returns ``(media_id, w0, w1)``.

    Scale: one Arrow-batched ``mapInPandas`` decode pass, map-only —
    the hash is 16 bytes per image no matter the resolution, so the
    downstream dedup never touches pixels again.
    """
    import numpy as np
    import pandas as pd

    half = (grid * grid) // 2

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = _ppm_pixels(bytes(content))
                h, w = px.shape[:2]
                red = px[:, :, 0]
                sy = (np.arange(grid) * h) // grid
                sx = (np.arange(grid + 1) * w) // (grid + 1)
                g = red[np.ix_(sy, sx)]
                flat = (g[:, 1:] > g[:, :-1]).astype(np.int64).ravel()
                w0 = int((flat[:half] << np.arange(half)).sum())
                w1 = int((flat[half:] << np.arange(half)).sum())
                out.append((int(mid), w0, w1))
            yield pd.DataFrame(out, columns=["media_id", "w0", "w1"])

    return media.select("media_id", "content").mapInPandas(
        run, "media_id long, w0 long, w1 long"
    )


def dhash_near_pairs(sig: DataFrame, max_dist: int = 3) -> DataFrame:
    """All image pairs within ``max_dist`` Hamming bits of each other —
    EXACT near-duplicate detection via multi-index hashing (Norouzi et
    al. 2012): the 64-bit signature splits into 4 disjoint 16-bit
    bands; by pigeonhole, any pair within ``max_dist <= 3`` bits agrees
    EXACTLY on at least one band, so candidates come from equi-joins on
    (band index, band value) and the popcount filter only runs on
    candidates — never all pairs.

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``, one row per
    pair.  Raises when ``max_dist`` exceeds the pigeonhole guarantee.

    Scale shape: explode to 4 rows per image, ONE shuffle on the fused
    band key (idx*2^16 + value), per-bucket candidate pairs, exact
    XOR+popcount filter, then a distinct on surviving pairs — the
    image-dedup analogue of the MinHash-LSH banded self-join, but with
    a completeness PROOF instead of a probability.
    """
    n_bands = 4
    if max_dist >= n_bands:
        raise ValueError(
            f"dhash_near_pairs: max_dist={max_dist} breaks the pigeonhole "
            f"guarantee with {n_bands} bands (need max_dist < {n_bands})"
        )
    mask = F.lit((1 << 16) - 1)
    bands = F.array(
        F.col("w0").bitwiseAND(mask),
        F.shiftright("w0", 16).bitwiseAND(mask) + F.lit(1 << 16),
        F.col("w1").bitwiseAND(mask) + F.lit(2 << 16),
        F.shiftright("w1", 16).bitwiseAND(mask) + F.lit(3 << 16),
    )
    e = sig.select("media_id", "w0", "w1", F.explode(bands).alias("__band"))
    a = e.select(
        F.col("media_id").alias("id_a"),
        F.col("w0").alias("__a0"),
        F.col("w1").alias("__a1"),
        "__band",
    )
    b = e.select(
        F.col("media_id").alias("id_b"),
        F.col("w0").alias("__b0"),
        F.col("w1").alias("__b1"),
        "__band",
    )
    dist = (
        F.bit_count(F.col("__a0").bitwiseXOR(F.col("__b0")))
        + F.bit_count(F.col("__a1").bitwiseXOR(F.col("__b1")))
    ).cast("int")
    return (
        a.join(b, ["__band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("dist"))
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )


def audio_decimate(media: DataFrame, factor: int) -> DataFrame:
    """Integer-factor audio decimation (ffmpeg ``aresample`` family,
    nearest/drop mode): keep every ``factor``-th PCM frame, emitting the
    decimated signal's stats — ``(media_id, sample_rate_out, n_out,
    mean_amp, peak)`` with ``mean_amp`` the SIGNED mean so an oracle can
    tell exactly which samples survived (an averaging resampler would
    pass a mean-check too; a wrong stride will not).

    Multi-channel payloads decimate whole frames (all channels of frame
    i survive together).  No anti-alias filter — this is the drop
    resampler; a production path would low-pass first.

    Scale: one Arrow-batched ``mapInPandas`` pass, map-only, numpy
    strided view — no copy of the dropped samples.
    """
    import numpy as np

    if factor < 1:
        raise ValueError(f"audio_decimate: factor must be >= 1, got {factor}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                samples, rate, nch = _wav_samples(bytes(content))
                frames = samples.reshape(-1, nch)[::factor]
                kept = frames.ravel()
                rows.append(
                    (
                        int(mid),
                        rate // factor,
                        len(frames),
                        float(kept.mean()) if len(kept) else 0.0,
                        float(np.abs(kept).max()) if len(kept) else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate_out", "n_out", "mean_amp", "peak"],
            )

    return media.select("media_id", "content").mapInPandas(
        run,
        "media_id long, sample_rate_out int, n_out long, mean_amp double, peak double",
    )


def phash64(media: DataFrame, size: int = 32, block: int = 8) -> DataFrame:
    """Perceptual DCT hash (pHash, Krawetz 2013 / Zauner 2010 — public):
    NN-sample the red plane to ``size x size`` float64, apply the
    orthonormal 2-D DCT-II (explicit cosine matrix — deterministic, no
    FFT library), keep the top-left ``block x block`` low-frequency
    coefficients, and set bit (ty, tx) when the coefficient exceeds the
    MEDIAN of the block (DC included in the block but excluded from the
    median, the standard convention).  Bits pack into two exact int64
    words exactly like :func:`dhash64`, so :func:`dhash_near_pairs`
    serves both hash families unchanged.

    dHash vs pHash trade (both kept deliberately): dHash is gradient-
    based — cheap, crop-sensitive; pHash is frequency-based — robust to
    brightness/contrast scaling (any monotonic intensity map preserves
    coefficient ORDER against the median) and mild blur.  Returns
    ``(media_id, w0, w1)``.

    Scale: map-only Arrow-batched decode; the DCT is two ``size x size``
    GEMMs per image (numpy, per batch), and the wire cost stays 16
    bytes per image.
    """
    import numpy as np
    import pandas as pd

    half = (block * block) // 2
    n = size
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    C = np.sqrt(2.0 / n) * np.cos(np.pi * (x + 0.5) * k / n)
    C[0, :] *= 1.0 / np.sqrt(2.0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = _ppm_pixels(bytes(content))
                h, w = px.shape[:2]
                red = px[:, :, 0].astype(np.float64)
                sy = (np.arange(n) * h) // n
                sx = (np.arange(n) * w) // n
                g = red[np.ix_(sy, sx)]
                d = C @ g @ C.T
                lowf = d[:block, :block].ravel()
                med = np.median(lowf[1:])  # DC excluded from the median
                flat = (lowf > med).astype(np.int64)
                w0 = int((flat[:half] << np.arange(half)).sum())
                w1 = int((flat[half:] << np.arange(half)).sum())
                out.append((int(mid), w0, w1))
            yield pd.DataFrame(out, columns=["media_id", "w0", "w1"])

    return media.select("media_id", "content").mapInPandas(
        run, "media_id long, w0 long, w1 long"
    )


def exact_dedup(
    media: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Exact content-hash dedup for binary media columns — the first
    stage of every multimodal curation pipeline (byte-identical images/
    audio collapse before the expensive perceptual pass, dhash/phash).

    One groupBy on ``sha2(content, 256)``: the 32-byte digest is the
    shuffle key (never the payload bytes — at 100 TB the exchange moves
    hashes, not media), each group keeps its lowest id and the copy
    count.  Same survivor convention as operators/dedup.py:exact_dedup.
    """
    return media.groupBy(
        F.sha2(F.col(content_col), 256).alias("content_sha256")
    ).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )

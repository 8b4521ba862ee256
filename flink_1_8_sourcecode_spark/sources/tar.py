"""WebDataset-style tar-shard reading.

Large multimodal training corpora ship as directories of .tar shards
whose members are (sample key, extension) pairs — e.g. ``000123.jpg`` +
``000123.txt`` + ``000123.json`` (the public WebDataset convention).
This reads such shards distributed: Spark's binaryFile source
parallelizes over shards (one task per shard — the format's own
parallel unit; shards are sized for exactly this), and the stdlib
``tarfile`` walks each shard's members inside a mapInPandas pass.

Complements sources/avro.py (row containers) with the blob-container
side of the ingestion story; the decoded (key, ext, content) rows feed
the multimodal operators (operators/multimodal.py) directly.
"""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TAR_ROW_SCHEMA = (
    "shard string, member string, sample_key string, ext string, content binary"
)


def read_tar_shards(
    spark: SparkSession, path: str, suffixes: list[str] | None = None,
    split: str = "first",
) -> DataFrame:
    """Read every member of every tar shard under ``path`` as
    ``(shard, member, sample_key, ext, content)`` rows.

    ``sample_key``/``ext`` split the member name at the FIRST dot of
    the BASENAME (the WebDataset convention: everything after the first
    dot is the extension, so multi-dot modalities group with their
    siblings — ``a/b/000123.seg.png`` -> key ``a/b/000123``, ext
    ``seg.png``, grouping with ``a/b/000123.jpg``).  ``split="last"``
    selects the plain-filename rule (key up to the last dot) for
    non-WebDataset archives.  ``suffixes`` filters members by extension
    BEFORE the bytes leave the decode task (column-pruning for blobs: a
    text-only consumer never materializes the image payloads
    downstream); each suffix matches the full WebDataset extension OR
    its final dot-component (``"png"`` admits ``seg.png``).

    Scale: one task per shard; member iteration is streaming (tarfile
    reads headers sequentially, extracting only requested payloads).
    Group a sample's modalities with ``groupBy("sample_key")`` —
    members of one sample live in ONE shard by convention, so that
    groupBy's exchange only moves rows within what a shard-local
    combine already reduced.
    """
    if split not in ("first", "last"):
        raise ValueError(f"split must be 'first' or 'last', got {split!r}")
    want = None if suffixes is None else {s.lstrip(".").lower() for s in suffixes}

    def walk(batches):
        import pandas as pd

        for pdf in batches:
            for shard_path, raw in zip(pdf["path"], pdf["content"]):
                rows = {"shard": [], "member": [], "sample_key": [],
                        "ext": [], "content": []}
                with tarfile.open(fileobj=io.BytesIO(bytes(raw))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        name = m.name
                        if split == "first":
                            dirname, _, basename = name.rpartition("/")
                            stem, dot, ext = basename.partition(".")
                            base = f"{dirname}/{stem}" if dirname else stem
                        else:
                            base, dot, ext = name.rpartition(".")
                        if not dot:
                            base, ext = name, ""
                        lext = ext.lower()
                        if want is not None and (
                            lext not in want
                            and lext.rpartition(".")[2] not in want
                        ):
                            continue
                        f = tf.extractfile(m)
                        rows["shard"].append(shard_path)
                        rows["member"].append(name)
                        rows["sample_key"].append(base)
                        rows["ext"].append(ext)
                        rows["content"].append(f.read() if f else b"")
                if rows["member"]:
                    yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(walk, TAR_ROW_SCHEMA)


def write_tar_shard(path: str, members: dict[str, bytes]) -> None:
    """Write one tar shard (fixture writer for tests / round-trips):
    ``members`` maps member name -> payload bytes.  Deterministic
    metadata (zeroed mtime/uid/gid) so identical inputs produce
    byte-identical shards."""
    with tarfile.open(path, "w") as tf:
        for name in sorted(members):
            data = members[name]
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            tf.addfile(info, io.BytesIO(data))


def assemble_samples(
    df: DataFrame, exts: list[str], require_all: bool = False
) -> DataFrame:
    """Pivot tar-member rows into one row PER SAMPLE with a binary
    column per modality: (sample_key, <ext1>, <ext2>, ...) — the shape
    the multimodal operators consume (operators/multimodal.py's opaque
    binary + metadata contract).

    ``require_all=True`` keeps only samples carrying every requested
    modality (inner semantics — the WebDataset default of skipping
    incomplete samples); otherwise missing modalities are NULL.

    Scale: one sample-key exchange; since a sample's members live in
    one shard by convention, partial aggregation collapses the pivot
    map-side and the exchange carries one row per sample."""
    cols = [
        F.max(F.when(F.col("ext") == e, F.col("content"))).alias(e) for e in exts
    ]
    out = df.filter(F.col("ext").isin(*exts)).groupBy("sample_key").agg(*cols)
    if require_all:
        for e in exts:
            out = out.filter(F.col(e).isNotNull())
    return out

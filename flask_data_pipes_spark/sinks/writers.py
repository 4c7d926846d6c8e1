"""Sinks: staged JSONL writer with dated layout + atomic commit, and
JDBC load (reference: flask_data_pipes/data_pipes/pipeline.py:751-851
writer/commit; 635-696 load).

Layout parity: `<stage dir>/<model dir>/YYYY/MM/DD/<filename>[.jsonl.gz]`
(reference pipeline.py:786-799, 838-841). The "file" unit is a
directory of part files — Spark's native committer already implements
the reference's temp-write → rename protocol (FileOutputCommitter;
SURVEY §4), so atomicity comes from the engine, and the metadata
upsert happens only after the write returns (exactly-once commit
ordering preserved).

Serialization parity (pipeline.py:75, ext/serializers.py:7-16):
timestamps ISO-8601 with Z suffix, non-ASCII preserved (Spark writes
UTF-8 unescaped), gzip optional.
"""

from __future__ import annotations

import os
from datetime import date, datetime
from typing import Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dated_path",
    "write_jsonl",
    "write_parquet",
    "write_jdbc",
    "write_sorted_parquet",
    "compact_parquet",
]


def dated_path(
    stage_dir: str,
    directory: str,
    filename: str,
    created: Union[str, date, datetime, None] = None,
) -> str:
    """`<stage_dir>/<directory>/YYYY/MM/DD/<filename>` (pipeline.py:786-792)."""
    if created is None:
        created = datetime.utcnow()
    if isinstance(created, str):
        created = datetime.fromisoformat(created[:19])
    return os.path.join(
        stage_dir,
        directory,
        f"{created.year:04d}",
        f"{created.month:02d}",
        f"{created.day:02d}",
        filename,
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: Optional[str] = "gzip",
    mode: str = "overwrite",
) -> str:
    """Streamed JSONL write (W1/W2). One output partition per input
    partition — at scale, repartition upstream to target file sizes
    (128-512 MB post-compression), never here (a blind coalesce(1)
    would serialize the write)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
    ).json(path)
    return path


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[list[str]] = None,
) -> str:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: Optional[int] = None,
    **options,
) -> None:
    """Bulk DB load (W3): multi-row executemany per partition. The
    reference's `batches=N` knob (W4, decorators.py:273-294) maps to
    JDBC `batchsize` — commit cadence per executor partition."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if batchsize:
        writer = writer.option("batchsize", str(batchsize))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_partitions: Optional[int] = None,
    mode: str = "overwrite",
) -> str:
    """Range-clustered parquet write: `repartitionByRange` on the
    cluster columns + a partition-local sort, so every output file
    covers a tight value range. Parquet row-group min/max statistics
    then let later scans with predicates on those columns skip whole
    files/row-groups — the poor-man's Z-order, and the single highest
    -leverage layout choice for a 100 TB fact table that is filtered
    by date/key ranges.

    The range exchange samples the data to build balanced boundaries
    (no manual histogram needed); the sort is per-partition, never
    global."""
    part = df.repartitionByRange(
        *( [num_partitions] if num_partitions else [] ), *[F.col(c) for c in cluster_by]
    ).sortWithinPartitions(*cluster_by)
    part.write.mode(mode).parquet(path)
    return path


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~`target_file_bytes` (on-disk size based). Streaming ingest and
    fine-grained partitioning both breed thousands of KB-sized files;
    at scale the file listing + task-per-file overhead dominates reads
    long before data volume does. Returns the new file count.

    Writes to a temp sibling then swaps, so a failed compaction never
    destroys the input (the reference's temp-then-rename commit, W2,
    at directory granularity)."""
    import math
    import os
    import shutil

    size = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(size / target_file_bytes))
    tmp = path.rstrip("/") + "._compact_tmp"
    spark.read.parquet(path).repartition(n).write.mode(mode).parquet(tmp)
    final = path.rstrip("/")
    bak = final + "._compact_old"
    os.rename(final, bak)
    os.rename(tmp, final)
    shutil.rmtree(bak)
    return n

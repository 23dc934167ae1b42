"""Shard routing + offline shard build (reference §2.2 K2, K4-K6).

K2: the sharded classic sink routes each doc to one of N servers by an MD5
prefix of its id — HashSharder.java:42-58 computes
``((md5[0] & 0xFF) << 8 + (md5[1] & 0xFF)) % numShards``, i.e. the first
two md5 bytes as a 16-bit big-endian int.  Reproduced exactly, JVM-side:
the first 4 hex chars of ``md5(id)`` parsed base-16.

K4: the offline build materializes one self-contained shard per reducer
(SolrRecordWriter.java:58-190).  Spark-first: a single shuffle
(`repartition(n, shard)`) followed by a partitioned write — one directory
per shard, each written by exactly one task per file.  K5's multi-level
tree merge exists only because MapReduce lacked a general shuffle; it is
intentionally absent here.  K6 go-live = the IndexStore's atomic
version-pointer flip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_shard(col: Column, n_shards: int) -> Column:
    """Exact HashSharder.java:42-58 semantics (verified byte-for-byte:
    first-two-md5-bytes big-endian == first 4 hex chars base-16)."""
    prefix16 = F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
    return F.pmod(prefix16.cast("int"), F.lit(n_shards))


def md5_shard_sql(key: str, n_shards: int) -> str:
    """The DuckDB-equivalent expression (oracle mirror of md5_shard)."""
    return f"(CAST(('0x' || substr(md5({key}), 1, 4)) AS INTEGER) % {n_shards})"


def route(docs: DataFrame, key: str, n_shards: int,
          shard_col: str = "shard") -> DataFrame:
    """K2 — tag each doc with its shard (Indexer.java:153-175 routing)."""
    return docs.withColumn(shard_col, md5_shard(F.col(key), n_shards))


def write_sharded(docs: DataFrame, path: str, key: str, n_shards: int) -> None:
    """K4 — offline shard build: one directory per shard, co-located by one
    shuffle (the SolrCloudPartitioner + reducer-per-shard pipeline,
    HBaseMapReduceIndexerTool.java:388-416, collapsed into
    repartition+partitionBy)."""
    (
        route(docs, key, n_shards)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )

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


def shard_manifest(docs: DataFrame, key: str = "doc_id",
                   n_shards: int = 8,
                   text_col: str = "text") -> DataFrame:
    """Content-addressable integrity manifest for a sharded corpus
    publish: per shard (same MD5 routing as :func:`write_sharded`) the
    doc count, token total, and an order-independent content checksum —
    what a consumer verifies BEFORE training on a delivered corpus, and
    what makes two independently-produced publishes comparable without
    reading either.

    ``checksum`` is ``bit_xor`` over each doc's 60-bit content hash:
    commutative/associative, so it map-side-combines and is invariant
    to partition layout — no per-shard sort or collect_list of hashes
    (a million-doc shard would otherwise buffer 32 MB per group).

    Returns ``(shard, n_docs, n_tokens, checksum)``."""
    from hbase_indexer_spark.pipeline.text import token_count, token_hash60

    return (
        docs.select(
            md5_shard(F.col(key), n_shards).alias("shard"),
            token_count(F.col(text_col)).cast("long").alias("nt"),
            token_hash60(F.col(text_col)).alias("h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.expr("bit_xor(h)").alias("checksum"),
        )
    )


def shard_manifest_sql(key: str = "doc_id", n_shards: int = 8,
                       table: str = "documents") -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    return f"""
        SELECT {md5_shard_sql(f"CAST({key} AS VARCHAR)", n_shards)} AS shard,
               count(*) AS n_docs,
               CAST(sum(CAST(len({TOKS_SQL}) AS BIGINT)) AS BIGINT) AS n_tokens,
               bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
                   AS checksum
        FROM {table}
        GROUP BY 1
    """


def rendezvous_shard(col: Column, n_shards: int,
                     salt: str = "#") -> Column:
    """Rendezvous (highest-random-weight) shard assignment (r9): the
    key goes to ``argmax over s of md5(key + salt + s)`` — Thaler &
    Ravishankar's consistent placement.  The K2 MD5-mod router
    (:func:`md5_shard`) remaps ``(n-1)/n`` of all keys when the shard
    count changes; rendezvous moves EXACTLY the keys whose new shard
    wins the argmax, ``~1/(n+1)`` on grow — the elastic-reshard
    property a 100 TB sharded store needs (resizing reshuffles one
    shard's worth of data, not the corpus).

    Pure map-side expression (an ``array_max`` over ``n`` md5 structs,
    no shuffle, no UDF); md5 hex strings are fixed-length so their
    lexicographic max is the numeric max, and the (weight, shard)
    struct comparison makes even a (practically impossible) weight tie
    deterministic.  Mirrored term-for-term in
    :func:`rendezvous_shard_sql` — md5 is bit-identical cross-engine."""
    key = col.cast("string")
    weights = F.array(*[
        F.struct(
            F.md5(F.concat(key, F.lit(f"{salt}{s}"))).alias("w"),
            F.lit(s).alias("shard"),
        )
        for s in range(int(n_shards))
    ])
    return F.array_max(weights)["shard"]


def rendezvous_shard_sql(key: str, n_shards: int, salt: str = "#") -> str:
    """DuckDB mirror of :func:`rendezvous_shard` (arg_max over the
    per-shard md5 weights)."""
    return f"""(
        SELECT arg_max(s, md5({key} || '{salt}' || s))
        FROM unnest(generate_series(0, {int(n_shards) - 1})) AS t(s)
    )"""

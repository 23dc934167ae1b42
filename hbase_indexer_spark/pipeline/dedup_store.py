"""Persistent incremental-dedup state: continuous corpus screening
without ever re-reading accepted text.

``dedup_against`` screens a batch against a base CORPUS — it re-shingles
the base every run.  At 100 TB that re-read dominates; the production
shape keeps a standing index of what screening actually needs:

    (doc_id, h, sig)          one md5 content hash + 48 minhash sigs/doc
    + derived band keys       the LSH bucket addresses

``DedupIndexStore`` persists exactly that (a few hundred bytes/doc,
~10^4x smaller than the text), versioned with the same atomic go-live
flip as the document stores (``sinks/index_store.py``).  The daily loop
becomes::

    verdicts = store.screen(new_docs)          # exact + near verdicts
    keeps    = new_docs.join(verdicts.filter("keep"), "doc_id")
    ...                                        # in-batch dedup, curation
    store.accept(keeps)                        # state += their sketches

Near-dup verification uses the MinHash ESTIMATE (matching signature
fraction >= threshold) rather than exact Jaccard — the standard
state-only trade: with 48 sigs the estimator's std error is
sqrt(J(1-J)/48) ~ 0.066 at J = 0.7.  The stateless, exactly-verified
paths (`dedup_against`, gate queries) remain the correctness oracle;
this class is the state-management layer above them (and is why its
verdicts are unit-tested, not oracle-gated).

Scale: `screen` is two joins against hash/band projections (band join
candidates bounded by bucket collisions, never |new| x |base|);
`accept` appends sketch rows through the versioned merge — O(batch)
writes, O(1) state reads per batch beyond the joined partitions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.dedup import (
    N_SIGS,
    band_keys,
    exploded_shingles,
    sigs_from_shingles,
)
from hbase_indexer_spark.sinks.index_store import IndexStore


def doc_sketches(docs: DataFrame, n: int = 3) -> DataFrame:
    """Reduce documents to their dedup sketches:
    ``(doc_id, h, sig array<long>)`` — everything screening ever needs."""
    sh = exploded_shingles(docs, n)
    sigs = (
        sigs_from_shingles(sh)
        .select("doc_id", F.array(
            *[F.col(f"s{i}") for i in range(N_SIGS)]).alias("sig"))
    )
    return (
        docs.select("doc_id", F.md5("text").alias("h"))
        .join(sigs, "doc_id", "left")
    )


class DedupIndexStore:
    """Versioned store of accepted-corpus dedup sketches; see module
    docstring for the contract."""

    def __init__(self, path: str, threshold: float = 0.7, n: int = 3):
        self.store = IndexStore(path, key="doc_id")
        self.threshold = threshold
        self.n = n

    # -- state ------------------------------------------------------------

    def sketches(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read(spark)

    def accept(self, spark: SparkSession, docs: DataFrame) -> None:
        """Add a batch's sketches to the accepted state (idempotent per
        doc_id — re-accepting a doc overwrites its identical sketch)."""
        self.store.merge(spark, adds=doc_sketches(docs, self.n))

    # -- screening --------------------------------------------------------

    def screen(self, spark: SparkSession, new: DataFrame) -> DataFrame:
        """Per new doc: ``exact_dup`` (content hash in state),
        ``near_dup`` (some state doc with signature-estimated Jaccard
        >= threshold among band-collision candidates), ``keep``."""
        state = self.sketches(spark)
        new_sk = doc_sketches(new, self.n)
        if state is None:
            return new.select(
                "doc_id",
                F.lit(False).alias("exact_dup"),
                F.lit(False).alias("near_dup"),
                F.lit(True).alias("keep"),
            )
        exact = (
            new_sk.join(state.select(F.col("h")).distinct(), "h",
                        "left_semi")
            .select("doc_id").withColumn("exact_dup", F.lit(True))
        )
        # ceil: near_dup fires at estimated Jaccard >= threshold exactly
        # (int() would floor — at 0.7 * 48 that fires from 33/48 = 0.6875)
        min_match = math.ceil(self.threshold * N_SIGS)
        bn = self._bands(new_sk).withColumnRenamed("doc_id", "new_id")
        bb = self._bands(state).withColumnRenamed("doc_id", "base_id")
        cands = bn.join(bb, ["band", "bkey"]) \
            .select("new_id", "base_id").distinct()
        sig_n = new_sk.select(F.col("doc_id").alias("new_id"),
                              F.col("sig").alias("sig_n"))
        sig_b = state.select(F.col("doc_id").alias("base_id"),
                             F.col("sig").alias("sig_b"))
        near = (
            cands.join(sig_n, "new_id").join(sig_b, "base_id")
            .withColumn(
                "n_match",
                F.size(F.filter(
                    F.zip_with(F.col("sig_n"), F.col("sig_b"),
                               lambda a, b: a == b),
                    lambda x: x)))
            .filter(F.col("n_match") >= min_match)
            .select(F.col("new_id").alias("doc_id")).distinct()
            .withColumn("near_dup", F.lit(True))
        )
        return (
            new.select("doc_id")
            .join(exact, "doc_id", "left").join(near, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
                F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
                (~(F.coalesce("exact_dup", F.lit(False))
                   | F.coalesce("near_dup", F.lit(False)))).alias("keep"),
            )
        )

    def _bands(self, sketches: DataFrame) -> DataFrame:
        sigs = sketches.filter(F.col("sig").isNotNull()).select(
            "doc_id",
            *[F.element_at(F.col("sig"), i + 1).alias(f"s{i}")
              for i in range(N_SIGS)])
        return band_keys(sigs)

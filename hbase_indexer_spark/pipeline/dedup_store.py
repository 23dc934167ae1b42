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
from hbase_indexer_spark.pipeline.text import QUALITY_SQL
from hbase_indexer_spark.sinks.index_store import IndexStore


def doc_sketches(docs: DataFrame, n: int = 3) -> DataFrame:
    """Reduce documents to their dedup sketches:
    ``(doc_id, h, sig array<long>)`` — everything screening ever needs."""
    sh = exploded_shingles(docs, n)
    sigs = (
        sigs_from_shingles(sh)
        .selectExpr("doc_id", "array({}) AS sig".format(
            ", ".join(f"s{i}" for i in range(N_SIGS))))
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

    def accept(self, spark: SparkSession, docs: DataFrame,
               sketches: DataFrame | None = None) -> None:
        """Add a batch's sketches to the accepted state (idempotent per
        doc_id — re-accepting a doc overwrites its identical sketch).
        Pass ``sketches`` (the batch's ``doc_sketches`` frame, possibly
        pre-materialized by the caller) to skip re-shingling the text."""
        if sketches is None:
            sketches = doc_sketches(docs, self.n)
        self.store.merge(spark, adds=sketches)

    # -- screening --------------------------------------------------------

    def screen(self, spark: SparkSession, new: DataFrame,
               sketches: DataFrame | None = None) -> DataFrame:
        """Per new doc: ``exact_dup`` (content hash in state),
        ``near_dup`` (some state doc with signature-estimated Jaccard
        >= threshold among band-collision candidates), ``keep``.

        ``sketches`` lets the caller hand in a pre-materialized
        ``doc_sketches`` frame: the sketch subtree appears three times in
        this plan (exact join, band join, sig join), so a caller-side
        ``localCheckpoint`` turns three shingle passes into RDD scans —
        and the same frame feeds :meth:`accept` afterwards."""
        state = self.sketches(spark)
        new_sk = doc_sketches(new, self.n) if sketches is None else sketches
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
        sigs = sketches.filter(F.col("sig").isNotNull()).selectExpr(
            "doc_id",
            *[f"element_at(sig, {i + 1}) AS s{i}" for i in range(N_SIGS)])
        return band_keys(sigs)


def screen_batches(spark: SparkSession, docs: DataFrame, state_path: str,
                   threshold: float = 0.7, n: int = 3,
                   n_batches: int = 3) -> DataFrame:
    """The continuous-curation loop driven end-to-end through a
    ``DedupIndexStore`` as an oracle-able query: split ``docs`` into
    ``n_batches`` deterministic batches (``doc_id % n_batches``), then
    sequentially screen each batch against the state accumulated from
    the KEPT docs of all earlier batches and fold the keeps back in.

    Returns one verdict row per doc: ``(doc_id, batch, exact_dup,
    near_dup, keep)`` — the exact-replayable transcript of the stateful
    screen (batch 0 all-keeps against the empty state; a dup arriving
    in batch N+1 of a doc kept in batch N is dropped).  Mirrored
    term-for-term by :func:`dedup_store_screen_sql` (the MinHash
    estimator, the ceil'd match floor, and the band-candidate
    constraint are all deterministic).

    Each batch's verdicts are eagerly ``localCheckpoint``-ed: the store
    retains a bounded number of versions (go-live semantics), so a lazy
    plan re-run after later accepts would read a vacuumed version dir.

    Scale: per batch this is the store's own screen/accept contract —
    band-bounded joins against sketch state ~10^4x smaller than text;
    the batch loop adds nothing beyond it."""
    store = DedupIndexStore(state_path, threshold=threshold, n=n)
    outs = []
    for b in range(n_batches):
        batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(n_batches))
                            == F.lit(b))
        # one shingle pass per batch: the materialized sketches feed the
        # screen's three sketch-consuming joins AND the accept merge
        sk = doc_sketches(batch, n).localCheckpoint(eager=True)
        verdicts = store.screen(spark, batch, sketches=sk) \
            .localCheckpoint(eager=True)
        keep_ids = verdicts.filter(F.col("keep")).select("doc_id")
        store.accept(spark, batch,
                     sketches=sk.join(keep_ids, "doc_id", "left_semi"))
        outs.append(verdicts.withColumn("batch", F.lit(b).cast("long")))
    out = outs[0]
    for v in outs[1:]:
        out = out.unionByName(v)
    return out.select("doc_id", "batch", "exact_dup", "near_dup", "keep")


def _screen_ctes(threshold: float, n: int, n_batches: int,
                 keep_gate: str = "",
                 intra_batch_first: bool = False) -> str:
    """The shared CTE body replaying the sequential stateful screen in
    DuckDB: sketches, per-batch verdicts v{b}, and cumulative kept{b}
    state sets.  ``keep_gate`` is an extra SQL predicate (over a ``qual``
    CTE alias ``q``) a doc must also pass to enter the state — the
    curation quality gate; empty = pure screen (dedup_store_screen).
    ``intra_batch_first`` restricts each batch's admissions to the min
    doc_id per exact text — mirroring the curation loop's intra-batch
    dedup (the transcript form keeps all verdicts and leaves in-batch
    dedup to the caller, per the module docstring)."""
    from hbase_indexer_spark.pipeline.dedup import (
        N_BANDS,
        P,
        PERMS,
        ROWS_PER_BAND,
        shingle_cte_sql,
    )

    min_match = math.ceil(threshold * N_SIGS)
    mins = ", ".join(f"min((h * {a} + {b}) % {P}) AS s{i}"
                     for i, (a, b) in enumerate(PERMS))
    band_or = " OR ".join(
        "(" + " AND ".join(
            f"nw.s{band * ROWS_PER_BAND + j} = st.s{band * ROWS_PER_BAND + j}"
            for j in range(ROWS_PER_BAND)) + ")"
        for band in range(N_BANDS))
    n_match = " + ".join(
        f"(CASE WHEN nw.s{i} = st.s{i} THEN 1 ELSE 0 END)"
        for i in range(N_SIGS))
    sig_cols = ", ".join(f"s{i}" for i in range(N_SIGS))
    gate_join = (f"JOIN qual q ON q.doc_id = s.doc_id AND ({keep_gate})"
                 if keep_gate else "")
    if intra_batch_first:
        gate_join += (" JOIN fb ON fb.batch = s.batch"
                      " AND fb.doc_id = s.doc_id")
    fb_cte = (""",
        fb AS (
            SELECT batch, ch, min(doc_id) AS doc_id
            FROM sk GROUP BY batch, ch
        )""" if intra_batch_first else "")
    ctes = [f"""{shingle_cte_sql(n)},
        hashed AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {P} AS h
            FROM sh
        ),
        sigs AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
        qual AS (
            SELECT doc_id, n_tokens, {QUALITY_SQL} AS quality
            FROM (SELECT doc_id, toks, len(toks) AS n_tokens FROM tk)
        ),
        sk AS (
            SELECT d.doc_id, d.doc_id % {n_batches} AS batch,
                   md5(d.text) AS ch, {sig_cols}
            FROM documents d LEFT JOIN sigs USING (doc_id)
        ){fb_cte},
        kept0 AS (SELECT s.* FROM sk s {gate_join} WHERE s.batch = 0),
        v0 AS (
            SELECT doc_id, CAST(0 AS BIGINT) AS batch,
                   FALSE AS exact_dup, FALSE AS near_dup, TRUE AS keep
            FROM sk WHERE batch = 0
        )"""]
    for b in range(1, n_batches):
        prev = f"kept{b - 1}"
        ctes.append(f"""
        ex{b} AS (
            SELECT DISTINCT nw.doc_id
            FROM sk nw JOIN {prev} st ON nw.ch = st.ch
            WHERE nw.batch = {b}
        ),
        nr{b} AS (
            SELECT DISTINCT nw.doc_id
            FROM sk nw JOIN {prev} st ON ({band_or})
            WHERE nw.batch = {b} AND ({n_match}) >= {min_match}
        ),
        v{b} AS (
            SELECT nw.doc_id, CAST({b} AS BIGINT) AS batch,
                   (e.doc_id IS NOT NULL) AS exact_dup,
                   (r.doc_id IS NOT NULL) AS near_dup,
                   (e.doc_id IS NULL AND r.doc_id IS NULL) AS keep
            FROM sk nw
            LEFT JOIN ex{b} e ON nw.doc_id = e.doc_id
            LEFT JOIN nr{b} r ON nw.doc_id = r.doc_id
            WHERE nw.batch = {b}
        ),
        kept{b} AS (
            SELECT * FROM {prev}
            UNION ALL
            SELECT s.* FROM sk s
            JOIN v{b} v ON s.doc_id = v.doc_id AND v.keep
            {gate_join}
        )""")
    return ",".join(ctes)


def dedup_store_screen_sql(threshold: float = 0.7, n: int = 3,
                           n_batches: int = 3) -> str:
    """DuckDB mirror of :func:`screen_batches` — the sequential
    stateful screen unrolled into per-batch CTEs (kept_{b} = kept_{b-1}
    plus batch b's keeps).  Near-dup replays the store's estimator
    exactly: a band collision (any of the 16 sig-triples equal) AND
    >= ceil(threshold * 48) matching signature positions."""
    union = " UNION ALL ".join(
        f"SELECT * FROM v{b}" for b in range(n_batches))
    return f"WITH {_screen_ctes(threshold, n, n_batches)} {union}"

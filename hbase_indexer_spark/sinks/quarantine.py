"""K1 per-document error isolation (reference parity, round 9).

The reference's direct Solr sink distinguishes two failure classes
(DirectSolrInputDocumentWriter.java:82-131):

* **server-level** errors (Solr down, I/O): the exception is thrown up
  the stack so the whole batch retries indefinitely until the service
  recovers (:114-120, :155-161);
* **document-level** errors (BAD_REQUEST — the doc itself is bad): the
  batch is retried document-by-document, bad docs are logged + counted
  (``documentAddErrorMeter``) and DROPPED so one bad doc never blocks
  the rest (:82-84 ``isDocumentIssue``, :122-134
  ``retryAddsIndividually``, :163-175 ``retryDeletesIndividually``).

Spark-first re-expression — no per-doc retry loop exists because there
is no opaque remote validator: document validity is a **predicate the
engine can evaluate**, so the split is ONE map-side classification
(``classify_docs``: a when-chain, no shuffle, no second pass) instead
of a 2N-write retry storm.  Bad docs are not merely logged: they are
upserted into a **quarantine store** (SURVEY §2.2 K1: "bad-record
quarantine table instead of drop") keyed like the index, so redelivered
batches stay idempotent (T1) and the quarantine is itself a queryable
view.  Server-level failures are anything the publish raises — the
merge is idempotent, so the caller's retry loop has the reference's
retry-until-healthy semantics.

Counter parity (the reference's six meters,
DirectSolrInputDocumentWriter.java:68-80): ``index_adds``,
``document_add_errors``, ``index_deletes``, ``document_delete_errors``
are maintained per writer; add counts ride the merge's existing
root-level ``Observation`` (zero extra jobs), delete counts come from
one aggregate over the batch-sized id frame.

Scale: classification is embedded in the merge's write job (map-side
expressions); the quarantine merge is bounded by (quarantine view +
bad-batch).  Nothing here reads history or collects rows to the
driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from hbase_indexer_spark.sinks.index_store import IndexStore

ERROR_COL = "_error"


def classify_docs(docs: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Tag each document with ``_error``: NULL when every check passes,
    else the comma-joined names of the failed checks in declaration
    order (``dict`` preserves insertion order).

    ``checks`` maps a reason name to a predicate that must hold for a
    GOOD document; a NULL predicate value counts as a failure (a check
    that cannot evaluate on a doc is a doc problem — the BAD_REQUEST
    analog).  Pure map-side projection: no shuffle, no extra pass."""
    if not checks:
        return docs.withColumn(ERROR_COL, F.lit(None).cast("string"))
    parts = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        for name, pred in checks.items()
    ]
    err = F.nullif(F.concat_ws(",", *parts), F.lit(""))
    return docs.withColumn(ERROR_COL, err)


class QuarantiningIndexWriter:
    """The K1 sink with the reference's error-isolation matrix.

    Wraps an index :class:`IndexStore` plus a quarantine store at
    ``<path>/quarantine`` (same key; rows carry the payload columns +
    ``_error``).  ``counters`` mirrors the reference's meters.
    """

    def __init__(self, path: str, key: str = "id",
                 checks: dict[str, Column] | None = None,
                 evolve_schema: bool = False):
        import os

        self.store = IndexStore(os.path.join(path, "index"), key=key,
                                evolve_schema=evolve_schema)
        self.quarantine = IndexStore(os.path.join(path, "quarantine"),
                                     key=key, evolve_schema=True)
        self.key = key
        self.checks = dict(checks or {})
        self.counters = {
            "index_adds": 0,
            "document_add_errors": 0,
            "index_deletes": 0,
            "document_delete_errors": 0,
        }

    # -- adds ---------------------------------------------------------------

    def add(self, spark: SparkSession, docs: DataFrame) -> None:
        """Index the good documents, quarantine the bad ones.

        Server-level failures (anything either publish raises) propagate
        with NO counters advanced for the failed leg — the merge is
        idempotent, so the caller retries the whole batch, exactly the
        reference's rethrow-and-retry contract
        (DirectSolrInputDocumentWriter.java:114-120).  Document-level
        failures never abort the batch: good docs land even when every
        other doc is bad (:122-134)."""
        tagged = classify_docs(docs, self.checks)
        good = tagged.filter(F.col(ERROR_COL).isNull()).drop(ERROR_COL)
        bad = tagged.filter(F.col(ERROR_COL).isNotNull())

        good_obs = Observation()
        self.store.merge(spark, adds=good, adds_observation=good_obs)
        self.counters["index_adds"] += int(good_obs.get["adds"])

        bad_obs = Observation()
        self.quarantine.merge(spark, adds=bad, adds_observation=bad_obs)
        self.counters["document_add_errors"] += int(bad_obs.get["adds"])

    # -- deletes ------------------------------------------------------------

    def delete_by_id(self, spark: SparkSession, ids: DataFrame,
                     id_check: Column | None = None) -> None:
        """Delete by id with per-id isolation: ids that are NULL or fail
        ``id_check`` are counted as document errors and skipped; the
        rest are applied (retryDeletesIndividually semantics,
        DirectSolrInputDocumentWriter.java:141-175).  A bad id also
        clears any quarantined doc under it (a delete is the
        authoritative end of a doc's life either way).

        One aggregate over the batch-sized id frame yields both counts
        (no per-id loop); the anti-join delete is the normal merge."""
        id_col = F.col(ids.columns[0])
        ok = id_col.isNotNull()
        if id_check is not None:
            ok = ok & F.coalesce(id_check, F.lit(False))
        stats = ids.agg(
            F.count(F.when(ok, F.lit(1))).alias("good"),
            F.count(F.when(~ok, F.lit(1))).alias("bad"),
        ).collect()[0]
        good_ids = ids.filter(ok)
        self.store.merge(spark, delete_ids=good_ids)
        self.quarantine.merge(spark, delete_ids=good_ids)
        self.counters["index_deletes"] += int(stats["good"])
        self.counters["document_delete_errors"] += int(stats["bad"])

    def delete_by_query(self, spark: SparkSession,
                        predicates: list[Column | str]) -> None:
        """K8 delete-by-query with the reference's deleteByQuery error
        split (DirectSolrInputDocumentWriter.java:176-193): a predicate
        that cannot RESOLVE against the index (the malformed-query
        BAD_REQUEST analog) is counted as a document error and
        swallowed; execution failures propagate for retry.  String
        predicates are parsed with ``F.expr``."""
        current = self.store.read(spark)
        resolved: list[Column] = []
        for p in predicates:
            col = F.expr(p) if isinstance(p, str) else p
            try:
                if current is not None:
                    current.select(col)  # resolution check only, no job
                resolved.append(col)
            except AnalysisException:
                self.counters["document_delete_errors"] += 1
        if resolved:
            self.store.merge(spark, delete_predicates=resolved)

    # -- reads --------------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read(spark)

    def read_quarantine(self, spark: SparkSession) -> DataFrame | None:
        return self.quarantine.read(spark)

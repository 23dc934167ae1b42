"""Incremental view maintenance: grouped aggregates updated from a
change feed, never from a re-scan.

The 100 TB shape this exists for: a grouped sum/count materialized view
over a fact store.  Recomputing it per cycle costs a full scan; applying
the store's :func:`~hbase_indexer_spark.sinks.index_store.change_feed`
costs O(changes) — each feed row contributes a retraction of its OLD
values (delete/update, against the OLD group: group-moving updates
retract from where the row USED to count) and an addition of its NEW
values (insert/update).  Deltas are a combinable aggregation over the
feed; the merge onto the prior aggregate is a key join between two
aggregate-sized tables.

This is the classic incremental-view-maintenance (IVM) delta algebra for
the SUM/COUNT ring — the same contract Materialize/Flink retractions and
Delta Live incremental aggregates implement.  AVG derives as sum/count;
MIN/MAX are NOT maintainable from deltas alone (a retracted max needs
the runner-up) and are intentionally out of scope here — recompute those
or keep a sketch.

Requires the feed built with ``include_old=True`` (retractions need the
FROM-side row).

Replay discipline: the delta algebra itself is exactly-once — applying
the same feed twice double-retracts.  :class:`MaintainedAggregate` is
the guarded driver: it persists the aggregate next to a change-feed
version cursor and refuses to re-apply an already-consumed version
range (the same replay-guard recipe the sketch stores use).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["maintain_grouped_sums", "maintain_value_counts",
           "minmax_from_counts", "MaintainedAggregate"]


def _nn(col: str) -> str:
    return f"_nn_{col}"


def maintain_grouped_sums(agg: DataFrame, feed: DataFrame,
                          group_cols: list[str], sum_cols: dict[str, str],
                          count_col: str = "n_rows",
                          null_counts: bool = False) -> DataFrame:
    """Apply a ``change_feed(include_old=True)`` to a grouped aggregate
    ``agg`` with schema ``(*group_cols, *sum_cols.keys(), count_col)``
    and return the maintained aggregate (same schema, groups whose count
    reaches 0 dropped).

    ``sum_cols`` maps each AGGREGATE column to the FEED (base-row)
    column it sums, e.g. ``{"sum_cents": "cents"}``.

    NULL semantics: with ``null_counts=False`` (default) NULL measure
    values count as 0, so a surviving group whose values are ALL NULL
    reads sum=0 where a direct re-aggregation reads sum=NULL — the one
    deviation from re-aggregation.  With ``null_counts=True`` the
    aggregate additionally carries one ``_nn_<col>`` non-NULL counter
    per sum column (callers must persist them between cycles) and the
    maintained sums go NULL exactly when that counter reaches 0 —
    bit-equal to re-aggregating, including all-NULL groups.

    The feed must be applied exactly once — see :class:`MaintainedAggregate`
    for the version-cursor guard.

    Scale: two map-side projections of the change-sized feed, ONE
    combinable delta aggregation, one full-outer key join of two
    aggregate-sized tables.  The base view is never read."""
    ct = F.col("_change_type")
    nn_cols = {_nn(dst): src for dst, src in sum_cols.items()} \
        if null_counts else {}
    minus = (feed.filter(ct.isin("delete", "update"))
             .select(*[F.col(f"_old_{g}").alias(g) for g in group_cols],
                     *[(-F.coalesce(F.col(f"_old_{src}"), F.lit(0)))
                       .alias(dst) for dst, src in sum_cols.items()],
                     *[(-F.when(F.col(f"_old_{src}").isNotNull(), 1)
                        .otherwise(0)).cast("long").alias(dst)
                       for dst, src in nn_cols.items()],
                     F.lit(-1).cast("long").alias(count_col)))
    plus = (feed.filter(ct.isin("insert", "update"))
            .select(*group_cols,
                    *[F.coalesce(F.col(src), F.lit(0)).alias(dst)
                      for dst, src in sum_cols.items()],
                    *[F.when(F.col(src).isNotNull(), 1).otherwise(0)
                      .cast("long").alias(dst)
                      for dst, src in nn_cols.items()],
                    F.lit(1).cast("long").alias(count_col)))
    val_cols = [*sum_cols, *nn_cols]
    delta = (minus.unionByName(plus)
             .groupBy(*group_cols)
             .agg(*[F.sum(c).alias(c) for c in val_cols],
                  F.sum(count_col).alias(count_col)))
    d = delta.select(*[F.col(g).alias(f"_d_{g}") for g in group_cols],
                     *[F.col(c).alias(f"_d_{c}") for c in val_cols],
                     F.col(count_col).alias(f"_d_{count_col}"))
    cond = None
    for g in group_cols:
        eq = F.col(g).eqNullSafe(F.col(f"_d_{g}"))
        cond = eq if cond is None else cond & eq
    joined = agg.join(d, cond, "full")
    out_groups = [F.coalesce(F.col(g), F.col(f"_d_{g}")).alias(g)
                  for g in group_cols]

    def _maintained(c: str):
        return (F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0)))

    if null_counts:
        # sum goes NULL exactly when no non-NULL value survives in the
        # group (matching SQL SUM over an all-NULL group)
        out_vals = [
            F.when(_maintained(_nn(c)) > 0, _maintained(c)).alias(c)
            for c in sum_cols
        ]
        out_vals += [_maintained(c).alias(c) for c in nn_cols]
    else:
        out_vals = [_maintained(c).alias(c) for c in sum_cols]
    new_count = _maintained(count_col)
    return (joined.select(*out_groups, *out_vals,
                          new_count.alias(count_col))
            .filter(F.col(count_col) > 0))


def maintain_value_counts(counts: DataFrame, feed: DataFrame,
                          group_cols: list[str], val_col: str,
                          count_col: str = "n") -> DataFrame:
    """Maintain a per-(group, value) multiplicity table from a change
    feed — the classic reduction that makes MIN/MAX incrementally
    maintainable after all: a retracted extreme cannot be repaired from
    a scalar min/max (the runner-up is gone), but the VALUE-COUNT
    multiset is pure SUM-ring state, so it maintains exactly like any
    grouped count, and min/max re-derive from it without ever touching
    the base table (:func:`minmax_from_counts`).  This is the sorted-
    index/arrangement strategy Materialize and Flink use for retractable
    extremes, re-expressed as two DataFrame ops.

    ``counts`` has schema ``(*group_cols, val_col, count_col)`` (seed it
    with ``base.groupBy(*group_cols, val_col).count()``).  NULL values
    are tracked like any other value (they never win min/max).

    Scale: the auxiliary table is DISTINCT-VALUES-sized per group (worst
    case the group's row count, typical far less); each maintenance
    cycle is O(changes) map-side + one join of aggregate-sized tables —
    the base is never read."""
    return maintain_grouped_sums(
        counts, feed, [*group_cols, val_col], {}, count_col=count_col)


def minmax_from_counts(counts: DataFrame, group_cols: list[str],
                       val_col: str,
                       count_col: str = "n") -> DataFrame:
    """Derive ``(group, min_v, max_v, n_rows)`` from a maintained
    value-count table — one combinable aggregation over the auxiliary
    (aggregate-sized) table, never the base."""
    return (counts.groupBy(*group_cols)
            .agg(F.min(val_col).alias(f"min_{val_col}"),
                 F.max(val_col).alias(f"max_{val_col}"),
                 F.sum(count_col).alias("n_rows")))


class MaintainedAggregate:
    """A PERSISTED grouped-sum view over an
    :class:`~hbase_indexer_spark.sinks.index_store.IndexStore`, advanced
    by change feeds with an at-most-once version cursor.

    The guard closes the delta algebra's replay hole: the cursor file
    (``_ivm_cursor.json`` next to the aggregate versions) records the
    last source version whose feed was applied; :meth:`advance` consumes
    exactly the range (cursor, to_version] and a repeated call is a
    no-op, so crash/retry loops converge instead of double-retracting.

    Crash atomicity (r7 ADVICE): the aggregate publish and the cursor
    commit are two files, so the cursor additionally records the agg
    store version it corresponds to, and every advance() is preceded by
    a write-ahead intent (``_ivm_intent.json``: the target source
    version + the agg version the publish WILL create).  A crash between
    publish and cursor commit leaves agg_version ahead of the cursor's
    recorded one; recovery reads the intent and rolls the cursor forward
    instead of re-applying the feed — the retry becomes the no-op it
    should be.

    Scale: the aggregate is aggregate-sized (groups, not facts); init
    is the one full scan, every advance is O(changes)."""

    def __init__(self, path: str, group_cols: list[str],
                 sum_cols: dict[str, str], count_col: str = "n_rows",
                 null_counts: bool = False):
        # local import: sinks.index_store imports nothing from plans,
        # so this stays cycle-free either way, but keeps module import
        # light for callers that only want maintain_grouped_sums
        from hbase_indexer_spark.sinks.index_store import IndexStore

        self.store = IndexStore(os.path.join(path, "agg"),
                                key=group_cols[0])
        self.group_cols = list(group_cols)
        self.sum_cols = dict(sum_cols)
        self.count_col = count_col
        self.null_counts = bool(null_counts)
        self._cursor_file = os.path.join(path, "_ivm_cursor.json")
        self._intent_file = os.path.join(path, "_ivm_intent.json")

    # -- cursor ------------------------------------------------------------

    def _read_cursor(self) -> dict | None:
        try:
            with open(self._cursor_file) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def applied_version(self) -> int:
        self._recover()
        cur = self._read_cursor()
        return -1 if cur is None else int(cur["applied_to"])

    def _set_cursor(self, v: int) -> None:
        tmp = self._cursor_file + ".tmp"
        os.makedirs(os.path.dirname(self._cursor_file), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"applied_to": int(v),
                       "agg_version": self.store.current_version()}, f)
        os.replace(tmp, self._cursor_file)
        try:
            os.remove(self._intent_file)
        except FileNotFoundError:
            pass

    def _write_intent(self, to_v: int, agg_v: int) -> None:
        tmp = self._intent_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"applying_to": int(to_v),
                       "agg_version": int(agg_v)}, f)
        os.replace(tmp, self._intent_file)

    def _recover(self) -> None:
        """Reconcile cursor vs agg store after a crash between the
        aggregate publish and the cursor commit (r7 ADVICE: the two
        writes are not atomic).  Roll the cursor forward when the intent
        proves the publish landed; discard the intent when it did not."""
        cur = self._read_cursor()
        if cur is None:
            return
        agg_now = self.store.current_version()
        try:
            with open(self._intent_file) as f:
                intent = json.load(f)
        except FileNotFoundError:
            intent = None
        if "agg_version" not in cur:
            # Legacy (pre-r8) cursor with no recorded agg version.  The
            # intent is the only witness: if it says the publish that is
            # in flight produced exactly agg_now, the crash happened
            # between publish and cursor commit — roll forward (r8
            # ADVICE: adopting agg_now before this check re-applied the
            # feed onto an aggregate that already contained it).
            if (intent is not None
                    and int(intent["agg_version"]) == agg_now
                    and int(intent["applying_to"]) > int(cur["applied_to"])):
                self._set_cursor(int(intent["applying_to"]))
                return
            # no (matching) intent: adopt current as the recorded version
            try:
                os.remove(self._intent_file)
            except FileNotFoundError:
                pass
            self._set_cursor(int(cur["applied_to"]))
            return
        rec = int(cur["agg_version"])
        if agg_now == rec:
            # clean state; a leftover intent means the publish never ran
            try:
                os.remove(self._intent_file)
            except FileNotFoundError:
                pass
            return
        if (agg_now > rec and intent is not None
                and int(intent["agg_version"]) == agg_now):
            # publish landed, cursor commit was lost: roll forward
            self._set_cursor(int(intent["applying_to"]))
            return
        raise ValueError(
            f"aggregate store version {agg_now} does not match the "
            f"cursor's recorded version {rec} and no intent explains "
            "the gap; re-init required")

    # -- lifecycle -----------------------------------------------------------

    def _aggregate(self, base: DataFrame) -> DataFrame:
        aggs = [F.coalesce(F.sum(src), F.lit(0)).alias(dst)
                for dst, src in self.sum_cols.items()]
        if self.null_counts:
            aggs = [F.sum(src).alias(dst)
                    for dst, src in self.sum_cols.items()]
            aggs += [F.count(src).alias(_nn(dst))
                     for dst, src in self.sum_cols.items()]
        return (base.groupBy(*self.group_cols)
                .agg(*aggs, F.count(F.lit(1)).alias(self.count_col)))

    def init(self, spark: SparkSession, source) -> None:
        """Recompute from the source store's CURRENT version (the one
        full scan) and set the cursor to it."""
        base = source.read(spark)
        if base is None:
            raise ValueError("source store is empty; nothing to aggregate")
        self.store.overwrite(self._aggregate(base), spark)
        self._set_cursor(source.current_version())

    def read(self, spark: SparkSession) -> DataFrame | None:
        """The maintained aggregate (carries ``_nn_*`` counters when
        ``null_counts=True`` — they are state, not payload)."""
        return self.store.read(spark)

    def advance(self, spark: SparkSession, source,
                to_version: int | None = None) -> bool:
        """Consume the source's change feed from the cursor to
        ``to_version`` (default: source current).  Returns True when a
        feed was applied, False when the range was already consumed —
        the replay guard.  Raises when the cursor version is no longer
        retained on the source (the feed cannot be rebuilt; re-init)."""
        from hbase_indexer_spark.sinks.index_store import change_feed

        cur = self.applied_version()
        if cur < 0:
            raise ValueError("not initialized; call init() first")
        to_v = source.current_version() if to_version is None else to_version
        if to_v <= cur:
            return False  # already applied: skip, never double-retract
        if cur not in source.versions():
            raise ValueError(
                f"cursor version {cur} no longer retained on source "
                f"(have {source.versions()}); re-init required")
        feed = change_feed(source, spark, from_version=cur,
                           to_version=to_v, include_old=True)
        agg = self.store.read(spark)
        assert feed is not None and agg is not None
        maintained = maintain_grouped_sums(
            agg, feed, self.group_cols, self.sum_cols,
            count_col=self.count_col, null_counts=self.null_counts)
        # write-ahead intent so a crash between the publish and the
        # cursor commit recovers by rolling forward, never re-applying
        self._write_intent(to_v, self.store.current_version() + 1)
        self.store.overwrite(maintained, spark)
        self._set_cursor(to_v)
        return True

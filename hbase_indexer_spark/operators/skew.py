"""Skew mitigation primitives (the 100 TB discipline, SURVEY §7.1).

Hash-partitioned joins and aggregations die on hot keys: one reducer gets
the whale while 999 executors idle.  AQE's skew-join handling
(``spark.sql.adaptive.skewJoin.enabled``, on by default in our session)
covers sort-merge joins at runtime; these helpers cover the cases AQE
cannot re-plan:

- ``salted_join``: explicit salting for a skewed equi-join against a
  non-broadcastable right side — the left (skewed) side gets a
  deterministic per-row salt, the right side is replicated ``n_salt``
  ways, and the join key becomes (key, salt), spreading each hot key over
  ``n_salt`` reducers.
- ``salted_two_phase_agg``: aggregation whose single hot group floods one
  reducer even with map-side partial aggregation (e.g. after an explode
  the map-side hash table keeps flushing).  Phase 1 aggregates
  (keys, salt), phase 2 re-aggregates the n_salt partials per key.

Both are algebraically exact (results equal the unsalted plan; pinned by
tests/test_skew.py) and deterministic — the salt is a hash of row
content, never a random number, so retried tasks re-derive identical
salts (a Spark-retry correctness requirement ``rand()``-salting violates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGG_FNS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),   # counts combine by summing
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def row_salt(df: DataFrame, n_salt: int) -> Column:
    """Deterministic per-row salt in [0, n_salt): hash of the full row
    content.  Content-derived (not rand/monotonic id), so speculative or
    retried tasks produce the same salt for the same row."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))


def salted_join(left: DataFrame, right: DataFrame, on: list[str],
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: spread each hot left key over ``n_salt``
    reducers by joining on (key, salt) against an n_salt-replicated right.

    Cost model: right side is shuffled n_salt times its size — use when
    the right is far smaller than the left's hot keys but too big to
    broadcast.  Supported joins: inner / left (semantics preserved because
    replication is on the right and the join key includes the salt exactly
    once per replica).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_left = left.withColumn("_salt", row_salt(left, n_salt))
    replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = salted_left.join(replicated, on + ["_salt"], how)
    return out.drop("_salt")


def salted_two_phase_agg(df: DataFrame, keys: list[str],
                         aggs: list[tuple[str, str, str]],
                         n_salt: int = 32) -> DataFrame:
    """Two-phase skew-spread aggregation.

    ``aggs``: list of (column, fn, alias) with fn in sum/count/min/max —
    the decomposable aggregates (phase-2 combiner is fn itself, except
    count which combines by sum).  count with column '*' counts rows.
    """
    partials, finals = [], []
    for col, fn, alias in aggs:
        try:
            part_fn, comb_fn = _AGG_FNS[fn]
        except KeyError:
            raise ValueError(f"non-decomposable aggregate {fn!r}") from None
        c = F.lit(1) if (fn == "count" and col == "*") else F.col(col)
        partials.append(part_fn(c).alias(f"_p_{alias}"))
        finals.append(comb_fn(F.col(f"_p_{alias}")).alias(alias))
    salted = df.withColumn("_salt", row_salt(df, n_salt))
    return (
        salted.groupBy(*keys, "_salt").agg(*partials)
        .groupBy(*keys).agg(*finals)
    )

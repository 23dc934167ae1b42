"""Property-based invariants over random mutation logs (hypothesis).

The incremental engine's correctness rests on two properties the unit
matrices can only sample:

1. micro-batch-boundary invariance: replaying any log in k chunks yields
   the same index as one chunk (tombstone ts-masking is order-independent);
2. store equivalence: the bucketed copy-on-write store and the plain
   store produce identical indexes.
"""

import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hbase_indexer_spark.config.indexer_conf import IndexerConf
from hbase_indexer_spark.plans.incremental import IncrementalIndexer

EVENT_DDL = (
    "seq long, event_ts long, table string, row string, family string, "
    "qualifier string, ts long, op string, value binary"
)

CONF = IndexerConf.from_dict({
    "table": "t",
    "fields": [
        {"name": "a_s", "value": "f:a"},
        {"name": "b_s", "value": "f:b"},
    ],
})

event_st = st.tuples(
    st.integers(0, 4),                              # row
    st.sampled_from(["a", "b"]),                    # qualifier
    st.sampled_from(["put", "put", "put",           # puts dominate
                     "delete_row", "delete_column", "delete_family"]),
    st.integers(0, 99),                             # value seed
)

log_st = st.lists(event_st, min_size=1, max_size=24)


def to_rows(log):
    rows = []
    for i, (row, qual, op, vseed) in enumerate(log):
        val = f"v{vseed}".encode() if op == "put" else None
        rows.append((i, i, "t", f"r{row}", "f", qual, i, op, val))
    return rows


def replay(spark, rows, n_chunks, n_buckets=None):
    tmp = tempfile.mkdtemp(prefix="hbis_prop_")
    ix = IncrementalIndexer(
        spark, CONF,
        state_path=os.path.join(tmp, "s"), index_path=os.path.join(tmp, "i"),
        n_buckets=n_buckets,
    )
    df = spark.createDataFrame(rows, EVENT_DDL)
    out = ix.replay(df, n_chunks=n_chunks)
    return sorted(tuple(r) for r in out.select("id", "a_s", "b_s").collect())


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(log=log_st)
def test_chunking_invariance(spark, log):
    rows = to_rows(log)
    assert replay(spark, rows, 1) == replay(spark, rows, 3)


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(log=log_st)
def test_bucketed_equals_plain(spark, log):
    rows = to_rows(log)
    assert replay(spark, rows, 2) == replay(spark, rows, 2, n_buckets=3)

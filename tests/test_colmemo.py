"""The per-SparkContext unresolved-Column memo (functions/colmemo.py):
compiled expression sets are reused across calls of the same conf, results
stay byte-identical, and the U1 resolution key invalidates the cache when a
custom value mapper is re-registered under the same name."""

from pyspark.sql import functions as F

from hbase_indexer_spark.config.indexer_conf import IndexerConf
from hbase_indexer_spark.functions import bytes_codec as bc
from hbase_indexer_spark.functions.colmemo import memo, _store
from hbase_indexer_spark.operators.extraction import (
    _resolution_key,
    column_documents,
    row_documents,
)

CELL_SCHEMA = (
    "table string, row string, family string, qualifier string, "
    "ts long, op string, value binary"
)


def _cells(spark):
    return spark.createDataFrame(
        [("t", "r1", "info", "name", 1, "put", b"alice"),
         ("t", "r1", "info", "age", 1, "put", (30).to_bytes(4, "big"))],
        CELL_SCHEMA,
    )


def test_memo_builds_once_per_key(spark):
    calls = []
    a = memo(("colmemo_test", 1), lambda: calls.append(1) or ["x"])
    b = memo(("colmemo_test", 1), lambda: calls.append(1) or ["y"])
    assert a is b and calls == [1]
    c = memo(("colmemo_test", 2), lambda: ["z"])
    assert c == ["z"]


def test_memo_unhashable_key_falls_back(spark):
    # defensive path: unhashable key -> fresh build every call, no raise
    out = memo(("colmemo_test", ["unhashable"]), lambda: 7)
    assert out == 7


def test_repeat_compile_same_results(spark):
    conf = IndexerConf.from_dict({
        "table": "t",
        "fields": [{"name": "name_s", "value": "info:name"},
                   {"name": "age_i", "value": "info:age", "type": "int"}],
    })
    df = _cells(spark)
    first = row_documents(df, conf).collect()
    second = row_documents(df, conf).collect()  # memo hit
    assert first == second
    assert row_documents(df.limit(1), conf).count() == 1  # other plan, same memo
    c1 = column_documents(df, conf).collect()
    c2 = column_documents(df, conf).collect()
    assert sorted(map(tuple, c1)) == sorted(map(tuple, c2))


def test_custom_mapper_reregistration_invalidates(spark):
    bc.register_value_mapper("colmemo_upper", lambda c: F.upper(c.cast("string")))
    conf = IndexerConf.from_dict({
        "table": "t",
        "fields": [{"name": "n", "value": "info:name", "type": "colmemo_upper"}],
    })
    df = _cells(spark)
    key_before = _resolution_key(conf)
    assert row_documents(df, conf).collect()[0]["n"] == "ALICE"
    # re-register under the same name: the resolution key must change so the
    # next compile resolves the NEW callable instead of the cached Columns
    bc.register_value_mapper("colmemo_upper", lambda c: F.lower(c.cast("string")))
    assert _resolution_key(conf) != key_before
    assert row_documents(df, conf).collect()[0]["n"] == "alice"


def test_memo_scoped_to_context(spark):
    memo(("colmemo_scope",), lambda: 1)
    store = _store()
    assert ("colmemo_scope",) in store
    # entries live on the SparkContext instance, so stopping the context
    # (not done here - shared fixture) drops them with the JVM expressions
    assert store is _store()


def test_resolution_key_pins_callable_not_id(spark):
    """A de-registered mapper must stay alive via the cached key so a later
    re-registration can never collide with its recycled id() (ADVICE r9):
    the key tuple holds the callable object itself."""
    import gc
    import weakref

    fn = lambda c: F.upper(c.cast("string"))  # noqa: E731
    bc.register_value_mapper("colmemo_pin", fn)
    conf = IndexerConf.from_dict({
        "table": "t",
        "fields": [{"name": "n", "value": "info:name", "type": "colmemo_pin"}],
    })
    key = _resolution_key(conf)
    assert key[0] is fn  # the callable itself, not an int id
    ref = weakref.ref(fn)
    # drop every reference except the registry, then replace the registry
    # entry: the KEY reference must keep the old callable alive
    del fn
    bc.register_value_mapper("colmemo_pin", lambda c: c.cast("string"))
    gc.collect()
    assert ref() is not None and key[0] is ref()
    new_key = _resolution_key(conf)
    assert new_key != key  # re-registration still invalidates


def test_memo_eviction_bound(spark):
    from hbase_indexer_spark.functions.colmemo import _MAX_ENTRIES

    store = _store()
    baseline = dict(store)
    try:
        for i in range(_MAX_ENTRIES + 10):
            memo(("colmemo_evict", i), lambda i=i: i)
        assert len(store) <= _MAX_ENTRIES
        # newest entries survive, oldest were evicted FIFO
        assert ("colmemo_evict", _MAX_ENTRIES + 9) in store
    finally:
        store.clear()
        store.update(baseline)

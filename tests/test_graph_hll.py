"""The r5 continuation operators vs pure-Python reference models:

- pagerank: exact fixed-point replay on random graphs, partition
  invariance (BSP rounds must not depend on row placement), and the
  teleport floor (every node holds >= the base rank).
- hll_distinct: registers match a pure-Python HLL built from the same
  md5 hash; the sketch is max-mergeable (estimate over a union equals
  the estimate from register-wise max of the parts); estimates are
  invariant to duplication of keys (distinct-count semantics).
"""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

ONE = 1_000_000


def _py_pagerank(edges, iters=5):
    """Pure-Python replay of the integer fixed-point iteration —
    node set is src UNION dst (dangling nodes keep their base)."""
    out = {}
    nodes = set()
    for s, d in edges:
        out.setdefault(s, []).append(d)
        nodes.update((s, d))
    rank = {n: ONE for n in nodes}
    for _ in range(iters):
        acc = {n: 0 for n in nodes}
        for u, dsts in out.items():
            c = rank[u] // len(dsts)
            for v in dsts:
                acc[v] += c
        rank = {n: 150000 + (85 * acc[n]) // 100 for n in nodes}
    return rank


edge_st = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(
        lambda e: e[0] != e[1]),
    min_size=1, max_size=20, unique=True)


@settings(**_SETTINGS)
@given(raw=edge_st)
def test_pagerank_matches_python_model(spark, raw):
    from hbase_indexer_spark.pipeline.graph import pagerank

    # symmetrize like trade_edges so every node has out-edges
    sym = sorted({(f"n{a}", f"n{b}") for a, b in raw}
                 | {(f"n{b}", f"n{a}") for a, b in raw})
    expect = _py_pagerank(sym)
    for parts in (None, 7):
        df = spark.createDataFrame(sym, "src string, dst string")
        if parts:
            df = df.repartition(parts)
        got = {r["node"]: r["rank_micro"]
               for r in pagerank(df, iters=5).collect()}
        assert got == expect


def test_pagerank_teleport_floor_and_node_set(spark):
    from hbase_indexer_spark.pipeline.graph import pagerank

    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    out = pagerank(spark.createDataFrame(
        edges, "src string, dst string"), iters=3).collect()
    assert {r["node"] for r in out} == {"a", "b", "c"}
    # teleport term: every node keeps at least the base mass
    assert all(r["rank_micro"] >= 150000 for r in out)
    # hub 'b' (in-degree 2) outranks the spokes
    ranks = {r["node"]: r["rank_micro"] for r in out}
    assert ranks["b"] > ranks["a"] == ranks["c"]


def _py_hll(keys):
    """Pure-Python replay of hll_registers + the fixed-point estimate."""
    regs = {}
    for k in keys:
        h = int(hashlib.md5(f"hll:{k}".encode()).hexdigest()[:15], 16)
        reg, w = h % 64, (h // 64) % (1 << 32)
        rho = 33 if w == 0 else 33 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    s = sum(1 << (33 - r) for r in regs.values()) \
        + (64 - len(regs)) * (1 << 33)
    return regs, (709341 * ((64 * 64 * (1 << 33)) // s)) // 1000000


key_st = st.lists(st.integers(0, 500), min_size=1, max_size=60)


@settings(**_SETTINGS)
@given(keys=key_st)
def test_hll_matches_python_model(spark, keys):
    from hbase_indexer_spark.pipeline.corpus_stats import hll_distinct

    _, est = _py_hll(set(keys))  # multiset and set hash identically
    df = spark.createDataFrame([(k, "g") for k in keys],
                               "k long, grp string")
    row = hll_distinct(df, F.col("k"), "grp").collect()[0]
    assert row["true_distinct"] == len(set(keys))
    assert row["est_distinct"] == est


@settings(**_SETTINGS)
@given(a=key_st, b=key_st)
def test_hll_registers_merge_by_max(spark, a, b):
    """Union sketch == register-wise max of part sketches — the property
    that makes HLL shardable (build per partition, merge at the end)."""
    from hbase_indexer_spark.pipeline.corpus_stats import hll_registers

    df = spark.createDataFrame(
        [(k, "a") for k in a] + [(k, "b") for k in b]
        + [(k, "u") for k in a + b], "k long, grp string")
    regs = {(r["grp"], r["reg"]): r["mr"]
            for r in hll_registers(df, F.col("k"), "grp").collect()}
    merged = {}
    for (g, reg), mr in regs.items():
        if g in ("a", "b"):
            merged[reg] = max(merged.get(reg, 0), mr)
    union = {reg: mr for (g, reg), mr in regs.items() if g == "u"}
    assert merged == union


def test_hll_duplicates_do_not_move_the_estimate(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import hll_distinct

    once = spark.createDataFrame([(k, "g") for k in range(40)],
                                 "k long, grp string")
    thrice = spark.createDataFrame([(k % 40, "g") for k in range(120)],
                                   "k long, grp string")
    e1 = hll_distinct(once, F.col("k"), "grp").collect()[0]
    e3 = hll_distinct(thrice, F.col("k"), "grp").collect()[0]
    assert (e1["true_distinct"], e1["est_distinct"]) == \
           (e3["true_distinct"], e3["est_distinct"])


def test_hll_null_group_reports_real_estimate(spark):
    """r5 ADVICE: a NULL group KEY is a real GROUP BY group; the
    true-vs-sketch join must be null-safe or the NULL group reports
    est_distinct 0 while true_distinct > 0."""
    from hbase_indexer_spark.pipeline.corpus_stats import hll_distinct

    df = spark.createDataFrame(
        [(k, None) for k in range(40)] + [(k, "g") for k in range(10)],
        "k long, grp string")
    rows = {r["grp"]: r for r in hll_distinct(df, F.col("k"), "grp").collect()}
    assert rows[None]["true_distinct"] == 40
    assert rows[None]["est_distinct"] > 0  # was 0 before the null-safe join
    assert rows["g"]["true_distinct"] == 10
    # all-NULL keys in a group still yields the (group, 0, 0) row
    allnull = spark.createDataFrame([(None, "h")], "k long, grp string")
    r = hll_distinct(allnull, F.col("k"), "grp").collect()[0]
    assert (r["true_distinct"], r["est_distinct"]) == (0, 0)


def test_hll_fold_replay_and_merge_equivalence(spark, tmp_path):
    """Redelivered batch is a no-op; two folded chunks equal one batch
    register build over the concatenation (max-mergeability)."""
    from hbase_indexer_spark.pipeline.corpus_stats import hll_registers
    from hbase_indexer_spark.sinks.index_store import IndexStore
    from hbase_indexer_spark.streaming.sketch_stream import fold_hll_batch

    a = spark.createDataFrame([(k, "g") for k in range(25)],
                              "k long, grp string")
    b = spark.createDataFrame([(k, "g") for k in range(15, 40)],
                              "k long, grp string")
    store = IndexStore(str(tmp_path / "hll"), key="grp")
    assert fold_hll_batch(store, a, 0, key="k", group="grp") is True
    once = {(r["grp"], r["reg"]): r["mr"]
            for r in store.read(spark).collect()}
    assert fold_hll_batch(store, a, 0, key="k", group="grp") is False
    again = {(r["grp"], r["reg"]): r["mr"]
             for r in store.read(spark).collect()}
    assert again == once
    assert fold_hll_batch(store, b, 1, key="k", group="grp") is True
    folded = {(r["grp"], r["reg"]): r["mr"]
              for r in store.read(spark).collect()}
    want = {(r["grp"], r["reg"]): r["mr"]
            for r in hll_registers(a.unionByName(b), F.col("k"),
                                   "grp").collect()}
    assert folded == want


def _py_ppr(edges, seeds, iters=5):
    """Pure-Python replay of the personalized (seeded) iteration."""
    out = {}
    nodes = set()
    for s, d in edges:
        out.setdefault(s, []).append(d)
        nodes.update((s, d))
    rank = {n: ONE * (n in seeds) for n in nodes}
    for _ in range(iters):
        acc = {n: 0 for n in nodes}
        for u, dsts in out.items():
            c = rank[u] // len(dsts)
            for v in dsts:
                acc[v] += c
        rank = {n: 150000 * (n in seeds) + (85 * acc[n]) // 100
                for n in nodes}
    return rank


@settings(**_SETTINGS)
@given(raw=edge_st, seed_ids=st.sets(st.integers(0, 5), min_size=1,
                                     max_size=3))
def test_personalized_pagerank_matches_python_model(spark, raw, seed_ids):
    from hbase_indexer_spark.pipeline.graph import personalized_pagerank

    sym = sorted({(f"n{a}", f"n{b}") for a, b in raw}
                 | {(f"n{b}", f"n{a}") for a, b in raw})
    seeds = {f"n{i}" for i in seed_ids}
    expect = _py_ppr(sym, seeds)
    df = spark.createDataFrame(sym, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in sorted(seeds)],
                                "node string")
    got = {r["node"]: r["rank_micro"]
           for r in personalized_pagerank(df, sdf, iters=5).collect()}
    assert got == expect


def test_personalized_pagerank_mass_stays_near_seeds(spark):
    """Seeded walk on a triangle a-b-c with pendant d off c: the
    triangle mixes (odd cycle — no bipartite parity oscillation) and
    the far pendant ends up strictly below every triangle node.  (A
    plain path would NOT show monotone decay at a fixed iteration:
    symmetric pair graphs without odd cycles are bipartite, and seeded
    mass alternates between the two sides each round.)"""
    from hbase_indexer_spark.pipeline.graph import personalized_pagerank

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    sym = [(x, y) for x, y in pairs] + [(y, x) for x, y in pairs]
    df = spark.createDataFrame(sym, "src string, dst string")
    sdf = spark.createDataFrame([("a",)], "node string")
    ranks = {r["node"]: r["rank_micro"]
             for r in personalized_pagerank(df, sdf, iters=6).collect()}
    assert ranks["d"] > 0                          # mass does reach d
    assert min(ranks["a"], ranks["b"], ranks["c"]) > ranks["d"]


def _py_hist_quantiles(values, qs=(50, 90, 99), bins=256):
    """Pure-Python replay of the histogram quantile sketch."""
    v = sorted(int((x * 1e6 + 0.5) // 1) for x in values)
    lo, hi, n = v[0], v[-1], len(v)
    span = hi - lo + 1
    hist = {}
    for x in v:
        b = ((x - lo) * bins) // span
        hist[b] = hist.get(b, 0) + 1
    out = {}
    for q in qs:
        r = (q * n + 99) // 100
        cum = 0
        for b in sorted(hist):
            cum += hist[b]
            if cum >= r:
                out[q] = (n, r, lo + (b * span) // bins, v[r - 1])
                break
    return out


@settings(**_SETTINGS)
@given(vals=st.lists(
    st.floats(min_value=0.01, max_value=500.0,
              allow_nan=False, allow_infinity=False),
    min_size=3, max_size=60))
def test_histogram_quantiles_matches_python_model(spark, vals):
    from hbase_indexer_spark.pipeline.corpus_stats import (
        histogram_quantiles,
    )

    # round inputs to cents so the float -> micro snap is unambiguous
    vals = [round(x, 2) for x in vals]
    expect = _py_hist_quantiles(vals)
    df = spark.createDataFrame([("g", x) for x in vals],
                               "grp string, value double")
    rows = histogram_quantiles(df, "value", "grp").collect()
    got = {r["q_pct"]: (r["n"], r["target_rank"], r["est_micro"],
                        r["true_micro"]) for r in rows}
    assert got == expect


def test_histogram_quantiles_est_brackets_true(spark):
    """The estimate is the answering bucket's lower edge: it can sit at
    most one bucket width below the exact order statistic, never
    above it."""
    from hbase_indexer_spark.pipeline.corpus_stats import (
        HQ_BINS,
        histogram_quantiles,
    )

    vals = [float(i) for i in range(1, 1001)]
    df = spark.createDataFrame([("g", x) for x in vals],
                               "grp string, value double")
    span = int(1000e6) - int(1e6) + 1
    width = span // HQ_BINS + 1
    for r in histogram_quantiles(df, "value", "grp").collect():
        assert r["est_micro"] <= r["true_micro"]
        assert r["true_micro"] - r["est_micro"] <= width


def test_pagerank_keeps_dangling_nodes(spark):
    """A dst-only node has no out-edges but must keep its rank row:
    teleport base + absorbed in-edge mass (the classic rank sink)."""
    from hbase_indexer_spark.pipeline.graph import pagerank

    edges = [("a", "b"), ("a", "c")]  # b, c never appear as src
    expect = _py_pagerank(edges, iters=3)
    got = {r["node"]: r["rank_micro"]
           for r in pagerank(spark.createDataFrame(
               edges, "src string, dst string"), iters=3).collect()}
    assert got == expect
    assert set(got) == {"a", "b", "c"}
    # the sinks absorbed a's mass and keep their teleport base
    assert got["b"] == got["c"] > 150000


def test_personalized_pagerank_duplicate_seeds_no_double_count(spark):
    from hbase_indexer_spark.pipeline.graph import personalized_pagerank

    sym = [("a", "b"), ("b", "a")]
    df = spark.createDataFrame(sym, "src string, dst string")
    once = spark.createDataFrame([("a",)], "node string")
    twice = spark.createDataFrame([("a",), ("a",)], "node string")
    r1 = sorted(map(tuple, personalized_pagerank(df, once, 4).collect()))
    r2 = sorted(map(tuple, personalized_pagerank(df, twice, 4).collect()))
    assert r1 == r2
    assert len(r1) == 2  # no fanned-out duplicate node rows


def test_hll_null_keys_dropped(spark):
    """NULL keys must not mint a register row or skew the estimate;
    a group whose keys are all NULL reports (0, 0), matching
    count-distinct NULL semantics."""
    from hbase_indexer_spark.pipeline.corpus_stats import hll_distinct

    df = spark.createDataFrame(
        [(1, "g"), (2, "g"), (None, "g"), (None, "empty")],
        "k long, grp string")
    clean = spark.createDataFrame([(1, "g"), (2, "g")],
                                  "k long, grp string")
    rows = {r["grp"]: (r["true_distinct"], r["est_distinct"])
            for r in hll_distinct(df, F.col("k"), "grp").collect()}
    want = hll_distinct(clean, F.col("k"), "grp").collect()[0]
    assert rows["g"] == (want["true_distinct"], want["est_distinct"])
    assert rows["empty"] == (0, 0)


def test_histogram_quantiles_ignores_null_values(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import (
        histogram_quantiles,
    )

    vals = [float(i) for i in range(1, 51)]
    with_nulls = spark.createDataFrame(
        [("g", x) for x in vals] + [("g", None)] * 7,
        "grp string, value double")
    clean = spark.createDataFrame([("g", x) for x in vals],
                                  "grp string, value double")
    a = sorted(map(tuple, histogram_quantiles(
        with_nulls, "value", "grp").collect()))
    b = sorted(map(tuple, histogram_quantiles(
        clean, "value", "grp").collect()))
    assert a == b


def _py_f2(keys, depth=4, width=256):
    """Pure-Python replay of the CMS second-moment estimate."""
    from collections import Counter
    sketch = [Counter() for _ in range(depth)]
    for k in keys:
        for r in range(depth):
            h = int(hashlib.md5(f"cms{r}:{k}".encode())
                    .hexdigest()[:15], 16)
            sketch[r][h % width] += 1
    est = min(sum(c * c for c in row.values()) for row in sketch)
    counts = Counter(keys)
    true = sum(n * n for n in counts.values())
    return len(keys), len(counts), true, est


@settings(**_SETTINGS)
@given(keys=st.lists(st.integers(0, 40), min_size=1, max_size=80))
def test_selfjoin_size_matches_python_model(spark, keys):
    from hbase_indexer_spark.pipeline.corpus_stats import (
        selfjoin_size_estimate,
    )

    expect = _py_f2([str(k) for k in keys])
    df = spark.createDataFrame([(str(k),) for k in keys], "k string")
    r = selfjoin_size_estimate(df, F.col("k")).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["true_f2"], r["est_f2"]) == expect
    assert r["est_f2"] >= r["true_f2"]  # CMS one-sided overcount


def test_column_profile_counts_and_nulls(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import column_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a")],
        "k long, s string")
    rows = {r["column"]: r for r in
            column_profile(df, ["k", "s"]).collect()}
    assert (rows["k"]["n_rows"], rows["k"]["n_null"],
            rows["k"]["true_distinct"]) == (4, 1, 2)
    assert (rows["s"]["n_rows"], rows["s"]["n_null"],
            rows["s"]["true_distinct"]) == (4, 1, 2)
    # estimate present and plausible at tiny cardinality
    assert rows["k"]["est_distinct"] >= 1

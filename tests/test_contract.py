"""Driver-contract drift guards: every declared query keeps its oracle and
its COVERAGE.md line, so the correctness gate can never silently narrow."""

import __spark_entry__ as entry

# genuinely non-SQL-expressible ops (iterative / approximate): these live in
# bench_only(), NOT queries() — the driver gate can only record
# ``err: no_oracle`` for them (VERDICT r5 #3), while their deterministic
# siblings (ann_lsh_verified / ann_ivf_verified / ann_ivf_int8 /
# ann_ivf_indexed_verified) hash-check the same machinery in queries().
# ann_ivf_build (r7) times the trained-k-means store build on its own —
# approximate by construction like its ann_ivf_topk sibling.
ROWS_ONLY = {"ann_lsh_topk", "ann_ivf_topk", "ann_ivf_indexed",
             "ann_ivf_build"}


def test_every_query_has_oracle():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert not (oracles - qs), f"oracle without query: {oracles - qs}"
    missing = qs - oracles
    assert not missing, f"queries without oracle: {missing}"


def test_rows_only_queries_live_in_bench_only():
    bench = set(entry.bench_only())
    assert bench == ROWS_ONLY, f"bench_only drifted: {bench ^ ROWS_ONLY}"
    overlap = bench & set(entry.queries())
    assert not overlap, f"bench-only queries leaked into the gate: {overlap}"


def test_coverage_doc_mentions_every_gate_query():
    with open("COVERAGE.md", encoding="utf-8") as f:
        text = f.read()
    missing = [q for q in entry.queries() if q not in text]
    assert not missing, f"COVERAGE.md missing gate queries: {missing}"


def test_bench_queries_are_registered():
    import bench

    qs = set(entry.queries()) | set(entry.bench_only())
    unknown = [q for q in bench.BENCH_QUERIES if q not in qs]
    assert not unknown, f"bench names unknown queries: {unknown}"


def test_public_api_exports_resolve():
    import hbase_indexer_spark as pkg

    for name in pkg.__all__:
        assert getattr(pkg, name) is not None
    import pytest

    with pytest.raises(AttributeError):
        pkg.not_a_real_export


def test_gate_window_policy():
    """The driver's correctness gate checks only the FIRST 50 queries()
    entries, so the window composition is audit policy (round-3 ADVICE):
    no rows-only query may occupy a gated slot, and queries being
    re-verified after a failure must sit inside the window."""
    window = list(entry.queries())[:50]
    assert not (set(window) & ROWS_ONLY), (
        f"rows-only queries inside the gate window: "
        f"{sorted(set(window) & ROWS_ONLY)}")
    oracles = set(entry.oracle_sql())
    assert set(window) <= oracles, (
        f"gated queries without an oracle: {sorted(set(window) - oracles)}")
    # r8 rotation: every query never seen by the driver's type-sensitive
    # hash check (the r7-built arrivals + anything built this round)
    # must occupy a gated slot; re-checks of old greens fill the rest.
    import glob
    import json

    checked = set()
    for path in sorted(glob.glob("CORRECTNESS_r0*.json")):
        with open(path, encoding="utf-8") as f:
            checked |= set(json.load(f))
    never = {q for q in entry.queries() if q not in checked}
    missing = never - set(window)
    assert not missing, (
        f"never-driver-checked queries left OUT of the gate window: "
        f"{sorted(missing)}")
    assert len(window) == 50

"""Connected-components cluster formation (large-star/small-star).

Pins: component labels equal min-id-reachable (checked against a Python
union-find), chains/triangles/singletons, convergence on pathological
shapes (long path = worst case for label propagation), and the
dedup_clusters total-assignment contract over the documents fixture.
"""

from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.dedup import (
    connected_components,
    dedup_clusters,
    ngram_jaccard_pairs,
)


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical min-label per component
    comp = {}
    for n in parent:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    rows = connected_components(df).collect()
    return {r["id"]: r["component"] for r in rows}


def test_triangle_chain_and_pair(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21)]
    got = _cc(spark, edges)
    nodes = sorted({x for e in edges for x in e})
    assert got == _uf_components(edges, nodes)


def test_long_path_converges(spark):
    # a 64-node path is the worst case for plain hash-min propagation;
    # star alternation must still reach the fixpoint within max_iter
    edges = [(i, i + 1) for i in range(64)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_duplicate_and_reversed_edges(spark):
    edges = [(2, 1), (1, 2), (2, 1), (5, 4)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 4: 4, 5: 4}


def test_dedup_clusters_total_assignment(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup_clusters(docs, threshold=0.7)
    rows = out.collect()
    # total: every doc assigned exactly once
    assert len(rows) == docs.count()
    comp = {r["doc_id"]: r["component"] for r in rows}
    # representative is a member of its own cluster
    assert all(comp[c] == c for c in set(comp.values()))
    # agrees with union-find over the exact pair graph
    pairs = [(r["x"], r["y"])
             for r in ngram_jaccard_pairs(docs, threshold=0.7).collect()]
    expected = _uf_components(pairs, list(comp))
    assert comp == expected

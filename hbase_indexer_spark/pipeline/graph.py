"""Iterative graph analytics over relation-derived edge lists.

The reference ships no graph engine, but its batch-rebuild story
(`hbase-indexer-mr`) is the same shape: derive a keyed dataset from the
row store, iterate a bulk-synchronous computation, publish the result.
`dedup_clusters` (pipeline/dedup.py) already covers the *structural*
iterative algorithm (connected components); this module adds the
*numeric* one — PageRank and its seeded (TrustRank) variant — because
training-data curation uses link centrality as a quality prior
(harvesting seed URLs by rank, growing a trusted set by link
proximity).

Everything is exact-integer fixed point (micro-units, 1e6 = 1.0) so a
DuckDB oracle can replay the identical iteration with unrolled CTEs:
`rank div outdeg` and `(85 * s) div 100` are integer divisions on
non-negative values, where Spark's `div` (truncate) and DuckDB's `//`
(floor) agree.

Scale shape (the Pregel-on-DataFrames standard):
- the edge list is the big, static side — partitioned once by ``src``
  (``repartition + persist``, which keeps the partitioning visible to
  Catalyst; see the note in ``_seeded_loop``) and reused every
  iteration (one shuffle, then co-partitioned joins);
- the rank vector is one row per node and re-shuffles each iteration;
- each of the fixed ``iters`` rounds is join(ranks, edges) + one
  combinable groupBy(dst) — no driver-side state, no collect;
- ``localCheckpoint`` after every round keeps the plan depth constant
  (same recipe as the large-star/small-star CC loop,
  pipeline/dedup.py:1125).

Dangling nodes (appear only as ``dst``) are kept: they hold their
teleport base and absorb in-edge mass but pass nothing on — the
classic rank-sink behavior, identical in both engines.  ``trade_edges``
symmetrizes, so over the trade graph no node dangles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ONE_MICRO = 1_000_000
DAMP_PCT = 85  # damping factor in integer percent: 0.85
BASE_MICRO = (15 * ONE_MICRO) // 100  # (1 - d) * unit, exact: 150000


def trade_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Symmetric customer<->supplier edge list from the order flow:
    one edge per DISTINCT (customer, supplier) pair that ever traded,
    emitted in both directions so every node has outdegree >= 1.

    Node ids are prefixed strings ('C<custkey>' / 'S<suppkey>') so the
    two key spaces can't collide.

    Scale: one projection join orders⋈lineitem on orderkey (the
    fact-fact join every TPC-H plan already pays) + a distinct on the
    pair — combinable, no skew beyond the natural key distribution."""
    pairs = (
        orders.join(lineitem,
                    orders.o_orderkey == lineitem.l_orderkey)
        .select(F.concat(F.lit("C"), F.col("o_custkey").cast("string"))
                .alias("c"),
                F.concat(F.lit("S"), F.col("l_suppkey").cast("string"))
                .alias("s"))
        .distinct()
    )
    return (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(pairs.select(F.col("s").alias("src"),
                               F.col("c").alias("dst")))
    )


def _seeded_loop(edges: DataFrame, seeds: DataFrame | None,
                 iters: int) -> DataFrame:
    """The shared fixed-point iteration: ``rank0 = 1e6 * is_seed``;
    each round ``rank'(v) = 150000 * is_seed(v) + (85 * sum over
    in-edges of rank(u) div outdeg(u)) div 100``.  ``seeds=None``
    means every node is a seed — plain PageRank."""
    # materialize the raw edge list once (it may hide an expensive
    # upstream join), THEN fold outdeg into the static side from the
    # cheap materialized copy: per-round cost drops to ONE join
    # (ranks ⋈ edges on src) + one combinable agg.
    #
    # The static sides use repartition + persist, NOT localCheckpoint:
    # a localCheckpoint comes back as a LogicalRDD that DROPS the
    # Catalyst output-partitioning metadata, so every round's join
    # re-shuffled the full edge list — measured 212 MB/round at the sf1
    # probe (scripts/scale_probe.py) vs ~41 MB/round with persist, where
    # the join sees HashPartitioning(src) on the big side and shuffles
    # only the rank vector + the map-side-combined contributions.
    # (ranks below KEEPS localCheckpoint — there it is the plan-depth
    # cut for the iterative lineage, and ranks are the small, per-round
    # re-shuffled side by design.)
    # size the loop's shuffle width to the graph ONCE, up front
    # (functions/tuning.py recipe): every per-round exchange — the ranks
    # shuffle, the contribs groupBy(dst), the nodes join — must agree
    # with the static sides' partition count, so the width cannot be
    # changed per round; it derives from the measured edge count, never
    # from the local core count, and a big graph keeps session settings
    # (AQE included) untouched.  At toy scale this cuts each round's
    # 3 x 32 task launches to 3 x 4 without touching the plan shape.
    # Coverage (ADVICE r9): the tuned width applies to the static-side
    # builds and every IN-LOOP exchange (each round's ranks are
    # materialized by the eager localCheckpoint inside the block); the
    # returned frame is that final checkpoint, so the caller's own
    # downstream shuffles — correctly — run at session width.
    from hbase_indexer_spark.functions.tuning import small_batch_tuning

    spark = edges.sparkSession
    edges_pre = edges.persist()
    try:
        n_edges = edges_pre.count()
        with small_batch_tuning(spark, n_edges):
            return _seeded_rounds(edges_pre, seeds, iters)
    finally:
        edges_pre.unpersist()


def _seeded_rounds(edges: DataFrame, seeds: DataFrame | None,
                   iters: int) -> DataFrame:
    edges_raw = edges.repartition("src").persist()
    deg = edges_raw.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges = (edges_raw.join(deg, "src")
             .repartition("src").persist())
    # node set = src UNION dst: dangling (dst-only) nodes keep their
    # teleport base and absorb mass; they just have no out-edges
    all_nodes = (edges.select(F.col("src").alias("node"))
                 .unionAll(edges.select(F.col("dst").alias("node")))
                 .distinct())
    if seeds is None:
        nodes = all_nodes.select("node", F.lit(1).alias("is_seed"))
    else:
        nodes = (all_nodes
                 .join(seeds.select("node").distinct()
                       .withColumn("_s", F.lit(1)), "node", "left")
                 .select("node", F.coalesce(F.col("_s"), F.lit(0))
                         .alias("is_seed")))
    # persist partitioned by node: the per-round ranks build re-reads
    # nodes every iteration, and contribs arrive hash-partitioned by dst
    # from their groupBy — co-partitioned, the nodes⋈contribs join adds
    # no extra exchange
    nodes = nodes.repartition("node").persist()
    # try/finally: a mid-loop failure (OOM, cancelled sweep job) must
    # still release the cached static sides, or retries in a long-lived
    # session pile up storage — the exact leak the unpersists prevent
    try:
        edges.count()      # materialize the joined static side...
        nodes.count()
        edges_raw.unpersist()  # ...then drop the pre-join copy
        ranks = nodes.select(
            "node",
            (F.col("is_seed") * ONE_MICRO).cast("long")
            .alias("rank_micro"))
        for _ in range(iters):
            contribs = (
                ranks.join(edges, ranks.node == edges.src)
                .groupBy("dst")
                .agg(F.sum(F.expr("rank_micro div outdeg")).alias("s"))
            )
            ranks = (
                nodes.join(contribs, nodes.node == contribs.dst, "left")
                .select(
                    "node",
                    (F.col("is_seed") * BASE_MICRO
                     + F.expr(f"({DAMP_PCT} * coalesce(s, 0)) div 100"))
                    .cast("long").alias("rank_micro"))
            ).localCheckpoint(eager=True)
    finally:
        # the final ranks are a materialized checkpoint independent of
        # the static sides — release their cached blocks (unpersist is
        # idempotent, so re-dropping edges_raw on the happy path is fine)
        edges_raw.unpersist()
        edges.unpersist()
        nodes.unpersist()
    return ranks


def pagerank(edges: DataFrame, iters: int = 5) -> DataFrame:
    """Fixed-point integer PageRank: ``iters`` bulk-synchronous rounds
    of ``rank'(v) = 150000 + (85 * sum over in-edges of
    rank(u) div outdeg(u)) div 100`` starting from 1000000 micro per
    node (i.e. damping 0.85, teleport 0.15, rank unit 1e6).

    Returns ``(node, rank_micro)`` for every node in the edge list —
    dst-only (dangling) nodes included, see the module docstring.
    Integer division makes every intermediate exactly reproducible in
    SQL — the oracle unrolls the same ``iters`` rounds as CTEs.

    Scale: see the module docstring — edges static and re-used, ranks
    (1 row/node) re-shuffled per round, plan depth held constant by
    ``localCheckpoint``."""
    return _seeded_loop(edges, None, iters)


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          iters: int = 5) -> DataFrame:
    """TrustRank-style personalized PageRank: identical fixed-point
    iteration to :func:`pagerank`, but the teleport mass lands ONLY on
    ``seeds`` (a one-column ``node`` DataFrame; deduplicated here, so a
    seed source with repeats can't double-count) — ranks measure
    random-walk closeness to the seed set, the primitive behind
    seed-expansion curation (grow a trusted domain/document set by link
    proximity).

    ``rank0 = 1e6 * is_seed``; each round
    ``rank'(v) = 150000 * is_seed(v) + (85 * sum contribs) div 100``.
    Returns ``(node, rank_micro)`` for every node (non-seed nodes earn
    rank only through in-edges from the seed side).

    Scale: exactly :func:`pagerank` — the seed flag is one extra small
    join folded into the static node table."""
    return _seeded_loop(edges, seeds, iters)


# --- DuckDB mirrors -------------------------------------------------------

_TRADE_CTES = [
    """pairs AS (
        SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS c,
                        'S' || CAST(l_suppkey AS VARCHAR) AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    )""",
    """edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL
        SELECT s AS src, c AS dst FROM pairs
    )""",
    "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
    """all_nodes AS (
        SELECT src AS node FROM edges
        UNION
        SELECT dst AS node FROM edges
    )""",
]


def _round_ctes(iters: int) -> list[str]:
    """The unrolled per-round CTE pair shared by both mirrors; expects
    ``nodes(node, is_seed)`` and ``r0(node, rank_micro)`` upstream."""
    ctes = []
    for i in range(1, iters + 1):
        ctes.append(f"""c{i} AS (
            SELECT e.dst AS node,
                   CAST(sum(r.rank_micro // d.outdeg) AS BIGINT) AS s
            FROM r{i - 1} r
            JOIN deg d ON r.node = d.src
            JOIN edges e ON r.node = e.src
            GROUP BY e.dst
        )""")
        ctes.append(f"""r{i} AS (
            SELECT n.node,
                   CAST(n.is_seed * {BASE_MICRO}
                        + ({DAMP_PCT} * coalesce(c.s, 0)) // 100
                        AS BIGINT) AS rank_micro
            FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
        )""")
    return ctes


def _mirror(nodes_cte: str, iters: int) -> str:
    ctes = [*_TRADE_CTES, nodes_cte,
            f"""r0 AS (
                SELECT node,
                       CAST(is_seed * {ONE_MICRO} AS BIGINT)
                           AS rank_micro
                FROM nodes
            )""",
            *_round_ctes(iters)]
    return (f"WITH {', '.join(ctes)} "
            f"SELECT node, rank_micro FROM r{iters}")


def pagerank_sql(iters: int = 5) -> str:
    """DuckDB mirror of :func:`pagerank` over the trade graph."""
    return _mirror(
        "nodes AS (SELECT node, 1 AS is_seed FROM all_nodes)", iters)


def trustrank_sql(seed_nation: int = 0, iters: int = 5) -> str:
    """DuckDB mirror of :func:`personalized_pagerank` seeded with the
    suppliers of one nation over the trade graph."""
    nodes = f"""sd AS (
        SELECT DISTINCT 'S' || CAST(s_suppkey AS VARCHAR) AS node
        FROM supplier WHERE s_nationkey = {seed_nation}
    ),
    nodes AS (
        SELECT a.node,
               CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS is_seed
        FROM all_nodes a LEFT JOIN sd ON a.node = sd.node
    )"""
    return _mirror(nodes, iters)

"""Multi-dimensional storage layout: z-order (Morton-curve) clustering.

At 100 TB the dominant cost of a selective query is the bytes the scan
reads, and parquet/ORC data skipping (per-file min/max stats) is the
lever.  A single-column sort gives tight stats on ONE column and
useless full-domain stats on every other; interleaving the bits of two
(or more) columns into one **z-key** and range-partitioning on it gives
*bounded* min/max ranges on ALL interleaved columns simultaneously —
the `OPTIMIZE ZORDER BY` capability of Delta/Iceberg, re-expressed as a
plain repartitionByRange over a Catalyst-computed key.

Pipeline shape (all JVM-side, zero Python):

1. per-column bounds: ONE combinable (min, max) aggregate — a single
   1-row broadcast back onto the scan (the allowlisted scalar-join
   shape used across the repo);
2. per-column fixed-point scaling to ``bits``-bit ints:
   ``(v - lo) * (2^bits - 1) div max(hi - lo, 1)`` — exact integer
   arithmetic, identical in Spark and the DuckDB mirror;
3. bit interleave: ``z = sum_{i<bits, j<d} ((x_j >> i) & 1) << (i*d+j)``
   — a closed-form expression of ``bits*d`` shift/mask terms, folded by
   whole-stage codegen (no UDF, no loop at runtime);
4. layout: ``repartitionByRange(n_files, zkey)`` + sortWithinPartitions
   → each output file covers one z-range, i.e. a small axis-aligned-ish
   region of the d-dimensional key space.

Caveat (documented, not hidden): min-max scaling assumes a roughly
uniform key domain; heavily skewed columns waste z-resolution on empty
ranges.  The rank-based variant (range-partition each column first)
costs one extra per-column shuffle and is left to the caller via
pre-bucketed inputs.

Determinism: the z-key and the bucket stats depend only on the data
(bounds are data-derived), never on partitioning — the gated query is
bit-exact across engines.  Only ``zorder_write`` uses sampled
repartitionByRange boundaries (file *sizes* may wobble; file *contents
per z-range* are what the stats test asserts).

Reference analog: none — beyond-reference training-data/layout
operator, same registry surface as pipeline.pack / pipeline.curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "zorder_bucket_stats",
    "zorder_bucket_stats_sql",
    "zorder_write",
]


def _check_dims(n_cols: int, bits: int) -> None:
    if n_cols < 2:
        raise ValueError("z-order needs >= 2 columns (use orderBy for 1)")
    if bits < 1 or n_cols * bits > 62:
        raise ValueError(
            f"n_cols*bits = {n_cols * bits} must stay within a signed long "
            "(<= 62); lower `bits`")


def _scaled(col: str, bits: int) -> Column:
    """Fixed-point min-max scale to [0, 2^bits) using the broadcast
    `_lo_{col}` / `_hi_{col}` bound columns.  Pure integer arithmetic
    (`div`), so Spark and DuckDB agree bit-for-bit; ANSI mode makes a
    span overflow (|hi-lo| > ~2^47) loud instead of silently wrong."""
    mask = (1 << bits) - 1
    return F.expr(
        f"((CAST(`{col}` AS BIGINT) - _lo_{col}) * {mask}) "
        f"div greatest(_hi_{col} - _lo_{col}, 1)")


def _interleave(scaled: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position i*d + j."""
    d = len(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, x in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(x, i).bitwiseAND(F.lit(1)), i * d + j)
    return z


def _with_bounds(df: DataFrame, cols: list[str]) -> DataFrame:
    """Attach per-column (min, max) as broadcast scalar columns —
    one combinable aggregate, a 1-row broadcast back (the allowlisted
    scalar-join shape).

    Raises on helper-name collisions: withColumn would silently REPLACE
    a user column named ``_lo_<col>``/``_hi_<col>`` and the epilogue
    would then drop it from the output."""
    taken = ([f"_lo_{c}" for c in cols] + [f"_hi_{c}" for c in cols])
    clash = sorted(set(taken) & set(df.columns))
    if clash:
        raise ValueError(
            f"input columns collide with z-order helper names: {clash}; "
            "rename them before layout")
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"_lo_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"_hi_{c}"))
    bounds = df.agg(*aggs)
    return df.crossJoin(F.broadcast(bounds))


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Add a ``zkey`` column: the Morton interleave of `cols`, each
    min-max scaled to ``bits`` bits.  One aggregate + one map-only
    projection; at 100 TB the cost is the scan itself.  Raises when the
    input already has a ``zkey`` (or bounds-helper) column — silently
    replacing user data is worse than failing."""
    _check_dims(len(cols), bits)
    if "zkey" in df.columns:
        raise ValueError(
            "input already has a 'zkey' column; rename it before layout")
    b = _with_bounds(df, cols)
    z = _interleave([_scaled(c, bits) for c in cols], bits)
    drop = [f"_lo_{c}" for c in cols] + [f"_hi_{c}" for c in cols]
    return b.withColumn("zkey", z).drop(*drop)


def zorder_bucket_stats(df: DataFrame, col_x: str, col_y: str,
                        bits: int = 16, n_buckets: int = 64) -> DataFrame:
    """The data-skipping report that justifies the layout: split the key
    space into ``n_buckets`` equal z-ranges (what n_buckets output files
    would each cover) and, for comparison, the same count of single-column
    (``linear``) sort ranges — then report per-bucket min/max of BOTH raw
    columns.  Under ``zorder`` both ranges are bounded; under ``linear``
    `col_x` is tight and `col_y` spans its full domain, which is exactly
    why one-column sorts can't skip on a second predicate.

    Returns ``(layout, bucket, n_rows, min_x, max_x, min_y, max_y)`` —
    2*n_buckets rows (empty buckets absent).  Buckets are arithmetic
    (``zkey div width``), not sampled, so the output is deterministic.

    Scale: one bounds aggregate (1-row broadcast), one map-only key
    projection, two combinable groupBy(bucket) aggregations over the
    same scan — no sort, no window, nothing driver-side."""
    _check_dims(2, bits)
    b = _with_bounds(df, [col_x, col_y])
    sx, sy = _scaled(col_x, bits), _scaled(col_y, bits)
    zkey = _interleave([sx, sy], bits)
    z_width = max((1 << (2 * bits)) // n_buckets, 1)
    l_width = max((1 << bits) // n_buckets, 1)
    # bucket via integer `div`, not a double `/`+cast: zkey reaches
    # 2^(2*bits) and a double division would round above 2^53 (bits>26),
    # silently disagreeing with the oracle's integer `//`
    keyed = b.select(
        F.col(col_x).cast("long").alias("_x"),
        F.col(col_y).cast("long").alias("_y"),
        zkey.alias("_z"), sx.alias("_sx"),
    ).select(
        "_x", "_y",
        F.expr(f"_z div {z_width}").alias("_zb"),
        F.expr(f"_sx div {l_width}").alias("_lb"),
    )

    def stats(bucket_col: str, tag: str) -> DataFrame:
        return keyed.groupBy(F.col(bucket_col).alias("bucket")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_x").alias("min_x"), F.max("_x").alias("max_x"),
            F.min("_y").alias("min_y"), F.max("_y").alias("max_y"),
        ).select(F.lit(tag).alias("layout"), "bucket", "n_rows",
                 "min_x", "max_x", "min_y", "max_y")

    return (stats("_zb", "zorder").unionByName(stats("_lb", "linear"))
            .orderBy("layout", "bucket"))


def _interleave_sql(x: str, y: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_bucket_stats_sql(col_x: str, col_y: str, table: str,
                            bits: int = 16, n_buckets: int = 64) -> str:
    """DuckDB mirror of :func:`zorder_bucket_stats` — same fixed-point
    scaling, same interleave terms, same arithmetic buckets."""
    mask = (1 << bits) - 1
    z_width = max((1 << (2 * bits)) // n_buckets, 1)
    l_width = max((1 << bits) // n_buckets, 1)
    scale = (f"((CAST({{c}} AS BIGINT) - lo_{{c}}) * {mask}) "
             f"// greatest(hi_{{c}} - lo_{{c}}, 1)")
    return f"""
        WITH bounds AS (
            SELECT MIN(CAST({col_x} AS BIGINT)) AS lo_{col_x},
                   MAX(CAST({col_x} AS BIGINT)) AS hi_{col_x},
                   MIN(CAST({col_y} AS BIGINT)) AS lo_{col_y},
                   MAX(CAST({col_y} AS BIGINT)) AS hi_{col_y}
            FROM {table}
        ),
        scaled AS (
            SELECT CAST({col_x} AS BIGINT) AS _x,
                   CAST({col_y} AS BIGINT) AS _y,
                   {scale.format(c=col_x)} AS sx,
                   {scale.format(c=col_y)} AS sy
            FROM {table}, bounds
        ),
        keyed AS (
            SELECT _x, _y,
                   ({_interleave_sql('sx', 'sy', bits)}) // {z_width} AS zb,
                   sx // {l_width} AS lb
            FROM scaled
        )
        SELECT 'zorder' AS layout, zb AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(_x) AS min_x, MAX(_x) AS max_x,
               MIN(_y) AS min_y, MAX(_y) AS max_y
        FROM keyed GROUP BY zb
        UNION ALL
        SELECT 'linear', lb, CAST(COUNT(*) AS BIGINT),
               MIN(_x), MAX(_x), MIN(_y), MAX(_y)
        FROM keyed GROUP BY lb
    """


def zorder_write(df: DataFrame, path: str, cols: list[str],
                 n_files: int = 64, bits: int = 16) -> None:
    """Materialize the layout: z-key the frame, range-partition on the
    key so each of ``n_files`` output files owns one contiguous z-range,
    sort within files (tightens page-level stats too), write parquet
    without the helper key.  Boundaries come from Spark's range sampler —
    file sizes wobble, the per-file min/max containment does not."""
    keyed = zorder_key(df, cols, bits=bits)
    (keyed.repartitionByRange(n_files, "zkey")
          .sortWithinPartitions("zkey")
          .drop("zkey")
          .write.mode("overwrite").parquet(path))

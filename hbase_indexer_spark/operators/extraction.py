"""Cell -> document extraction operators (reference §2.3 P1-P13).

Operates on the canonical ``cells`` schema (FIXTURES.md §0):

    cells(table STRING, row STRING, family STRING, qualifier STRING,
          ts BIGINT, op STRING, value BINARY)

Everything here is pure DataFrame composition — extraction compiles an
IndexerConf into Catalyst column expressions (filter / array_sort /
transform / element_at), so Catalyst gets full column-pruning and
predicate-pushdown visibility and the row loop stays in whole-stage codegen.

Reference parity:
- single-cell extract   -> SingleCellExtractor.java:41-48        (P1)
- prefix cell extract   -> AbstractPrefixMatchingExtractor.java:57-71, qualifier-
  sorted via NavigableMap tailSet order -> array_sort here        (P2)
- prefix qualifier extract -> PrefixMatchingQualifierExtractor.java:21-31 (P3)
- type decode           -> ByteArrayValueMappers.java             (P5)
- dynamic output fields -> ExtractHBaseCellsBuilder.java:223-240  (P7)
- doc ids               -> String/HexUniqueKeyFormatter           (P9-P11)
- id injection          -> IdAddingSolrUpdateWriter.java:59-80    (P12)
- row/family injection  -> RowAndFamilyAddingSolrUpdateWriter.java:29-78 (P13)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_indexer_spark.config.indexer_conf import (
    SOURCE_QUALIFIER,
    FieldDef,
    IndexerConf,
)
from hbase_indexer_spark.functions.bytes_codec import decoder_for, is_custom_mapper
from hbase_indexer_spark.functions.colmemo import memo
from hbase_indexer_spark.functions.sqltext import decode_sql, qlit
from hbase_indexer_spark.functions import unique_key as uk

OP_PUT = "put"
DELETE_OPS = ("delete_column", "delete_family", "delete_row")


# ---------------------------------------------------------------------------
# Relevance predicates (F1-F3)
# ---------------------------------------------------------------------------

def table_predicate(conf: IndexerConf, table: Column) -> Column:
    """F1 — table routing: literal name or regex (IndexingEventListener.java:60-97)."""
    pat = conf.table_regex
    if pat is not None:
        return table.rlike(pat)
    return table == F.lit(conf.table)


def cell_matches(conf: IndexerConf, family: Column, qualifier: Column) -> Column:
    """Does a cell hit any extractor target? (isRelevantKV,
    DefaultResultToSolrMapper.java:119-126)."""
    preds = []
    for fam, qual in sorted(conf.exact_targets()):
        preds.append((family == fam) & (qualifier == qual))
    for fam, prefix in sorted(conf.prefix_targets()):
        p = family == fam
        if prefix:
            p = p & qualifier.startswith(prefix)
        preds.append(p)
    if not preds:
        return F.lit(False)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def _cell_matches_sql(conf: IndexerConf) -> str:
    """SQL text of :func:`cell_matches` over the canonical ``family`` /
    ``qualifier`` columns — one parse instead of one py4j round trip per
    operator (r10 #3; same OR-fold, same target ordering)."""
    preds = []
    for fam, qual in sorted(conf.exact_targets()):
        preds.append(f"((family = {qlit(fam)}) AND (qualifier = {qlit(qual)}))")
    for fam, prefix in sorted(conf.prefix_targets()):
        p = f"(family = {qlit(fam)})"
        if prefix:
            p = f"({p} AND startswith(qualifier, {qlit(prefix)}))"
        preds.append(p)
    if not preds:
        return "false"
    out = preds[0]
    for p in preds[1:]:
        out = f"({out} OR {p})"
    return out


def put_relevant_pred(conf: IndexerConf) -> Column:
    """The put-filter of the document builders — op = put AND the cell hits
    an extractor target.  Depends only on ``conf``, so compiled once per
    context (the builders run it per micro-batch), and parsed from SQL text
    in ONE round trip (r10 #3: the Column fold cost ~530 py4j calls per
    cold compile)."""
    return memo(("put_relevant", conf), lambda: F.expr(
        f"((op = {qlit(OP_PUT)}) AND {_cell_matches_sql(conf)})"
    ))


def relevance_predicate(conf: IndexerConf, family: Column, qualifier: Column,
                        op: Column) -> Column:
    """F2 — an event/cell is relevant iff it matches a target or is a delete
    (Indexer.java:297-311: deletes are always relevant)."""
    return cell_matches(conf, family, qualifier) | op.isin(*DELETE_OPS)


# ---------------------------------------------------------------------------
# Version resolution
# ---------------------------------------------------------------------------

def latest_cells(cells: DataFrame, order_cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Keep the newest version per (table,row,family,qualifier) — the HBase
    Result contract (one visible cell per column, highest timestamp).  A
    single partial aggregation (max_by) — no window, no second shuffle."""
    aggs = memo(("latest_cells", order_cols), lambda: [
        F.max_by("value", F.struct(*[F.col(c) for c in order_cols])).alias("value"),
        F.max(order_cols[0]).alias("ts"),
    ])
    return cells.groupBy("table", "row", "family", "qualifier").agg(*aggs)


# ---------------------------------------------------------------------------
# Field expression compiler
# ---------------------------------------------------------------------------

def _decode(fd: FieldDef, raw: Column) -> Column:
    dec = decoder_for(fd.type) if isinstance(fd.type, str) else fd.type
    if fd.params and is_custom_mapper(fd.type):
        # U1 Configurable contract: a custom mapper with <param> config is
        # called as fn(col, params_dict) (ConfigureUtil.java:1-33 analog);
        # params on built-in types are config metadata only
        return dec(raw, dict(fd.params))
    return dec(raw)


def _decode_sql(fd: FieldDef, e: str) -> str | None:
    """SQL text of :func:`_decode` over the SQL expression ``e``, or None
    when the field needs the Column path (custom U1 mappers are arbitrary
    callables, bigdecimal is a pandas UDF, non-string types are callables).
    Mirrors ``_decode``'s dispatch; tests/test_sqltext.py pins result and
    dtype equality per built-in type."""
    if not isinstance(fd.type, str) or is_custom_mapper(fd.type):
        return None
    return decode_sql(fd.type, e)


def field_expr(fd: FieldDef, cells_arr: Column) -> Column:
    """Compile one FieldDef into an expression over a per-row
    array<struct<family,qualifier,value>> (qualifier order restored by
    array_sort, preserving the reference's sorted-prefix contract)."""
    if not fd.wildcard:
        # P1 single cell: 0-or-1 value
        matched = F.filter(
            cells_arr,
            lambda c: (c["family"] == fd.family) & (c["qualifier"] == fd.qualifier),
        )
        return _decode(fd, F.try_element_at(matched, F.lit(1))["value"]).alias(fd.name)

    def pred(c):
        p = c["family"] == fd.family
        if fd.qualifier:
            p = p & c["qualifier"].startswith(fd.qualifier)
        return p

    matched = F.array_sort(F.filter(cells_arr, pred))  # struct sort => qualifier order
    if fd.type == "bigdecimal":
        # bigdecimal is the one pandas-UDF type, and a scalar UDF cannot be
        # invoked inside a HOF lambda — so extract the raw byte arrays in
        # Catalyst, then decode the whole array in one Arrow batch
        # (ByteArrayValueMappers.java:92-96: the mapper applies under any
        # extractor, wildcards included)
        from hbase_indexer_spark.functions.bytes_codec import (
            decode_bigdecimal_array,
        )

        if fd.source == SOURCE_QUALIFIER:
            raw = F.transform(matched, lambda c: c["qualifier"].cast("binary"))
        else:
            raw = F.transform(matched, lambda c: c["value"])
        values = decode_bigdecimal_array(raw)
    elif fd.source == SOURCE_QUALIFIER:
        # P3: index the qualifier bytes themselves
        values = F.transform(matched, lambda c: _decode(fd, c["qualifier"].cast("binary")))
    else:
        # P2: values of all matching qualifiers, qualifier-sorted
        values = F.transform(matched, lambda c: _decode(fd, c["value"]))

    if fd.dynamic_name:
        # P7: qualifier tail becomes the field name -> closed-form MapType column
        tails = F.transform(matched, lambda c: c["qualifier"].substr(F.lit(len(fd.qualifier) + 1), F.length(c["qualifier"])))
        return F.map_from_arrays(tails, values).alias(fd.name_stem)
    return values.alias(fd.name or "_positional")


def field_exprs(fd: FieldDef, cells_arr: Column) -> list[Column]:
    """Compile one FieldDef into its output column(s).  Normally one column;
    P8 positional output fields (``outputFields: [a,"",c]``,
    ExtractHBaseCellsBuilder.java:210-221) expand the qualifier-sorted
    extracted array into one column per non-empty name — the i-th value
    feeds the i-th name, empty names skip that position."""
    base = field_expr(fd, cells_arr)
    if not fd.output_fields:
        return [base]
    if not fd.wildcard:
        # single-cell extractor feeds at most ONE value, so only the first
        # positional name can be filled; later names stay typed NULLs
        # (ExtractHBaseCellsBuilder.java:208-221: the apply loop stops when
        # the extracted iterator is exhausted)
        return [
            (base if i == 0 else F.when(F.lit(False), base)).alias(name)
            for i, name in enumerate(fd.output_fields)
            if name
        ]
    return [
        F.try_element_at(base, F.lit(i + 1)).alias(name)
        for i, name in enumerate(fd.output_fields)
        if name
    ]


def _resolution_key(conf: IndexerConf) -> tuple:
    """Identity of every runtime-registry callable a compile of ``conf``
    resolves (U1 custom value mappers looked up by name).  Part of each
    memo key: re-registering a name resolves to a different callable, so
    the cached compile is invalidated exactly when resolution would change.

    The key holds the callable OBJECT, not its ``id()`` (ADVICE r9):
    functions hash by identity, and the key tuple's reference keeps the
    resolved callable alive for as long as the memo entry exists — a
    de-registered mapper's address can therefore never be recycled into a
    colliding id while a compile against it is still cached."""
    return tuple(
        decoder_for(fd.type)
        if isinstance(fd.type, str) and is_custom_mapper(fd.type) else None
        for fd in conf.fields
    )


def row_id_expr(conf: IndexerConf, row: Column, table: Column) -> Column:
    fmt = uk.row_formatter(conf.unique_key_formatter)
    out = fmt(row)
    if conf.table_name_field is None and conf.table_regex is not None:
        # multi-table indexers need table-qualified ids to stay unique
        out = uk.with_table(table, out, hex_mode=conf.unique_key_formatter == "hex")
    return out


def keyvalue_id_expr(conf: IndexerConf, row: Column, family: Column,
                     qualifier: Column) -> Column:
    fmt = uk.keyvalue_formatter(conf.unique_key_formatter)
    return fmt(row, family, qualifier)


# ---------------------------------------------------------------------------
# Document builders
# ---------------------------------------------------------------------------

def row_documents(cells: DataFrame, conf: IndexerConf) -> DataFrame:
    """ROW mapping (Indexer.RowBasedIndexer, Indexer.java:222-323): one doc
    per rowkey, built from the latest visible version of each mapped column.

    Scale shape: filter -> single groupBy(row) shuffle -> project.  The
    relevance filter runs before the shuffle (change pruning, Indexer.java:
    297-311) and Catalyst pushes the column prune into the scan.

    When every field is an exact ``cf:qual`` target the plan pivots directly
    in ONE aggregation — ``max(when(match, struct(ts, value)))`` per field —
    which is partially-aggregable (map-side combine collapses each rowkey's
    cells to one pre-aggregated row before the exchange), so the shuffle
    carries one row per key instead of one row per cell, and version
    resolution (latest ts wins) costs no extra shuffle.  Wildcard fields
    need the cell array (qualifier-sorted multi-value contract), so those
    configs fall back to version-dedup + collect_list (two exchanges).
    """
    put_cells = cells.filter(put_relevant_pred(conf))

    def id_cols() -> list[Column]:
        out: list[Column] = [
            row_id_expr(conf, F.col("row"), F.col("table")).alias(conf.unique_key_field)
        ]
        if conf.table_name_field:
            out.append(F.col("table").alias(conf.table_name_field))
        return out

    reskey = _resolution_key(conf)
    if all(not fd.wildcard for fd in conf.fields):
        # compiled from SQL text, ONE parse per expression (r10 #3): the
        # Column-built version cost ~2.5k py4j round trips per cold compile
        # (aggs ~730, decode projections ~1.8k — decode_double alone is
        # ~360 calls).  Fields with no SQL form (custom mappers,
        # bigdecimal) fall back to the Column path per field; the parsed
        # trees are plan-identical (tests/test_sqltext.py + plan snapshots).
        def build() -> tuple:
            aggs = [
                F.expr(
                    f"max(CASE WHEN ((family = {qlit(fd.family)})"
                    f" AND (qualifier = {qlit(fd.qualifier)}))"
                    f" THEN struct(ts, value) END)"
                ).alias(f"_c{i}")
                for i, fd in enumerate(conf.fields)
            ]
            cols = id_cols()
            for i, fd in enumerate(conf.fields):
                ds = _decode_sql(fd, f"_c{i}.value")
                cols.append(
                    F.expr(ds).alias(fd.name) if ds is not None
                    else _decode(fd, F.col(f"_c{i}")["value"]).alias(fd.name))
            return aggs, cols

        aggs, cols = memo(("row_docs_exact", conf, reskey), build)
        return put_cells.groupBy("table", "row").agg(*aggs).select(*cols)

    latest = latest_cells(put_cells)
    agg, cols = memo(("row_docs_wild", conf, reskey), lambda: (
        F.collect_list(F.struct("family", "qualifier", "value")).alias("_cells"),
        id_cols() + [c for fd in conf.fields for c in field_exprs(fd, F.col("_cells"))],
    ))
    return latest.groupBy("table", "row").agg(agg).select(*cols)


def column_documents(cells: DataFrame, conf: IndexerConf) -> DataFrame:
    """COLUMN mapping (Indexer.ColumnBasedIndexer, Indexer.java:325-451): one
    doc per matched cell; id = formatted (row, family, qualifier)
    (BaseUniqueKeyFormatter.java:63-66)."""
    put_cells = cells.filter(put_relevant_pred(conf))
    latest = latest_cells(put_cells)

    def build_cols() -> list[Column]:
        cols: list[Column] = [
            keyvalue_id_expr(conf, F.col("row"), F.col("family"), F.col("qualifier"))
            .alias(conf.unique_key_field)
        ]
        if conf.table_name_field:
            cols.append(F.col("table").alias(conf.table_name_field))
        if conf.row_field:
            # P13 row injection, formatted like the id parts
            fmt = uk.format_row_hex if conf.unique_key_formatter == "hex" else uk.format_row_string
            cols.append(fmt(F.col("row")).alias(conf.row_field))
        if conf.column_family_field:
            fmt = uk.format_row_hex if conf.unique_key_formatter == "hex" else uk.format_row_string
            cols.append(fmt(F.col("family")).alias(conf.column_family_field))
        # evaluate every field def against the single cell
        single = F.array(F.struct("family", "qualifier", "value"))
        for fd in conf.fields:
            if fd.output_fields:
                # per-cell doc: only position 0 can ever match
                cols.extend(field_exprs(fd, single))
                continue
            fe = field_expr(fd, single)
            if fd.wildcard and not fd.dynamic_name:
                # per-cell doc: a wildcard match yields exactly the one value
                fe = F.try_element_at(fe, F.lit(1)).alias(fd.name)
            cols.append(fe)
        return cols

    cols = memo(("col_docs", conf, _resolution_key(conf)), build_cols)
    return latest.select(*cols)

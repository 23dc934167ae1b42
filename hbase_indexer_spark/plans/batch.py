"""Batch indexing plan (reference §3.2: HBaseMapReduceIndexerTool path).

scan -> table route (F1) -> relevance filter (F2) -> latest-version resolve ->
document build (P1-P13).  Re-read is forced off in batch, matching
HBaseIndexerMapper.java:219-222 (the scan already holds full rows).

The result is a plain DataFrame; materialization (the "go-live") is the
sink's job (hbase_indexer_spark.sinks.index_store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_indexer_spark.config.indexer_conf import MAPPING_COLUMN, IndexerConf
from hbase_indexer_spark.operators.extraction import (
    column_documents,
    row_documents,
    table_predicate,
)


def build_index(cells: DataFrame, conf: IndexerConf) -> DataFrame:
    """Materialize the index for one indexer definition over a cells snapshot.

    ``conf.mapper`` selects a registered whole-row mapper instead of the
    default doc build (U2); ``conf.transform_stages`` appends a compiled
    transform chain (P15/P16) after the build.
    """
    routed = cells.filter(table_predicate(conf, F.col("table")))
    if conf.mapper is not None:
        from hbase_indexer_spark.operators.transform import row_mapper_for

        docs = row_mapper_for(conf.mapper)(routed, conf)
    elif conf.mapping_type == MAPPING_COLUMN:
        docs = column_documents(routed, conf)
    else:
        docs = row_documents(routed, conf)
    if conf.transform_stages:
        from hbase_indexer_spark.operators.transform import TransformChain

        chain = TransformChain.from_config(
            list(conf.transform_stages), dict(conf.variables) or None
        )
        docs = chain(docs)
    return docs

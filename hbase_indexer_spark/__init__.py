"""hbase_indexer_spark — a PySpark-native analytics/indexing engine with the
query and data-processing capabilities of NGDATA/hbase-indexer.

The reference (at /root/reference, cited as ``file:line`` in docstrings) is a
CDC -> transform -> index pipeline over HBase cells.  This package re-expresses
the same semantics Spark-first:

- canonical ``cells`` DataFrames instead of HBase KeyValues,
- declarative indexer configs compiled to Catalyst column expressions,
- batch indexing as a plain DataFrame plan (scan -> extract -> doc build),
- incremental indexing as Structured Streaming + foreachBatch upsert,
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal) built on the same engine surface.
"""

__version__ = "0.1.0"

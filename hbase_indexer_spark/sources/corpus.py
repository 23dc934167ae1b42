"""Document-corpus ingestion: JSONL / CSV / parquet readers with an
enforced schema.

The reference reads exactly one source (HBase scans / SEP events); a
training-data pipeline ingests raw corpora, and the two formats that
actually arrive from crawlers and labeling vendors are JSONL and CSV.
Both are full of escaping footguns (newlines inside quoted fields,
quotes inside text, unicode), so the readers here always take an
EXPLICIT schema — inference on 100 TB means an extra full pass and a
schema that drifts with the sample — and the writer/reader pair is
round-trip tested against adversarial strings (tests/test_corpus_io.py)
and oracle-gated against the parquet ground truth (jsonl_ingest /
csv_ingest).

Scale notes:
- JSONL and CSV-with-multiLine differ sharply at scale: JSONL is
  splittable by newline (records never contain raw newlines — they're
  escaped as \\n inside JSON strings), so a 1 TB file still fans out
  across executors.  CSV with ``multiLine=true`` must be parsed from the
  start of the file (quoted fields may contain real newlines) — one
  split per FILE.  Prefer JSONL for big corpora; if CSV is what you
  have, shard it into many files upstream.
- ``mode="FAILFAST"`` by default: silent null-ification of malformed
  rows (Spark's default PERMISSIVE) is how corpus corruption gets into
  training sets unnoticed.  Pass mode="PERMISSIVE" plus a
  ``columnNameOfCorruptRecord`` explicitly if you want quarantine-style
  handling instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_jsonl(spark: SparkSession, path: str,
               schema: str = DOCUMENTS_SCHEMA,
               mode: str = "FAILFAST") -> DataFrame:
    """One JSON object per line -> rows under the given schema."""
    return (spark.read.schema(schema).option("mode", mode)
            .json(path))


def write_jsonl(df: DataFrame, path: str) -> None:
    """The inverse: newline-delimited JSON, raw newlines escaped by the
    JSON encoder so the output stays line-splittable."""
    df.write.mode("overwrite").json(path)


def read_csv(spark: SparkSession, path: str,
             schema: str = DOCUMENTS_SCHEMA,
             mode: str = "FAILFAST") -> DataFrame:
    """Quoted CSV with embedded newlines/quotes/commas handled: header
    row, '"' quoting with '"' escape (RFC-4180 doubling), multiLine on
    — see the module docstring for what multiLine costs at scale."""
    return (spark.read.schema(schema)
            .option("header", True)
            .option("quote", '"').option("escape", '"')
            .option("multiLine", True)
            .option("mode", mode)
            .csv(path))


def write_csv(df: DataFrame, path: str) -> None:
    # ignore*WhiteSpace default to TRUE on the write path (they default
    # to false only for reads): without these two options the writer
    # silently trims leading/trailing whitespace — including trailing
    # newlines and tabs — from every quoted field.  Caught by the
    # adversarial roundtrip test, not by clean fixture data.
    #
    # DOCUMENTED LIMITATION (r8, found by hypothesis): NUL bytes (\x00)
    # are not reliably round-trippable through Spark's CSV path — the
    # multiLine (univocity) reader drops NULs that immediately follow a
    # newline inside a quoted field ('a\n\x00b' reads back 'a\nb');
    # NULs in any other position survive.  Corpora that may contain
    # NULs must use JSONL (lossless, JSON-escaped);
    # test_csv_nul_behavior pins the current behavior so a parser
    # change surfaces.
    df.write.mode("overwrite") \
        .option("header", True) \
        .option("quote", '"').option("escape", '"') \
        .option("quoteAll", True) \
        .option("ignoreLeadingWhiteSpace", False) \
        .option("ignoreTrailingWhiteSpace", False) \
        .csv(path)


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet",
                   schema: str = DOCUMENTS_SCHEMA) -> DataFrame:
    """Format-dispatching corpus reader (the ingestion front door).

    The explicit-schema contract holds on every path (r5 ADVICE closed
    the parquet exemption): JSONL/CSV parse under the declared schema;
    parquet carries its own types, so instead of silently trusting them
    the read schema is VALIDATED against the declared one — name or type
    drift in upstream-written files fails fast here, not three operators
    later in a cast."""
    if fmt == "parquet":
        from pyspark.sql.types import StructType

        df = spark.read.parquet(path)
        want = StructType.fromDDL(schema)
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        missing = [f.name for f in want.fields if f.name not in got]
        drift = [
            f"{f.name}: {got[f.name]} != {f.dataType.simpleString()}"
            for f in want.fields
            if f.name in got and got[f.name] != f.dataType.simpleString()
        ]
        if missing or drift:
            raise ValueError(
                f"parquet corpus at {path} does not match the declared "
                f"schema: missing={missing} type_drift={drift}")
        # declared column order/subset, so extra upstream columns don't
        # silently widen downstream scans
        return df.select(*[f.name for f in want.fields])
    if fmt == "jsonl":
        return read_jsonl(spark, path, schema)
    if fmt == "csv":
        return read_csv(spark, path, schema)
    raise ValueError(f"unknown corpus format {fmt!r} "
                     "(parquet | jsonl | csv)")

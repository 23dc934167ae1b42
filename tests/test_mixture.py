"""Temperature mixture resampling (mixture_resample).

Pins: the smallest group is never downsampled, output mixture tracks
n_g**alpha, alpha=1 keeps (nearly) everything, determinism under
re-partitioning/re-run, and the md5-bucket selection rule itself.
"""

import math

from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.curation import mixture_resample


def _docs(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for lang, n in sorted(sizes.items()):
        for _ in range(n):
            rows.append((i, f"text {i}", lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_smallest_group_kept_whole(spark):
    docs = _docs(spark, {"en": 400, "de": 25})
    out = mixture_resample(docs, alpha=0.5)
    kept = {r["lang"]: r["n"] for r in
            out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert kept["de"] == 25
    # en keep rate ~ sqrt(25/400) = 0.25
    assert abs(kept["en"] / 400 - 0.25) < 0.05


def test_output_mixture_tracks_alpha(spark):
    sizes = {"en": 900, "es": 100}
    out = mixture_resample(_docs(spark, sizes), alpha=0.5)
    kept = {r["lang"]: r["n"] for r in
            out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # target ratio en:es = sqrt(900):sqrt(100) = 3:1
    assert abs(kept["en"] / kept["es"] - 3.0) < 0.5


def test_alpha_one_is_identity(spark):
    docs = _docs(spark, {"en": 50, "de": 20})
    assert mixture_resample(docs, alpha=1.0).count() == 70


def test_deterministic_and_partitioning_independent(spark):
    docs = _docs(spark, {"en": 300, "de": 60})
    a = {r["doc_id"] for r in mixture_resample(docs).collect()}
    b = {r["doc_id"] for r in
         mixture_resample(docs.repartition(13)).collect()}
    assert a == b and a


def test_cutoff_matches_formula(spark):
    docs = _docs(spark, {"en": 400, "de": 25})
    cuts = {r["lang"]: r["cutoff"]
            for r in mixture_resample(docs).select("lang", "cutoff")
            .distinct().collect()}
    assert cuts["de"] == 10_000
    assert cuts["en"] == math.floor(math.sqrt(25) / math.sqrt(400) * 10_000)

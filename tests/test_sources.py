"""Sources/sinks: format roundtrips and partitioned-write layout, over
the real testdata tables."""

import os

import pytest
from pyspark.sql import functions as F

from faconne_spark.queries import T
from faconne_spark.sources import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_partitioned_parquet,
)


def _docs(spark, sf_dir):
    return T(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text"
    )


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    p = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, p)
    back = read_jsonl(spark, p, docs.schema)
    assert back.schema == docs.schema
    assert (
        back.exceptAll(docs).count() == 0 and docs.exceptAll(back).count() == 0
    )


def test_jsonl_rejects_binary(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir).withColumn("b", F.expr("cast(unhex(md5(text)) as binary)"))
    with pytest.raises(ValueError, match="base64"):
        write_jsonl(docs, str(tmp_path / "nope"))


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    # CSV can't carry embedded newlines/quotes losslessly without care;
    # use the scalar columns (the common CSV use-case: tabular exports)
    docs = _docs(spark, sf_dir).drop("text")
    p = str(tmp_path / "docs_csv")
    write_csv(docs, p)
    back = read_csv(spark, p, docs.schema)
    assert back.schema == docs.schema
    assert (
        back.exceptAll(docs).count() == 0 and docs.exceptAll(back).count() == 0
    )


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    p = str(tmp_path / "docs_part")
    write_partitioned_parquet(
        docs, p, ["lang"], approx_rows=docs.count(), target_rows_per_file=200
    )
    # layout: hive-style lang=... directories
    langs = {d for d in os.listdir(p) if d.startswith("lang=")}
    assert len(langs) >= 2

    back = spark.read.parquet(p)
    q = back.filter("lang = 'en'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the lang predicate is a PartitionFilter, not a data filter
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
    assert q.count() == docs.filter("lang = 'en'").count()

    # full roundtrip fidelity (partition col comes back as string value)
    assert (
        back.select(*docs.columns).exceptAll(docs).count() == 0
        and docs.exceptAll(back.select(*docs.columns)).count() == 0
    )

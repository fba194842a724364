"""Sources/sinks: JSONL round-trip, partitioned parquet write with
partition pruning visible in the plan."""

import shutil

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

TMP = "/root/repo/.tmp/io_tests"


def test_jsonl_roundtrip(spark):
    from koalas_spark.sources.io import read_jsonl, write_jsonl

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    path = f"{TMP}/docs_jsonl"
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, "doc_id bigint, lang string, n_chars bigint")
    assert back.count() == docs.count()
    a = {(r.doc_id, r.lang, r.n_chars) for r in docs.collect()}
    b = {(r.doc_id, r.lang, r.n_chars) for r in back.collect()}
    assert a == b
    # missing field -> null, declared schema preserved
    wider = read_jsonl(spark, path, "doc_id bigint, lang string, missing double")
    row = wider.filter(F.col("doc_id") == docs.first().doc_id).first()
    assert row.missing is None
    shutil.rmtree(path, ignore_errors=True)


def test_orc_roundtrip_pushdown(spark):
    from koalas_spark.sources.io import read_orc, write_orc

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    path = f"{TMP}/docs_orc"
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    a = {(r.doc_id, r.lang, r.n_chars) for r in docs.collect()}
    b = {(r.doc_id, r.lang, r.n_chars) for r in back.collect()}
    assert a == b
    # filters push into the ORC scan like parquet
    plan = (
        back.filter(F.col("lang") == "en")
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: []" not in plan and "lang" in plan
    shutil.rmtree(path, ignore_errors=True)


def test_partitioned_parquet_prunes(spark):
    from koalas_spark.sources.io import write_parquet_partitioned

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = f"{TMP}/docs_by_lang"
    write_parquet_partitioned(docs, path, ("lang",))
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    one = back.filter(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the lang filter must become a partition filter (directory skip),
    # not a data filter evaluated per row
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    expected = docs.filter(F.col("lang") == "en").count()
    assert one.count() == expected
    shutil.rmtree(path, ignore_errors=True)

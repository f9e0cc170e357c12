"""End-to-end lifecycle tests: entry smoke, pipeline facade, runner parity,
JSONL round-trip with corrupt-record quarantine."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from genai_batch_processor_spark import OpenAIBatchPipeline
from genai_batch_processor_spark.functions import ids
from genai_batch_processor_spark.inference import mock, runner
from genai_batch_processor_spark.operators import requests, responses
from genai_batch_processor_spark.sources import jsonl
from genai_batch_processor_spark.sources.tables import load_table


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(10).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "lang", "status", "answer"}


def test_queries_have_oracles_or_are_flagged(spark):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(sqls).issubset(set(qs))


def test_pipeline_facade_end_to_end(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    docs = ids.assign_ids(docs, "doc_id")
    pipe = OpenAIBatchPipeline(spark, work_dir=str(tmp_path))
    results, errors = pipe.run(docs, poll_interval_seconds=0.01)
    n_res, n_err = results.count(), errors.count()
    assert n_res + n_err == 50
    assert n_err > 0  # deterministic mock injects errors
    got = results.select(
        responses.extract_answer(
            responses.extract_content(F.col("resp"))
        ).alias("answer")
    ).collect()
    assert all(r["answer"] in mock.DEFAULT_LABELS for r in got)
    # manifest persisted for resume-by-batch_id
    manifests = os.listdir(tmp_path / "manifests")
    assert manifests
    state = json.load(open(tmp_path / "manifests" / manifests[0]))
    assert state["state"] == "completed" and state["batch_ids"]


def test_mapinpandas_runner_matches_column_mock(spark, sf_dir):
    """The distributed mapInPandas inference path and the pure-column mock
    must produce identical responses (same deterministic algorithm)."""
    docs = load_table(spark, sf_dir, "documents").limit(100)
    docs = ids.assign_ids(docs, "doc_id")
    docs = docs.withColumn(
        "prompt", requests.classification_prompt("text", mock.DEFAULT_LABELS)
    ).withColumn("custom_id", ids.custom_id("idx"))

    via_runner = runner.run_inference(
        docs, mock.MockInferenceClient, micro_batch_size=16
    ).select(F.to_json("resp").alias("j"))
    via_columns = docs.select(
        F.to_json(
            mock.mock_response_columns(F.col("custom_id"), F.col("prompt"))
        ).alias("j")
    )
    assert sorted(r["j"] for r in via_runner.collect()) == sorted(
        r["j"] for r in via_columns.collect()
    )


def test_jsonl_roundtrip_and_quarantine(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    docs = ids.assign_ids(docs, "doc_id")
    reqs = requests.build_openai_requests(
        docs,
        id_col="idx",
        user_content=F.array(requests.text_part(F.col("text"))),
    )
    path = str(tmp_path / "reqs")
    jsonl.write_jsonl(reqs.select("request.*"), path)
    # copy the shards into a dir Spark has never listed, plus a corrupt line
    # (appending in place would trip Spark's shared file-status cache)
    dirty = tmp_path / "reqs_dirty"
    dirty.mkdir()
    for part in os.listdir(path):
        if part.startswith("part-"):
            with open(os.path.join(path, part)) as src:
                (dirty / part).write_text(src.read())
    (dirty / "part-corrupt.txt").write_text("{this is not json\n")
    good, bad = jsonl.read_request_jsonl(spark, str(dirty))
    assert good.count() == 20
    assert bad.count() == 1
    assert good.select("custom_id").distinct().count() == 20


def test_sharded_write(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "sharded")
    jsonl.write_jsonl(
        docs.select("doc_id", "text"), path, max_records_per_file=100
    )
    parts = [p for p in os.listdir(path) if p.startswith("part-")]
    assert len(parts) >= 5  # 500 rows / 100 per file


def test_empty_input_short_circuit(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(0)
    docs = ids.assign_ids(docs, "doc_id")
    pipe = OpenAIBatchPipeline(spark, work_dir=str(tmp_path))
    results, errors = pipe.run(docs)
    assert results.count() == 0 and errors.count() == 0

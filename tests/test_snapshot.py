"""Unit tests for snapshot diffing (operators/snapshot.py) and the
shard-planned JSONL sink (sources/jsonl.py:write_jsonl_planned).

Oracle parity for the registered ``snapshot_changes`` query is covered
by tests/test_parity.py; these pin the operator contracts on hand-built
relations where every expected classification is known by construction.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import ids
from genai_batch_processor_spark.operators import batching, snapshot
from genai_batch_processor_spark.sources import jsonl
from genai_batch_processor_spark.sources.tables import load_table


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b string")


def test_snapshot_diff_classifies_all_four(spark):
    old = _snap(spark, [(1, "x", "y"), (2, "x", "y"), (3, "x", "y")])
    new = _snap(spark, [(1, "x", "y"), (2, "CHANGED", "y"), (4, "x", "y")])
    got = {
        r["k"]: r["change"]
        for r in snapshot.snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    }
    assert got == {
        1: snapshot.UNCHANGED,
        2: snapshot.CHANGED,
        3: snapshot.DELETED,
        4: snapshot.ADDED,
    }


def test_snapshot_diff_null_vs_empty_string(spark):
    """The fingerprint must distinguish NULL from '' and keep field
    boundaries (('ab','c') != ('a','bc'))."""
    old = _snap(spark, [(1, None, "y"), (2, "ab", "c")])
    new = _snap(spark, [(1, "", "y"), (2, "a", "bc")])
    got = {
        r["k"]: r["change"]
        for r in snapshot.snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    }
    assert got == {1: snapshot.CHANGED, 2: snapshot.CHANGED}


def test_incremental_rows_returns_added_and_changed_payload(spark):
    old = _snap(spark, [(1, "x", "y"), (2, "x", "y"), (3, "x", "y")])
    new = _snap(spark, [(1, "x", "y"), (2, "CHANGED", "y"), (4, "new", "y")])
    inc = snapshot.incremental_rows(old, new, ["k"], ["a", "b"]).collect()
    assert {(r["k"], r["a"]) for r in inc} == {(2, "CHANGED"), (4, "new")}


def test_write_jsonl_planned_one_file_per_shard(spark, sf_dir, tmp_path):
    docs = ids.assign_ids(load_table(spark, sf_dir, "documents"), "doc_id")
    sized = docs.withColumn("n_bytes", F.octet_length("text").cast("long"))
    planned = batching.plan_shards(
        sized,
        id_col="idx",
        bytes_col="n_bytes",
        max_lines=40,
        max_bytes=16_384,
    ).select("doc_id", "idx", "shard_key")
    out = os.path.join(str(tmp_path), "planned")
    jsonl.write_jsonl_planned(planned, out)

    shard_dirs = sorted(glob.glob(os.path.join(out, "shard_key=*")))
    n_shards = planned.select("shard_key").distinct().count()
    assert len(shard_dirs) == n_shards
    total = 0
    for d in shard_dirs:
        files = [f for f in glob.glob(os.path.join(d, "*")) if "_" not in
                 os.path.basename(f)[:1]]
        data_files = [f for f in files if os.path.basename(f).startswith("part-")]
        assert len(data_files) == 1, f"{d}: expected one file per shard"
        with open(data_files[0]) as fh:
            lines = [json.loads(line) for line in fh if line.strip()]
        assert len(lines) <= 40
        total += len(lines)
        # payload round-trips without the partition column
        assert set(lines[0].keys()) == {"doc_id", "idx"}
    assert total == docs.count()


def test_ivf_index_roundtrip_search(spark, sf_dir, tmp_path):
    """Train → persist → reload → search must equal in-session search
    bit-for-bit (sources/index_store.py), and a wrong format version
    must fail loudly."""
    import pytest
    from genai_batch_processor_spark.operators import clustering, similarity
    from genai_batch_processor_spark.sources import index_store

    emb = load_table(spark, sf_dir, "embeddings")
    cells = clustering.kmeans_cells(emb)
    direct = clustering.centroids_from_cells(cells)

    path = str(tmp_path / "ivf_index")
    index_store.save_centroids(cells, path)
    loaded = index_store.load_centroids(spark, path)
    assert loaded == direct

    qs = emb.filter(F.col("vec_id") < 4)
    a = similarity.topk_ivf(emb, qs, centroids=direct).collect()
    b = similarity.topk_ivf(emb, qs, centroids=loaded).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # tampered version must be rejected
    bad = spark.read.parquet(path).withColumn(
        "format_version", F.lit(99)
    )
    bad_path = str(tmp_path / "ivf_bad")
    bad.write.mode("overwrite").parquet(bad_path)
    with pytest.raises(ValueError, match="format_version"):
        index_store.load_centroids(spark, bad_path)


def test_fingerprint_separator_collision_detected(spark):
    """Values containing the field separator byte must not collide:
    ('a\\x1fb','c') vs ('a','b\\x1fc') concatenate identically without
    the length-prefix encoding — a missed CHANGED row would silently
    skip reprocessing."""
    old = _snap(spark, [(1, "a\x1fb", "c")])
    new = _snap(spark, [(1, "a", "b\x1fc")])
    got = snapshot.snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    assert got[0]["change"] == snapshot.CHANGED

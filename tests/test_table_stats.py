"""Persisted corpus-stats sidecar (operators/stats.py)."""

import json
import os
import shutil

import pytest

from bigquery_cross_environment_etl_pipeline_spark.operators import stats as st

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture()
def dataset(tmp_path):
    """A private copy of the smoke dataset so fingerprints and sidecars
    are isolated from the shared testdata."""
    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "events.parquet")
    old = os.environ.get("SPARK_GRAFT_INDEX_DIR")
    os.environ["SPARK_GRAFT_INDEX_DIR"] = str(tmp_path / "idx")
    yield str(d)
    if old is None:
        del os.environ["SPARK_GRAFT_INDEX_DIR"]
    else:
        os.environ["SPARK_GRAFT_INDEX_DIR"] = old


def test_stats_compute_and_cache_hit(spark, dataset):
    s = st.table_stats(spark, dataset, "events", ["user_id"])
    assert s["count"] > 0
    assert s["max"]["user_id"] >= s["min"]["user_id"]
    path = st._stats_path(dataset, "events")
    assert os.path.isfile(path)
    # prove the second call is served from the sidecar, not recomputed:
    # poison the file and expect the poisoned value back
    with open(path) as f:
        doc = json.load(f)
    doc["max"]["user_id"] = -123
    with open(path, "w") as f:
        json.dump(doc, f)
    again = st.table_stats(spark, dataset, "events", ["user_id"])
    assert again["max"]["user_id"] == -123


def test_stats_merge_new_columns(spark, dataset):
    st.table_stats(spark, dataset, "events", ["user_id"])
    merged = st.table_stats(spark, dataset, "events", ["user_id", "value"])
    assert "value" in merged["max"] and "user_id" in merged["max"]
    with open(st._stats_path(dataset, "events")) as f:
        doc = json.load(f)
    assert set(doc["max"]) == {"user_id", "value"}


def test_stats_invalidate_on_regenerated_dataset(spark, dataset):
    s1 = st.table_stats(spark, dataset, "events", ["user_id"])
    p1 = st._stats_path(dataset, "events")
    # regenerate the dataset in place: same bytes, new mtime_ns
    f = os.path.join(dataset, "events.parquet")
    stat = os.stat(f)
    os.utime(f, ns=(stat.st_atime_ns, stat.st_mtime_ns + 1_000_000))
    p2 = st._stats_path(dataset, "events")
    assert p1 != p2, "fingerprint must change with mtime_ns"
    s2 = st.table_stats(spark, dataset, "events", ["user_id"])
    assert s2["max"]["user_id"] == s1["max"]["user_id"]


def test_stats_refuse_timestamp_columns(spark, dataset):
    with pytest.raises(TypeError):
        st.table_stats(spark, dataset, "events", ["ts"])


def test_stats_recover_from_non_dict_sidecar(spark, dataset):
    """Valid JSON that is not an object (e.g. a truncated/hand-edited
    file holding []) must trigger the recompute path, not crash."""
    s1 = st.table_stats(spark, dataset, "events", ["user_id"])
    path = st._stats_path(dataset, "events")
    with open(path, "w") as f:
        f.write("[]")
    s2 = st.table_stats(spark, dataset, "events", ["user_id"])
    assert s2["max"]["user_id"] == s1["max"]["user_id"]


def test_stats_refusal_is_schema_time_and_leaves_no_tmp(spark, dataset):
    """The type refusal happens before any scan and the atomic-publish
    tmp file never leaks into the index dir."""
    idx_dir = os.environ["SPARK_GRAFT_INDEX_DIR"]
    with pytest.raises(TypeError):
        st.table_stats(spark, dataset, "events", ["ts"])
    leftovers = (
        [f for f in os.listdir(idx_dir) if f.endswith(".tmp")]
        if os.path.isdir(idx_dir)
        else []
    )
    assert leftovers == []

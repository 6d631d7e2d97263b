"""Zone-map layout (sources/zonemap.py): manifest-planned pruning is
REAL (fewer read tasks), conservative (never drops a matching row), and
exact (residual filter re-applies the predicate)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from occular_ocr_ray.sources import zonemap as zm  # noqa: E402

pytestmark = pytest.mark.usefixtures("ray_session")


def _ds(keys: np.ndarray):
    import ray.data as rd

    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "payload": pa.array(np.arange(len(keys)), pa.int64())})
    return rd.from_arrow(t).repartition(4)


def test_write_plan_read_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 100_000, size=5_000)
    path = str(tmp_path / "zm")
    manifest = zm.write_range_partitioned(_ds(keys), path, "k",
                                          num_buckets=8)
    # every bucket dir exists, rows are conserved, ranges are disjoint
    assert sum(b["rows"] for b in manifest["buckets"]) == len(keys)
    ordered = sorted(manifest["buckets"], key=lambda b: b["zb"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["max"] < b["min"]

    lo, hi = 20_000, 30_000
    dirs, total = zm.plan_range(path, lo, hi)
    assert 0 < len(dirs) < total  # pruning actually happened

    got = np.sort(zm.read_range(path, lo, hi).to_pandas()["k"].to_numpy())
    want = np.sort(keys[(keys >= lo) & (keys <= hi)])
    np.testing.assert_array_equal(got, want)


def test_boundary_rows_are_kept(tmp_path):
    # keys sitting exactly on histogram/bucket edges must survive
    keys = np.array([0, 63, 64, 127, 128, 4096, 4096, 9999], dtype=np.int64)
    path = str(tmp_path / "zm")
    zm.write_range_partitioned(_ds(keys), path, "k", num_buckets=4)
    got = np.sort(zm.read_range(path, 64, 4096).to_pandas()["k"].to_numpy())
    np.testing.assert_array_equal(got, [64, 127, 128, 4096, 4096])


def test_empty_range_and_out_of_domain(tmp_path):
    keys = np.arange(1_000, dtype=np.int64)
    path = str(tmp_path / "zm")
    zm.write_range_partitioned(_ds(keys), path, "k", num_buckets=4)
    dirs, total = zm.plan_range(path, 10_000, 20_000)
    assert dirs == [] and total == 4
    assert zm.read_range(path, 10_000, 20_000).count() == 0


def test_empty_dataset(tmp_path):
    path = str(tmp_path / "zm")
    manifest = zm.write_range_partitioned(
        _ds(np.array([], dtype=np.int64)), path, "k", num_buckets=4)
    assert manifest["buckets"] == []


def test_column_pruned_read(tmp_path):
    keys = np.arange(2_000, dtype=np.int64)
    path = str(tmp_path / "zm")
    zm.write_range_partitioned(_ds(keys), path, "k", num_buckets=4)
    df = zm.read_range(path, 100, 200, columns=["payload"]).to_pandas()
    assert set(df.columns) >= {"payload", "k"}
    assert len(df) == 101

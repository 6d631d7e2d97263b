"""Continuous crawl-ingest protocol: cross-increment dedup, resume
skip, crash replay from snapshot, snapshot_every commit granularity."""

from __future__ import annotations

import json
import os
import shutil

import pytest
import ray.data as rd

from occular_ocr_ray.pipelines.crawl_ingest import read_corpus, run_crawl_ingest
from occular_ocr_ray.sources.pages import write_pages

pytestmark = pytest.mark.usefixtures("ray_session")


def _pages_factory(path: str):
    return lambda: rd.read_parquet(path)


@pytest.fixture(scope="module")
def crawl_dirs(tmp_path_factory):
    """Two overlapping crawl increments: inc2's first 60 urls repeat
    inc1 (write_pages is deterministic per url at every size)."""
    root = tmp_path_factory.mktemp("crawl")
    d1, d2 = str(root / "inc1"), str(root / "inc2")
    write_pages(d1, 60, seed=42, num_files=2)
    write_pages(d2, 90, seed=42, num_files=3)
    return d1, d2


def _content_set(work_dir: str) -> set:
    return set(
        read_corpus(work_dir, columns=["extracted_text"])
        .to_pandas()["extracted_text"]
    )


def _expected_sets(d1: str, d2: str):
    from occular_ocr_ray.pipelines.flagship import extract_dataset

    t1 = set(extract_dataset(rd.read_parquet(d1))
             .select_columns(["extracted_text"]).to_pandas()["extracted_text"])
    t2 = set(extract_dataset(rd.read_parquet(d2))
             .select_columns(["extracted_text"]).to_pandas()["extracted_text"])
    return t1, t2


def test_crawl_ingest_cross_increment_dedup(crawl_dirs, tmp_path):
    d1, d2 = crawl_dirs
    wd = str(tmp_path / "wd")
    res = run_crawl_ingest(
        [("c1", _pages_factory(d1)), ("c2", _pages_factory(d2))], wd,
        num_shards=4,
    )
    t1, t2 = _expected_sets(d1, d2)
    assert res["c1"]["status"] == "ran" and res["c2"]["status"] == "ran"
    assert res["c1"]["admitted"] == len(t1)
    assert res["c2"]["admitted"] == len(t2 - t1)  # overlap dropped
    assert res["c2"]["index_total"] == len(t1 | t2)
    assert _content_set(wd) == t1 | t2
    # committed increments never rewritten: corpus is partitioned by id
    assert os.path.isdir(os.path.join(wd, "corpus", "increment=c1"))
    assert os.path.isdir(os.path.join(wd, "corpus", "increment=c2"))


def test_crawl_ingest_rerun_skips_everything(crawl_dirs, tmp_path):
    d1, d2 = crawl_dirs
    wd = str(tmp_path / "wd")
    incs = [("c1", _pages_factory(d1)), ("c2", _pages_factory(d2))]
    first = run_crawl_ingest(incs, wd, num_shards=4)
    before = _content_set(wd)

    def boom():
        raise AssertionError("skipped increment must not read its input")

    second = run_crawl_ingest([("c1", boom), ("c2", boom)], wd, num_shards=4)
    assert {r["status"] for r in second.values()} == {"skipped"}
    assert second["c2"]["admitted"] == first["c2"]["admitted"]
    assert _content_set(wd) == before


def test_crawl_ingest_crash_replay_restores_index(crawl_dirs, tmp_path):
    """Crash between corpus write / snapshot and marker: the marker is
    missing, so the increment replays from the previous snapshot and
    converges to the same content set and counts."""
    d1, d2 = crawl_dirs
    wd = str(tmp_path / "wd")
    incs = [("c1", _pages_factory(d1)), ("c2", _pages_factory(d2))]
    first = run_crawl_ingest(incs, wd, num_shards=4)
    want = _content_set(wd)

    # simulate: c2 crashed after its snapshot but before its marker
    os.remove(os.path.join(wd, "done", "c2.json"))
    replay = run_crawl_ingest(incs, wd, num_shards=4)
    assert replay["c1"]["status"] == "skipped"
    assert replay["c2"]["status"] == "ran"
    assert replay["c2"]["admitted"] == first["c2"]["admitted"]
    assert replay["c2"]["index_total"] == first["c2"]["index_total"]
    assert _content_set(wd) == want


def test_crawl_ingest_snapshot_every_replays_tail(crawl_dirs, tmp_path):
    """snapshot_every=3 over 3 increments → only the final snapshot
    exists; losing it (cluster restart before the last commit completed)
    invalidates ALL markers after the (nonexistent) anchor and replays
    from scratch to the identical corpus."""
    d1, d2 = crawl_dirs
    wd = str(tmp_path / "wd")
    half = _pages_factory(d1)
    incs = [("a", half), ("b", _pages_factory(d2)), ("c", half)]
    first = run_crawl_ingest(incs, wd, num_shards=4, snapshot_every=3)
    assert [first[i]["snapshot"] for i in ("a", "b", "c")] == [False, False, True]
    assert first["c"]["admitted"] == 0  # pure replay of a's content
    want = _content_set(wd)

    shutil.rmtree(os.path.join(wd, "index", "post_c"))
    os.remove(os.path.join(wd, "done", "c.json"))
    replay = run_crawl_ingest(incs, wd, num_shards=4, snapshot_every=3)
    # no committed snapshot anchor -> a and b invalidated too
    assert {r["status"] for r in replay.values()} == {"ran"}
    for iid in ("a", "b", "c"):
        assert replay[iid]["admitted"] == first[iid]["admitted"]
    assert _content_set(wd) == want
    # marker counts round-trip as json
    with open(os.path.join(wd, "done", "b.json")) as fh:
        assert json.load(fh)["admitted"] == first["b"]["admitted"]


def test_crawl_ingest_duplicate_ids_rejected(tmp_path):
    with pytest.raises(ValueError, match="unique"):
        run_crawl_ingest([("x", None), ("x", None)], str(tmp_path / "wd"))

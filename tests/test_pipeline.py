"""Distributed-execution tests: the Ray flagship pipeline must reproduce
the pure-oracle golden bytes exactly, at any parallelism, and across
kill-and-resume (SURVEY.md §5.1, §5.4)."""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _extract_hashes(pages_dir, out_dir, **kw) -> dict[str, str]:
    """Run the flagship job and return url → sha256(extracted_text)."""
    from occular_ocr_ray.pipelines.flagship import read_extracted, run_extraction

    run_extraction(pages_dir, out_dir, **kw)
    ds = read_extracted(out_dir, columns=["url", "extracted_text"])
    out = {}
    for batch in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
        for u, t in zip(batch["url"].to_pylist(), batch["extracted_text"].to_pylist()):
            out[u] = hashlib.sha256(t.encode("utf-8")).hexdigest()
    return out


def test_golden_byte_identity(pages_dir, golden, tmp_path):
    """The north_rule check: Ray-pipeline extracted text is byte-identical
    per url to the committed pure-oracle goldens."""
    hashes = _extract_hashes(pages_dir, str(tmp_path / "out"), num_waves=4, num_parts=8)
    gold = golden["rows"]
    # dup rows share a url; the table has 500 rows but fewer distinct urls
    assert set(hashes) == set(gold)
    mismatches = [u for u, h in hashes.items() if h != gold[u]["sha256"]]
    assert mismatches == []


def test_output_schema_and_metrics(pages_dir, golden, tmp_path):
    from occular_ocr_ray.pipelines.flagship import read_extracted, run_extraction

    s = run_extraction(pages_dir, str(tmp_path / "o"), num_waves=2, num_parts=4)
    assert s["totals"]["rows"] == 500
    ds = read_extracted(str(tmp_path / "o"))
    schema = ds.schema()
    for col in ["url", "extracted_text", "spans", "method",
                "n_blocks_kept", "n_blocks_dropped", "bytes_emitted"]:
        assert col in schema.names
    # per-url metrics match the oracle goldens
    got = {}
    for b in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
        for u, m, k, d in zip(
            b["url"].to_pylist(), b["method"].to_pylist(),
            b["n_blocks_kept"].to_pylist(), b["n_blocks_dropped"].to_pylist(),
        ):
            got[u] = (m, k, d)
    for u, (m, k, d) in got.items():
        g = golden["rows"][u]
        assert (m, k, d) == (g["method"], g["n_blocks_kept"], g["n_blocks_dropped"])


def test_audit_texts_roundtrip(golden):
    """The committed full-text goldens match their recorded hashes (keeps
    the two golden artifacts mutually consistent)."""
    tdir = os.path.join(os.path.dirname(__file__), "golden", "texts")
    by_urlhash = {
        hashlib.sha256(u.encode()).hexdigest()[:16]: g
        for u, g in golden["rows"].items()
    }
    n = 0
    for name in os.listdir(tdir):
        if not name.endswith(".txt"):
            continue
        with open(os.path.join(tdir, name)) as fh:
            text = fh.read()
        g = by_urlhash[name[:-4]]
        assert hashlib.sha256(text.encode()).hexdigest() == g["sha256"]
        n += 1
    assert n >= 8


def test_parallelism_invariance(pages_dir, tmp_path):
    """Identical bytes across batch sizes and task/actor strategies
    (in-session analog of the N-vs-4N cluster identity; the cross-process
    num_cpus=8/32 check runs in bench.py --scaling)."""
    a = _extract_hashes(pages_dir, str(tmp_path / "a"),
                        num_waves=1, batch_size=128, concurrency=None)
    b = _extract_hashes(pages_dir, str(tmp_path / "b"),
                        num_waves=4, batch_size=16, concurrency=2)
    assert a == b


def test_kill_and_resume(pages_dir, tmp_path, golden):
    """Crash after some waves → resume recomputes only missing waves and
    the final bytes are identical (SURVEY.md §4 checkpoint/resume)."""
    out = str(tmp_path / "resume")
    full = _extract_hashes(pages_dir, out, num_waves=4, num_parts=8)
    # simulate a crash: wave 2 manifest lost + partial data, wave 3 data
    # lost entirely
    os.remove(os.path.join(out, "manifest", "wave_2.json"))
    shutil.rmtree(os.path.join(out, "data", "wave=3"))
    os.remove(os.path.join(out, "manifest", "wave_3.json"))
    resumed = _extract_hashes(pages_dir, out, num_waves=4, num_parts=8)
    assert resumed == full
    # and still golden
    assert all(resumed[u] == g["sha256"] for u, g in golden["rows"].items())


def test_resume_skips_completed_waves(pages_dir, tmp_path):
    from occular_ocr_ray.pipelines.flagship import run_extraction

    out = str(tmp_path / "skip")
    s1 = run_extraction(pages_dir, out, num_waves=3)
    assert all(v["status"] == "ran" for v in s1["waves"].values())
    s2 = run_extraction(pages_dir, out, num_waves=3)
    assert all(v["status"] == "skipped" for v in s2["waves"].values())
    assert s1["totals"] == s2["totals"]


def test_manifest_contents(pages_dir, tmp_path):
    from occular_ocr_ray.pipelines.flagship import run_extraction

    out = str(tmp_path / "man")
    run_extraction(pages_dir, out, num_waves=2, num_parts=8)
    with open(os.path.join(out, "manifest", "wave_0.json")) as fh:
        man = json.load(fh)
    assert man["wave"] == 0 and len(man["files"]) == 4
    assert man["totals"]["rows"] > 0 and man["rollup_digest"]
    parts = {p["part"] for p in man["per_part"]}
    assert parts and parts <= set(range(8))
    assert sum(p["rows"] for p in man["per_part"]) == man["totals"]["rows"]


def test_giant_threshold_routing(pages_dir, tmp_path):
    """Skew mitigation: routing giant html rows to a batch_size=1 sibling
    stage changes scheduling only — output bytes and per-part rollups are
    identical, and the fixture mix (5% giant ≥2 MB rows) exercises both
    branches."""
    base = _extract_hashes(pages_dir, str(tmp_path / "g0"),
                           num_waves=1, num_parts=8)
    routed = _extract_hashes(pages_dir, str(tmp_path / "g1"),
                             num_waves=1, num_parts=8,
                             giant_threshold=1_000_000)
    assert routed == base
    m0 = json.load(open(os.path.join(str(tmp_path / "g0"), "manifest", "wave_0.json")))
    m1 = json.load(open(os.path.join(str(tmp_path / "g1"), "manifest", "wave_0.json")))
    assert m0["rollup_digest"] == m1["rollup_digest"]


def test_pre_bucketed_single_scan_routing(pages_dir, tmp_path):
    """Ingest-time size bucketing (one pass → small/ + giant/) feeds
    each extract branch its own file set: outputs and rollups identical
    to both the flat run and the in-flight giant_threshold routing —
    and every input file belongs to exactly one branch (the single-scan
    property)."""
    from occular_ocr_ray.pipelines.flagship import (
        _split_bucketed, list_bucketed_input_files, run_extraction,
    )
    from occular_ocr_ray.sources.ingest import bucket_pages_by_size

    bucket_dir = str(tmp_path / "bucketed")
    totals = bucket_pages_by_size(pages_dir, bucket_dir, 1_000_000)
    assert totals["small"] + totals["giant"] == 500
    assert totals["giant"] > 0  # fixture has 5% giant rows ≥ 2 MB

    files = list_bucketed_input_files(bucket_dir)
    small, giant = _split_bucketed(files)
    # partition: each file in exactly one branch, none dropped
    assert set(small).isdisjoint(giant)
    assert sorted(small + giant) == sorted(files) and giant

    base = _extract_hashes(pages_dir, str(tmp_path / "b0"),
                           num_waves=1, num_parts=8)
    routed = _extract_hashes(bucket_dir, str(tmp_path / "b1"),
                             num_waves=1, num_parts=8, pre_bucketed=True)
    assert routed == base
    m0 = json.load(open(os.path.join(str(tmp_path / "b0"), "manifest", "wave_0.json")))
    m1 = json.load(open(os.path.join(str(tmp_path / "b1"), "manifest", "wave_0.json")))
    assert m0["rollup_digest"] == m1["rollup_digest"]

    # conflicting modes must fail fast
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_extraction(bucket_dir, str(tmp_path / "b2"), pre_bucketed=True,
                       giant_threshold=1_000_000)


def test_force_parse_reextracts_native_rows(pages_dir, tmp_path):
    """force_parse (reference force_ocr analog): rows with both a text
    layer and an html payload take the parsed branch instead."""
    from occular_ocr_ray.pipelines.flagship import read_extracted, run_extraction

    out = str(tmp_path / "fp")
    run_extraction(pages_dir, out, num_waves=1, force_parse=True)
    methods = set()
    for b in read_extracted(out, columns=["method"]).iter_batches(batch_format="pyarrow"):
        methods.update(b["method"].to_pylist())
    assert "native" not in methods and "parsed" in methods


def test_wave_sink_retry_idempotent(tmp_path):
    """A retried write task (same task_idx) overwrites its own files and
    contributes exactly one write return — no duplicate rows, no double
    counting (the exactly-once property the manifest rollup relies on)."""
    from types import SimpleNamespace

    import pyarrow as pa
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines.flagship import _WaveSink

    sink = _WaveSink(str(tmp_path / "wave"))
    sink.on_write_start()
    block = pa.table({
        "url": ["https://a.example/1", "https://b.example/2"],
        "extracted_text": ["x", "y"],
        "n_blocks_kept": pa.array([3, 4], pa.int64()),
        "n_blocks_dropped": pa.array([1, 0], pa.int64()),
        "bytes_emitted": pa.array([10, 20], pa.int64()),
        "part": pa.array([0, 1], pa.int32()),
    })
    ctx = SimpleNamespace(task_idx=7)
    first = sink.write([block], ctx)
    second = sink.write([block], ctx)  # simulated retry of the same task
    assert first == second
    files = list((tmp_path / "wave").glob("*.parquet"))
    assert len(files) == 1  # retry overwrote, not duplicated
    assert pq.read_table(files[0]).num_rows == 2
    # exactly one return per successful task reaches the rollup
    sink.on_write_complete(SimpleNamespace(write_returns=[second]))
    assert sink.acc == {0: [3, 1, 10, 1], 1: [4, 0, 20, 1]}


def test_hive_partition_layout(pages_dir, tmp_path):
    """Opt-in hive layout: part=<k> directories, same totals and rollup
    digest as the flat layout (partitioning is layout-only)."""
    from occular_ocr_ray.pipelines.flagship import run_extraction

    flat = str(tmp_path / "flat")
    hive = str(tmp_path / "hive")
    s1 = run_extraction(pages_dir, flat, num_waves=1, num_parts=4)
    s2 = run_extraction(pages_dir, hive, num_waves=1, num_parts=4,
                        hive_partition=True)
    assert s1["totals"] == s2["totals"]
    part_dirs = sorted(p.name for p in (tmp_path / "hive" / "data" / "wave=0").iterdir())
    assert part_dirs and all(p.startswith("part=") for p in part_dirs)
    m1 = json.load(open(os.path.join(flat, "manifest", "wave_0.json")))
    m2 = json.load(open(os.path.join(hive, "manifest", "wave_0.json")))
    assert m1["rollup_digest"] == m2["rollup_digest"]
    import duckdb

    n_flat = duckdb.sql(f"select count(*) from read_parquet('{flat}/data/*/*.parquet')").fetchone()[0]
    n_hive = duckdb.sql(f"select count(*) from read_parquet('{hive}/data/*/*/*.parquet')").fetchone()[0]
    assert n_flat == n_hive == s1["totals"]["rows"]


def test_giant_threshold_with_actor_pool(pages_dir, tmp_path):
    """Actor-pool small branch + stateless giant branch coexist (the
    giant branch must not double the pool's CPU reservation): outputs
    identical to the plain actor-pool run."""
    a = _extract_hashes(pages_dir, str(tmp_path / "ap"), num_waves=1,
                        batch_size=16, concurrency=2)
    b = _extract_hashes(pages_dir, str(tmp_path / "ag"), num_waves=1,
                        batch_size=16, concurrency=2,
                        giant_threshold=1_000_000)
    assert a == b


def test_resume_rejects_changed_params(pages_dir, tmp_path):
    """A completed wave may only be skipped under the SAME
    output-affecting parameters: resuming with a different num_parts /
    extractor would silently mix output generations across waves."""
    from occular_ocr_ray.pipelines.flagship import run_extraction

    out = str(tmp_path / "o")
    run_extraction(pages_dir, out, num_waves=2, num_parts=8)
    # identical params → clean resume (all waves skipped)
    s = run_extraction(pages_dir, out, num_waves=2, num_parts=8)
    assert all(w["status"] == "skipped" for w in s["waves"].values())
    for kwargs in (
        {"num_parts": 16},
        {"num_parts": 8, "extractor": "lenient"},
        {"num_parts": 8, "force_parse": True},
        {"num_parts": 8, "extractor_kwargs": {"keep_thresh": 0.3}},
    ):
        with pytest.raises(ValueError, match="mix output generations"):
            run_extraction(pages_dir, out, num_waves=2, **kwargs)
    # --no-resume recomputes under the new params instead of raising
    s2 = run_extraction(pages_dir, out, num_waves=2, num_parts=16, resume=False)
    assert all(w["status"] == "ran" for w in s2["waves"].values())


def test_wave_output_compaction(pages_dir, tmp_path):
    """Output compaction (the 100-TB small-file fix): bundling write
    calls (min_rows_per_write) + per-task byte coalescing
    (target_file_bytes) bounds the file count, with identical extracted
    bytes and identical per-part manifests."""
    a = _extract_hashes(pages_dir, str(tmp_path / "flat"), num_waves=1,
                        batch_size=4, target_file_bytes=None)
    b = _extract_hashes(pages_dir, str(tmp_path / "compact"), num_waves=1,
                        batch_size=4, target_file_bytes=1 << 30,
                        min_rows_per_write=100)
    assert a == b
    import pathlib

    flat = list(pathlib.Path(tmp_path / "flat" / "data").rglob("*.parquet"))
    comp = list(pathlib.Path(tmp_path / "compact" / "data").rglob("*.parquet"))
    # 500 rows at ≥100 rows per write call and one (huge-target) file
    # per call → at most ~5 files + stragglers; flat wrote one per task
    assert len(comp) < len(flat)
    assert len(comp) <= 8
    # identical per-part rollups (manifest digest is layout-independent)
    def digest(d):
        with open(os.path.join(d, "manifest", "wave_0.json")) as fh:
            return json.load(fh)["rollup_digest"]
    assert digest(tmp_path / "flat") == digest(tmp_path / "compact")
    # resume still skips cleanly under the compacted layout
    from occular_ocr_ray.pipelines.flagship import run_extraction
    s = run_extraction(pages_dir, str(tmp_path / "compact"), num_waves=1,
                       batch_size=4, target_file_bytes=1 << 30,
                       min_rows_per_write=100)
    assert all(w["status"] == "skipped" for w in s["waves"].values())


def test_resume_legacy_manifest_recomputes(pages_dir, tmp_path):
    """A pre-params-guard manifest (no 'params' key) can't prove its
    parameter identity — resume RECOMPUTES that wave instead of
    refusing the whole run (regression: all pre-round-3 output dirs
    errored on in-place resume even with matching params)."""
    from occular_ocr_ray.pipelines.flagship import run_extraction

    out = str(tmp_path / "legacy")
    s1 = run_extraction(pages_dir, out, num_waves=2, num_parts=8)
    man_path = os.path.join(out, "manifest", "wave_1.json")
    with open(man_path) as fh:
        man = json.load(fh)
    del man["params"]
    with open(man_path, "w") as fh:
        json.dump(man, fh)
    s2 = run_extraction(pages_dir, out, num_waves=2, num_parts=8)
    assert s2["waves"][0]["status"] == "skipped"
    assert s2["waves"][1]["status"] == "ran"
    assert s1["totals"] == s2["totals"]
    # the recomputed manifest is upgraded: a third run skips everything
    s3 = run_extraction(pages_dir, out, num_waves=2, num_parts=8)
    assert all(w["status"] == "skipped" for w in s3["waves"].values())

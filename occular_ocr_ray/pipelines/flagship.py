"""Flagship pipeline: Common-Crawl-style ``pages`` parquet →
``extracted`` parquet, streaming, hash-partitioned, resumable.

Graft lifecycle per SURVEY.md §3: ``read_parquet(pages)`` (pruned to the
3 columns extraction needs) → *(resume: drop completed waves)* →
``map_batches(DensityExtractor, batch_format="pyarrow",
concurrency=..., batch_size=...)`` → add ``part = crc32(host(url)) % P``
while pushing per-part metric partials to a MetricsCollector actor →
``write_parquet(out/data/wave=<k>/)`` → manifest from the collector
(no second scan of the output).

Checkpoint/resume design (SURVEY.md §4, "north_rule: per-partition
lineage + metrics"; Ray Data has no built-in resume):

- The unit of resume is a **wave** = a deterministic subset of input
  parquet files (round-robin by sorted file index).  Each input file is
  read exactly once across the whole job — no per-partition re-reads.
- A wave's output dir is overwritten idempotently; its manifest JSON
  (wave id, input files, row count, per-part metrics, rollup digest) is
  written ONLY after the wave's parquet is durable, via tmp+rename.
- On restart, completed waves are skipped by manifest presence; a
  crashed wave's partial output is deleted and recomputed, so re-runs
  are byte-identical (the extract kernel is pure per row).

Skew note (SURVEY.md §4): giant documents are NOT chunk-split —
splitting HTML mid-document would change the parse and break
byte-identity.  Instead skew is bounded by (a) a modest ``batch_size``
so one giant cannot hold dozens of rows hostage, and (b) Ray Data's
dynamic block splitting on output.  The per-row cost is linear in
payload size, so an actor processing a giant is dense useful compute,
not padding waste (the failure mode the reference's width-bucketing
fought, ``recognizer_onnx.py:62-86``).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import zlib

import pyarrow as pa
import ray.data as rd

from ..state.registry import get_extractor
from ..stages import extractor as _extractor_mod  # noqa: F401  (registers "density")

DEFAULT_NUM_PARTS = 64


def url_host_part(url: str, num_parts: int = DEFAULT_NUM_PARTS) -> int:
    """Hash-partition key: crc32 of the url host, mod P.  crc32 (not
    ``hash()``) so the key is stable across processes/runs — required
    for resume and for cross-run output layout stability."""
    try:
        host = url.split("/", 3)[2]
    except IndexError:
        host = url
    return zlib.crc32(host.encode("utf-8")) % num_parts


def _add_part(num_parts: int, collector=None):
    """Append the hash-partition column; optionally push per-part metric
    partials to a MetricsCollector actor (see _run_wave)."""

    def add_part(batch: pa.Table) -> pa.Table:
        import ray

        urls = batch["url"].to_pylist()
        parts = [url_host_part(u, num_parts) for u in urls]
        batch = batch.append_column("part", pa.array(parts, type=pa.int32()))
        if collector is not None:
            kept = batch["n_blocks_kept"].to_pylist()
            dropped = batch["n_blocks_dropped"].to_pylist()
            emitted = batch["bytes_emitted"].to_pylist()
            partial: dict[int, list[int]] = {}
            for p, k, d, e in zip(parts, kept, dropped, emitted):
                acc = partial.setdefault(p, [0, 0, 0, 0])
                acc[0] += k
                acc[1] += d
                acc[2] += e
                acc[3] += 1
            # content-derived batch id: a retried task re-sends the same
            # id and the collector drops the duplicate (no double count)
            batch_id = hashlib.md5("\n".join(sorted(urls)).encode()).hexdigest()
            ray.get(collector.add.remote(batch_id, partial))
        return batch

    return add_part


class MetricsCollector:
    """Tiny zero-CPU actor accumulating per-partition extraction metrics
    during the write pass — replaces a post-hoc read-back rollup
    (measured ~5 s of fixed all-to-all overhead per wave; at 10^12-doc
    scale the read-back would re-scan per-row metric columns, while this
    actor sees only one small dict per batch).  This is the one place
    the engine uses a raw Ray actor: shared mutable state the Dataset
    API cannot express (SURVEY.md build rules).  Shard by part-range if
    a single inbox ever bottlenecks (>~10k batches/s)."""

    def __init__(self) -> None:
        self.acc: dict[int, list[int]] = {}
        self.seen: set[str] = set()

    def add(self, batch_id: str, partial: dict[int, list[int]]) -> None:
        if batch_id in self.seen:
            return
        self.seen.add(batch_id)
        for p, (k, d, e, n) in partial.items():
            acc = self.acc.setdefault(p, [0, 0, 0, 0])
            acc[0] += k
            acc[1] += d
            acc[2] += e
            acc[3] += n

    def get(self) -> dict[int, list[int]]:
        return self.acc


def extract_dataset(
    ds: rd.Dataset,
    *,
    extractor: str = "density",
    concurrency=None,
    batch_size: int = 32,
    num_parts: int | None = None,
) -> rd.Dataset:
    """The core transform: pages Dataset → extracted Dataset.

    ``concurrency=None`` → stateless tasks (elastic, good default on a
    shared cluster); an int or (min, max) → actor pool of that size
    (the stateful-stage shape; required once extractors hold heavy
    state).  ``num_cpus`` stays 1: the kernel is pure Python, no
    intra-op threading to oversubscribe (cf. the reference's ORT
    ``intra_op_num_threads`` pitfall, ``dbnet_detector_onnx.py:31``).
    """
    cls = get_extractor(extractor)
    if concurrency is None:
        out = ds.map_batches(
            cls(), batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        )
    else:
        out = ds.map_batches(
            cls,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    if num_parts:
        out = out.map_batches(_add_part(num_parts), batch_format="pyarrow")
    return out


def _patch_fsspec_http_race() -> None:
    """Make concurrent Dataset construction thread-safe in this env.

    Ray's path resolution calls ``_is_http_filesystem`` per dataset,
    which re-attempts ``from fsspec.implementations.http import
    HTTPFileSystem`` on every call when aiohttp is absent; two threads
    hitting that failing import concurrently race into a partially
    initialized module and crash with a spurious ImportError.  When the
    HTTP backend is unimportable no filesystem can BE an HTTPFileSystem,
    so a constant-False is exactly equivalent — and drops the repeated
    failed import from the hot path."""
    from ray.data.datasource import path_util

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return  # backend importable → cached in sys.modules, no race
    except ImportError:
        pass
    if getattr(path_util._is_http_filesystem, "_race_safe", False):
        return

    def _no_http_fs(fs) -> bool:
        return False

    _no_http_fs._race_safe = True
    path_util._is_http_filesystem = _no_http_fs


def _wave_of(file_index: int, num_waves: int) -> int:
    return file_index % num_waves


def list_input_files(input_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(input_dir, "*.parquet")))


def run_extraction(
    input_dir: str,
    output_dir: str,
    *,
    num_waves: int = 4,
    resume: bool = True,
    extractor: str = "density",
    concurrency=None,
    batch_size: int = 32,
    num_parts: int = 16,
    hive_partition: bool = False,
    wave_concurrency: int = 2,
) -> dict:
    """Run (or resume) the flagship job.  Returns a summary dict with
    per-wave status and global totals.

    ``wave_concurrency`` > 1 overlaps wave pipelines (a small thread
    window): wave k+1 ramps up while wave k drains its write tail, so
    the cluster never idles between waves (~5 s/wave of ramp+finalize
    otherwise, at every cluster size).  Correctness is unaffected —
    waves touch disjoint inputs/outputs and each manifest still commits
    only after its own wave's parquet is durable."""
    from concurrent.futures import ThreadPoolExecutor

    _patch_fsspec_http_race()
    num_waves = max(1, num_waves)
    if concurrency is not None:
        # Actor-pool waves must not overlap: two independent executions
        # cannot coordinate CPU reservations, so pool actors from wave
        # k+1 can starve wave k's read/write tasks outright (observed
        # deadlock at pool_size x window == num_cpus).  Stateless-task
        # waves are elastic and overlap safely.
        wave_concurrency = 1
    files = list_input_files(input_dir)
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    manifest_dir = os.path.join(output_dir, "manifest")
    data_dir = os.path.join(output_dir, "data")
    os.makedirs(manifest_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)

    waves: dict[int, list[str]] = {}
    for idx, f in enumerate(files):
        waves.setdefault(_wave_of(idx, num_waves), []).append(f)

    summary = {"waves": {}, "totals": {"rows": 0, "bytes_emitted": 0, "blocks_kept": 0}}
    to_run: list[int] = []
    for k in sorted(waves):
        man_path = os.path.join(manifest_dir, f"wave_{k}.json")
        if resume and os.path.exists(man_path):
            with open(man_path) as fh:
                man = json.load(fh)
            summary["waves"][k] = {"status": "skipped", **man["totals"]}
        else:
            to_run.append(k)

    if to_run:
        with ThreadPoolExecutor(max_workers=max(1, wave_concurrency)) as ex:
            futs = {
                k: ex.submit(
                    _run_wave, k, waves[k], data_dir,
                    os.path.join(manifest_dir, f"wave_{k}.json"),
                    extractor=extractor, concurrency=concurrency,
                    batch_size=batch_size, num_parts=num_parts,
                    hive_partition=hive_partition,
                )
                for k in to_run
            }
            for k, fut in futs.items():
                summary["waves"][k] = {"status": "ran", **fut.result()["totals"]}

    for k in sorted(waves):
        w = summary["waves"][k]
        summary["totals"]["rows"] += w["rows"]
        summary["totals"]["bytes_emitted"] += w["bytes_emitted"]
        summary["totals"]["blocks_kept"] += w["blocks_kept"]
    return summary


def _run_wave(
    k: int,
    files: list[str],
    data_dir: str,
    man_path: str,
    *,
    extractor: str,
    concurrency,
    batch_size: int,
    num_parts: int,
    hive_partition: bool = False,
) -> dict:
    import ray

    wave_dir = os.path.join(data_dir, f"wave={k}")
    if os.path.exists(wave_dir):  # partial output from a crashed run
        shutil.rmtree(wave_dir)

    collector = ray.remote(num_cpus=0)(MetricsCollector).remote()
    # Prune at the read: extraction needs only these three columns.
    ds = rd.read_parquet(files, columns=["url", "html", "text"])
    out = extract_dataset(
        ds, extractor=extractor, concurrency=concurrency,
        batch_size=batch_size,
    ).map_batches(_add_part(num_parts, collector), batch_format="pyarrow")
    # Default layout: wave dir + `part` as a plain column (readable via
    # parquet row-group stats).  hive_partition=True adds out/part=<k>/
    # dirs — at high num_parts x many tasks this explodes small-file
    # counts (measured 17x more files for +3% wall), so it is opt-in.
    # NOTE: no min_rows_per_file — merging output blocks into few files
    # funnels the write through a handful of tasks (measured 2.7x slower
    # end-to-end at 32 cpus); one file per output block keeps the write
    # embarrassingly parallel.  Control file size via batch_size instead.
    if hive_partition:
        out.write_parquet(wave_dir, partition_cols=["part"])
    else:
        out.write_parquet(wave_dir)

    # Metrics rollup straight from the collector actor — accumulated
    # map-side during the write pass, no second scan of the output.
    acc = ray.get(collector.get.remote())
    ray.kill(collector)
    per_part = [
        {
            "part": int(p),
            "blocks_kept": v[0],
            "blocks_dropped": v[1],
            "bytes_emitted": v[2],
            "rows": v[3],
        }
        for p, v in sorted(acc.items())
    ]
    totals = {
        "rows": sum(v[3] for v in acc.values()),
        "blocks_kept": sum(v[0] for v in acc.values()),
        "blocks_dropped": sum(v[1] for v in acc.values()),
        "bytes_emitted": sum(v[2] for v in acc.values()),
    }
    digest = hashlib.md5(
        json.dumps(per_part, sort_keys=True).encode()
    ).hexdigest()
    man = {
        "wave": k,
        "files": files,
        "num_parts": num_parts,
        "per_part": per_part,
        "totals": totals,
        "rollup_digest": digest,
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(man, fh, indent=1)
    os.replace(tmp, man_path)  # manifest durable only after output is
    return man


def read_extracted(output_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(output_dir, "data"), columns=columns)

"""Flagship pipeline: Common-Crawl-style ``pages`` parquet →
``extracted`` parquet, streaming, hash-partitioned, resumable.

Graft lifecycle per SURVEY.md §3: ``read_parquet(pages)`` (pruned to the
3 columns extraction needs) → *(resume: drop completed waves)* →
``map_batches(DensityExtractor, batch_format="pyarrow",
concurrency=..., batch_size=...)`` — which assembles the output rows AND
the ``part = crc32(host(url)) % P`` column in one Arrow pass →
``write_datasink(_WaveSink)`` → manifest from the sink's write returns
(no second scan of the output, no metrics actor).

Metrics design: each write task returns its per-partition metric partial
as the task's write result; Ray Data collects write returns on the
driver with exactly-once semantics (a retried write task's return
replaces, never duplicates).  This replaces the round-1 MetricsCollector
actor — which cost one blocking actor RPC per extract batch on the hot
path and had to dedup retries by content hash (wrongly dropping distinct
batches with identical url multisets).

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

Skew note (SURVEY.md §4): giant documents are never chunk-split —
splitting HTML mid-document would change the parse and break
byte-identity.  Two mitigations instead: (a) a modest ``batch_size`` so
one giant cannot hold dozens of rows hostage, and (b) opt-in
``giant_threshold`` routing — rows whose html payload exceeds the
threshold take a sibling ``batch_size=1`` stage (same pure kernel, so
outputs and per-part rollups are unchanged), which caps the straggler
tail at one document per task.  The in-flight routing reads the
(pruned) input once per branch; at petabyte scale use the implemented
single-scan alternative instead — ``ingest.bucket_pages_by_size`` at
ingest + ``run_extraction(pre_bucketed=True)`` (CLI
``--bucket-by-size``), which gives each branch its own file set so
every input byte is read exactly once.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Datasink

from ..stages.extractor import url_host_part  # noqa: F401  (re-export; part key)
from ..state.registry import get_extractor
from ..stages import extractor as _extractor_mod  # noqa: F401  (registers "density")

_METRIC_COLS = ("n_blocks_kept", "n_blocks_dropped", "bytes_emitted")


def extract_dataset(
    ds: rd.Dataset,
    *,
    extractor: str = "density",
    concurrency=None,
    batch_size: int = 32,
    num_parts: int | None = None,
    force_parse: bool = False,
    giant_threshold: int | None = None,
    extractor_kwargs: dict | None = None,
) -> rd.Dataset:
    """The core transform: pages Dataset → extracted Dataset.

    ``concurrency=None`` → stateless tasks (elastic, good default on a
    shared cluster); an int or (min, max) → actor pool of that size
    (the stateful-stage shape; required once extractors hold heavy
    state).  ``num_cpus`` stays 1: the kernel is pure Python, no
    intra-op threading to oversubscribe (cf. the reference's ORT
    ``intra_op_num_threads`` pitfall, ``dbnet_detector_onnx.py:31``).

    ``giant_threshold`` (bytes): route rows with larger html payloads to
    a ``batch_size=1`` sibling stage running the SAME kernel — identical
    outputs, bounded straggler tail.  The giant branch always runs as
    stateless tasks (giants are rare; a second actor pool would double
    CPU reservations).
    """
    cls = get_extractor(extractor)
    kwargs = dict(extractor_kwargs or {})
    kwargs["num_parts"] = num_parts
    kwargs["force_parse"] = force_parse

    def _stage(src: rd.Dataset, bs: int, conc):
        if conc is None:
            return src.map_batches(
                cls(**kwargs), batch_format="pyarrow", batch_size=bs,
                zero_copy_batch=True,
            )
        return src.map_batches(
            cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
            batch_size=bs, concurrency=conc, num_cpus=1,
        )

    if giant_threshold is None:
        return _stage(ds, batch_size, concurrency)

    def _size_filter(want_giant: bool):
        def f(b: pa.Table) -> pa.Table:
            ln = pc.fill_null(pc.binary_length(b["html"]), 0)
            mask = (
                pc.greater(ln, giant_threshold)
                if want_giant
                else pc.less_equal(ln, giant_threshold)
            )
            return b.filter(mask)

        return f

    small = ds.map_batches(_size_filter(False), batch_format="pyarrow")
    giant = ds.map_batches(_size_filter(True), batch_format="pyarrow")
    return _stage(small, batch_size, concurrency).union(_stage(giant, 1, None))


class _WaveSink(Datasink):
    """Per-wave parquet sink + exactly-once metrics rollup.

    ``write`` runs in each write task: output files are named by
    ``(task_idx, within-task ordinal)`` — deterministic, so a retried
    task overwrites its own files instead of duplicating rows — and
    returns the task's per-partition metric partial {part: [kept,
    dropped, bytes, rows]}.  ``on_write_complete`` (driver) merges the
    partials; Ray Data delivers exactly one return per successful task,
    so the rollup needs no retry dedup.  This is the flagship's only
    metrics path — accumulated during the write pass, never a second
    scan.

    ``target_file_bytes``: coalesce a task's blocks into files of
    roughly this many (in-memory Arrow) bytes instead of one file per
    block.  At 100-TB scale a wave has thousands of write tasks × many
    blocks; per-block files are small-file sprawl for every downstream
    reader (VERDICT r3 missing #3).  ``None`` keeps one file per block
    (the round-3 layout).  Coalescing is per-task — no extra exchange,
    same deterministic names, byte content unchanged.

    ``min_rows_per_write``: forwarded to Ray Data's Datasink bundling —
    the executor then feeds each write call at least this many rows by
    bundling UPSTREAM blocks together, the cross-task half of the
    small-file fix (per-task byte coalescing alone cannot merge output
    that arrives as one small block per task).  Costs a buffering
    boundary before the write, so it is opt-in."""

    def __init__(self, wave_dir: str, hive_partition: bool = False,
                 target_file_bytes: int | None = None,
                 min_rows_per_write: int | None = None) -> None:
        self._dir = wave_dir
        self._hive = hive_partition
        self._target = target_file_bytes
        self._min_rows = min_rows_per_write
        self.acc: dict[int, list[int]] = {}

    @property
    def min_rows_per_write(self) -> int | None:
        return self._min_rows

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    def on_write_start(self) -> None:
        os.makedirs(self._dir, exist_ok=True)

    def _write_table(self, tbl: pa.Table, fname: str) -> None:
        import pyarrow.parquet as pq

        if not self._hive:
            pq.write_table(tbl, os.path.join(self._dir, fname))
            return
        # hive layout: out/part=<k>/ dirs (opt-in: 17x more files for +3%
        # wall measured at 32 cpus — see round-1 BASELINE notes)
        parts = tbl["part"].to_numpy(zero_copy_only=False)
        for p in np.unique(parts):
            sub = tbl.filter(pc.equal(tbl["part"], int(p)))
            d = os.path.join(self._dir, f"part={int(p)}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(sub, os.path.join(d, fname))

    def write(self, blocks, ctx) -> dict[int, list[int]]:
        from ray.data.block import BlockAccessor

        partial: dict[int, list[int]] = {}
        buf: list[pa.Table] = []
        buf_bytes = 0
        seq = 0

        def flush() -> None:
            nonlocal buf, buf_bytes, seq
            if not buf:
                return
            tbl = (pa.concat_tables(buf).combine_chunks()
                   if len(buf) > 1 else buf[0])
            self._write_table(tbl, f"part-{ctx.task_idx:06d}-{seq:04d}.parquet")
            seq += 1
            buf, buf_bytes = [], 0

        for block in blocks:
            tbl = BlockAccessor.for_block(block).to_arrow()
            if tbl.num_rows == 0:
                continue
            buf.append(tbl)
            buf_bytes += tbl.nbytes
            if self._target is None or buf_bytes >= self._target:
                flush()
            parts = tbl["part"].to_numpy(zero_copy_only=False)
            kept, dropped, emitted = (
                tbl[c].to_numpy(zero_copy_only=False) for c in _METRIC_COLS
            )
            for p in np.unique(parts):
                m = parts == p
                acc = partial.setdefault(int(p), [0, 0, 0, 0])
                acc[0] += int(kept[m].sum())
                acc[1] += int(dropped[m].sum())
                acc[2] += int(emitted[m].sum())
                acc[3] += int(m.sum())
        flush()
        return partial

    def on_write_complete(self, write_result) -> None:
        for partial in write_result.write_returns:
            for p, (k, d, e, n) in partial.items():
                acc = self.acc.setdefault(int(p), [0, 0, 0, 0])
                acc[0] += k
                acc[1] += d
                acc[2] += e
                acc[3] += n


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


def list_bucketed_input_files(input_dir: str) -> list[str]:
    """File list for a size-bucketed input layout
    (``sources.ingest.bucket_pages_by_size`` output: ``small/`` +
    ``giant/`` parquet sets).  Small files first, then giant — both
    sorted, so wave assignment is deterministic."""
    small = sorted(glob.glob(os.path.join(input_dir, "small", "*.parquet")))
    giant = sorted(glob.glob(os.path.join(input_dir, "giant", "*.parquet")))
    return small + giant


def _split_bucketed(files: list[str]) -> tuple[list[str], list[str]]:
    """Partition a pre-bucketed wave's file list by branch — every file
    lands in exactly ONE branch (dir name is the router), which is the
    single-scan guarantee the in-flight filter routing lacks."""
    giant = [f for f in files if os.path.basename(os.path.dirname(f)) == "giant"]
    small = [f for f in files if os.path.basename(os.path.dirname(f)) != "giant"]
    return small, giant


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
    force_parse: bool = False,
    giant_threshold: int | None = None,
    extractor_kwargs: dict | None = None,
    pre_bucketed: bool = False,
    target_file_bytes: int | None = 128 * 1024 * 1024,
    min_rows_per_write: int | None = None,
) -> dict:
    """Run (or resume) the flagship job.  Returns a summary dict with
    per-wave status and global totals.

    ``target_file_bytes`` / ``min_rows_per_write``: output-file
    compaction knobs (default: coalesce each write task's blocks into
    ~128 MiB files; ``min_rows_per_write`` additionally bundles
    upstream blocks into fewer, bigger write calls — see ``_WaveSink``).
    Layout-only: rows, metrics, and manifests are identical either way,
    so neither is part of the resume params identity.

    ``pre_bucketed=True``: ``input_dir`` is a size-bucketed layout
    (``sources.ingest.bucket_pages_by_size``: ``small/`` + ``giant/``)
    — the giant branch gets its own file set (``batch_size=1`` stage)
    and each input file is read by exactly one branch, vs the in-flight
    ``giant_threshold`` filter routing which scans the pruned input
    once per branch.  The two modes are mutually exclusive.

    ``wave_concurrency`` > 1 overlaps wave pipelines (a small thread
    window): wave k+1 ramps up while wave k drains its write tail, so
    the cluster never idles between waves (~5 s/wave of ramp+finalize
    otherwise, at every cluster size).  Correctness is unaffected —
    waves touch disjoint inputs/outputs and each manifest still commits
    only after its own wave's parquet is durable."""
    from concurrent.futures import ThreadPoolExecutor

    _patch_fsspec_http_race()
    num_waves = max(1, num_waves)
    if pre_bucketed and giant_threshold is not None:
        raise ValueError(
            "pre_bucketed and giant_threshold are mutually exclusive: "
            "a bucketed input is already size-routed at ingest"
        )
    if concurrency is not None:
        # Actor-pool waves must not overlap: two independent executions
        # cannot coordinate CPU reservations, so pool actors from wave
        # k+1 can starve wave k's read/write tasks outright (observed
        # deadlock at pool_size x window == num_cpus).  Stateless-task
        # waves are elastic and overlap safely.
        wave_concurrency = 1
    files = (
        list_bucketed_input_files(input_dir) if pre_bucketed
        else list_input_files(input_dir)
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    manifest_dir = os.path.join(output_dir, "manifest")
    data_dir = os.path.join(output_dir, "data")
    os.makedirs(manifest_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)

    waves: dict[int, list[str]] = {}
    for idx, f in enumerate(files):
        waves.setdefault(_wave_of(idx, num_waves), []).append(f)

    # output-affecting parameter identity: a completed wave may only be
    # skipped if it was produced under the SAME extraction semantics and
    # layout — resuming with e.g. a different --num-parts or extractor
    # would silently mix output generations across waves (the same
    # hazard class the corpus checkpoints' params-keyed markers close).
    # json round-trip normalizes kwargs values to their manifest form.
    out_params = json.loads(json.dumps({
        "extractor": extractor,
        "num_parts": num_parts,
        "force_parse": force_parse,
        "hive_partition": hive_partition,
        "extractor_kwargs": extractor_kwargs or {},
    }))

    summary = {"waves": {}, "totals": {"rows": 0, "bytes_emitted": 0, "blocks_kept": 0}}
    to_run: list[int] = []
    for k in sorted(waves):
        man_path = os.path.join(manifest_dir, f"wave_{k}.json")
        if resume and os.path.exists(man_path):
            with open(man_path) as fh:
                man = json.load(fh)
            if "params" not in man:
                # legacy (pre-params-guard) manifest: parameter identity
                # is unverifiable — recompute the wave (correct under any
                # params) rather than refusing the whole resume
                import sys

                print(f"warning: wave {k} manifest predates the params "
                      f"guard; recomputing that wave", file=sys.stderr)
                to_run.append(k)
                continue
            if man["params"] != out_params or man.get("files") != waves[k]:
                raise ValueError(
                    f"wave {k} manifest was produced under different "
                    f"parameters or inputs than this run "
                    f"(manifest: params={man.get('params')}, "
                    f"{len(man.get('files', []))} files; "
                    f"now: params={out_params}, {len(waves[k])} files) — "
                    f"resuming would mix output generations; use a fresh "
                    f"--output dir or --no-resume to recompute"
                )
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
                    hive_partition=hive_partition, force_parse=force_parse,
                    giant_threshold=giant_threshold,
                    extractor_kwargs=extractor_kwargs,
                    pre_bucketed=pre_bucketed,
                    out_params=out_params,
                    target_file_bytes=target_file_bytes,
                    min_rows_per_write=min_rows_per_write,
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
    force_parse: bool = False,
    giant_threshold: int | None = None,
    extractor_kwargs: dict | None = None,
    pre_bucketed: bool = False,
    out_params: dict | None = None,
    target_file_bytes: int | None = None,
    min_rows_per_write: int | None = None,
) -> dict:
    wave_dir = os.path.join(data_dir, f"wave={k}")
    if os.path.exists(wave_dir):  # partial output from a crashed run
        shutil.rmtree(wave_dir)

    kw = dict(extractor=extractor, num_parts=num_parts,
              force_parse=force_parse, extractor_kwargs=extractor_kwargs)
    # Prune at the read: extraction needs only these three columns.
    cols = ["url", "html", "text"]
    if pre_bucketed:
        # each file feeds exactly ONE branch (single-scan giant routing)
        small_files, giant_files = _split_bucketed(files)
        branches = []
        if small_files:
            branches.append(extract_dataset(
                rd.read_parquet(small_files, columns=cols),
                concurrency=concurrency, batch_size=batch_size, **kw,
            ))
        if giant_files:
            branches.append(extract_dataset(
                rd.read_parquet(giant_files, columns=cols),
                concurrency=None, batch_size=1, **kw,
            ))
        out = branches[0] if len(branches) == 1 else branches[0].union(branches[1])
    else:
        ds = rd.read_parquet(files, columns=cols)
        out = extract_dataset(
            ds, concurrency=concurrency, batch_size=batch_size,
            giant_threshold=giant_threshold, **kw,
        )
    sink = _WaveSink(wave_dir, hive_partition,
                     target_file_bytes=target_file_bytes,
                     min_rows_per_write=min_rows_per_write)
    out.write_datasink(sink)

    acc = sink.acc
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
        "params": out_params,
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

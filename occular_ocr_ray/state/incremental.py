"""Incremental (cross-run) exact dedup against a shared fingerprint
index — the ONE place the engine drops below the Dataset API to raw Ray
actors, per the build rule "raw tasks/actors only where the Dataset API
genuinely can't express the semantics (e.g. a shared mutable index)".

Use case: streaming ingest.  Shards of a web crawl arrive over
hours/days; each new shard must drop documents whose content was already
admitted by ANY earlier shard.  A ``groupby`` dedup only sees one
dataset at a time — cross-run state needs an index that outlives the
pipelines that query it.

Design:
- The index is N zero-CPU ``_FingerprintShard`` actors, sharded by the
  first 8 bytes of the digest mod N (uniform at any N — a single-byte
  shard key would cap useful shards at 256 and skew the remainder) —
  memory and request load scale out with N, and each admission decision
  is a single-owner operation (no distributed locking).  Per shard the
  state is ``dict[16-byte digest -> admitting batch key]``; at Python
  object overhead (~60-100 B per entry all-in) 1 B fingerprints is
  roughly 60-100 GB — size N so each shard holds a few GB, or pass
  ``store="spill"`` for the off-heap store behind the same actor
  interface: a bounded hot dict + bloom-indexed sorted parquet runs
  (~2 resident bytes/fingerprint; lookups are bloom-negative for new
  content and one pruned row-group read when a duplicate hits) — the
  >1 B-digests regime.
- ``dedup`` batches run inside ``map_batches``: each batch computes
  md5 map-side, groups digests per shard, and makes ONE call per shard
  per batch (not per row).  Admission is first-writer-wins and
  RETRY-IDEMPOTENT: each admission records the admitting batch's
  key — the blake2b of a per-``dedup()``-call nonce plus the WHOLE
  batch's ordered fingerprint list, computed once and sent to every
  shard.  A Ray task retry re-runs the same serialized closure (same
  nonce) over the same batch → identical key → its original True
  answers come back instead of losing the batch's unique rows.  The
  nonce scopes that privilege to ONE ``dedup()`` call: a later call
  replaying identical content (e.g. a re-crawled increment) is NOT a
  retry and deduplicates normally — without the nonce, a full-batch
  content replay is indistinguishable from a retry and silently
  re-admits.  (Within one call, two *distinct* batches share a key
  only if their full fingerprint sequences are identical, so dedup
  quality degrades by at most that one batch, never data loss.)
- ``dedup`` returns a MATERIALIZED Dataset: the filter is a
  side-effecting read-modify-write of the index, so a lazy result would
  re-execute on every consumption and return zero rows the second time.
  The materialized output is one arriving shard's new rows — bounded,
  never the historical corpus.
- Semantics: each distinct fingerprint is admitted exactly once across
  every dataset passed through the same index.  WHICH duplicate row
  survives follows arrival order, so it is deliberately NOT part of the
  deterministic query surface — for deterministic single-corpus dedup
  use ``stages.dedup.exact_dedup_ids`` (min-id winner).  Totals are
  deterministic: survivors across runs = distinct fingerprints seen.
- ``name=...`` makes the shards detached named actors
  (``get_if_exists``): a restarted ingest driver re-attaches to the
  live index instead of silently re-admitting yesterday's content.
  Anonymous (default) indexes die with the driver — fine for
  single-session use and tests.

Cited reference behavior: the registry instance cache
(``registry.py:14-16``) is the reference's "shared state per process";
this module is its cross-job, cluster-wide analog.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray


class _SortedRun:
    """One immutable fp-sorted (fp, batch_key) parquet run, plus the
    in-memory structures that make it cheap to consult: a bloom filter
    (~2 bytes/key; 4 double-hashed probes off the digest's own two
    8-byte halves — the digest IS uniform, no extra hashing needed) and
    per-row-group fp ranges from the parquet footer.  Membership tests
    are bloom-negative in the common new-fingerprint case; a positive
    costs ONE pruned row-group read — the off-heap trade: O(row group)
    I/O per duplicate-bearing batch instead of resident dict bytes."""

    _K = 4  # bloom probes; with 16 bits/key → ~0.24% false positives
    _RG = 65536  # row group size every run writer uses

    def __init__(self, path: str, fps: list[bytes] | None = None) -> None:
        """``fps`` (sorted, matching the file just written): build the
        bloom + ranges from memory instead of re-reading the parquet —
        the flush path already holds every fingerprint, so reading the
        file back would double the I/O on the actor's critical path.
        Omit ``fps`` (restore/attach paths) to scan the file."""
        import pyarrow.parquet as pq

        self.path = path
        if fps is not None:
            self.n = len(fps)
            self._init_bloom()
            self._ranges = [
                (fps[i], fps[min(i + self._RG, self.n) - 1])
                for i in range(0, self.n, self._RG)
            ]
            self._bloom_add(fps)
            return
        pf = pq.ParquetFile(path)
        self.n = pf.metadata.num_rows
        self._init_bloom()
        self._ranges = []
        for i in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(i).column(0).statistics
            self._ranges.append((st.min, st.max))
            self._bloom_add(
                pf.read_row_group(i, columns=["fp"])["fp"].to_pylist())

    def _init_bloom(self) -> None:
        m = 1 << max(10, (self.n * 16).bit_length())
        self._m = m
        self._bits = _np().zeros(m // 64, dtype="uint64")

    @staticmethod
    def _hash_pairs(fps: list[bytes]):
        np = _np()
        buf = b"".join(fps)
        # The two bloom probe seeds are the digest's own 8-byte halves,
        # so the layout hard-requires 16-byte fingerprints.  A digest
        # width change must fail loudly here: silently fusing adjacent
        # 8-byte digests would corrupt every bloom key → false
        # NEGATIVES → duplicate admissions (ADVICE r4).
        if len(buf) != 16 * len(fps):
            raise ValueError(
                f"fingerprints must be 16-byte digests (got total "
                f"{len(buf)} bytes for {len(fps)} fps)")
        return np.frombuffer(buf, dtype=np.uint64).reshape(-1, 2)

    def _bloom_add(self, fps: list[bytes]) -> None:
        np = _np()
        if not fps:
            return
        h = self._hash_pairs(fps)
        for j in range(self._K):
            idx = (h[:, 0] + np.uint64(j) * h[:, 1]) % np.uint64(self._m)
            np.bitwise_or.at(
                self._bits, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )

    def maybe(self, fps: list[bytes]):
        """Vectorized bloom membership mask (False ⇒ definitely absent)."""
        np = _np()
        if not fps:
            return np.zeros(0, dtype=bool)
        h = self._hash_pairs(fps)
        ok = np.ones(len(fps), dtype=bool)
        for j in range(self._K):
            idx = (h[:, 0] + np.uint64(j) * h[:, 1]) % np.uint64(self._m)
            bit = (self._bits[(idx >> np.uint64(6)).astype(np.int64)]
                   >> (idx & np.uint64(63))) & np.uint64(1)
            ok &= bit.astype(bool)
        return ok

    def get_many(self, cand: list[bytes]) -> dict[bytes, bytes]:
        """fp → batch_key for the candidates present in this run,
        reading only the row groups whose [min, max] fp range can
        contain a candidate."""
        import bisect

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        out: dict[bytes, bytes] = {}
        cand_sorted = sorted(cand)
        pf = pq.ParquetFile(self.path)
        for i, (lo, hi) in enumerate(self._ranges):
            a = bisect.bisect_left(cand_sorted, lo)
            b = bisect.bisect_right(cand_sorted, hi)
            if a == b:
                continue
            tbl = pf.read_row_group(i, columns=["fp", "batch_key"])
            sub = tbl.filter(pc.is_in(
                tbl["fp"], value_set=pa.array(cand_sorted[a:b], pa.binary())))
            out.update(zip(sub["fp"].to_pylist(),
                           sub["batch_key"].to_pylist()))
        return out


def _np():
    import numpy

    return numpy


_RUN_SCHEMA = None  # built lazily (pa.schema at import time is fine too)


def _run_schema():
    global _RUN_SCHEMA
    if _RUN_SCHEMA is None:
        _RUN_SCHEMA = pa.schema([("fp", pa.binary()),
                                 ("batch_key", pa.binary())])
    return _RUN_SCHEMA


def _iter_run(path: str):
    """Stream a sorted run's (fp, batch_key) pairs one row group at a
    time — bounded memory regardless of run size."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    for i in range(pf.metadata.num_row_groups):
        t = pf.read_row_group(i, columns=["fp", "batch_key"])
        yield from zip(t["fp"].to_pylist(), t["batch_key"].to_pylist())


def _write_sorted_stream(pairs, path: str, *,
                         row_group_size: int = 65536) -> int:
    """Write an iterator of fp-ordered (fp, batch_key) pairs to one
    sorted parquet via tmp+rename, buffering one row group at a time.
    Returns rows written."""
    import os

    import pyarrow.parquet as pq

    tmp = path + ".tmp"
    n = 0
    writer = pq.ParquetWriter(tmp, _run_schema())
    try:
        fps, bks = [], []
        for fp, bk in pairs:
            fps.append(fp)
            bks.append(bk)
            if len(fps) >= row_group_size:
                writer.write_table(pa.table(
                    {"fp": pa.array(fps, pa.binary()),
                     "batch_key": pa.array(bks, pa.binary())}))
                n += len(fps)
                fps, bks = [], []
        if fps:
            writer.write_table(pa.table(
                {"fp": pa.array(fps, pa.binary()),
                 "batch_key": pa.array(bks, pa.binary())}))
            n += len(fps)
    finally:
        writer.close()
    os.replace(tmp, path)
    return n


class _FingerprintShard:
    """Owner of one hash-range of the fingerprint space.

    ``store="dict"`` (default): the whole shard is a Python dict —
    O(1) everything, ~60-100 B/entry resident.  ``store="spill"``: a
    bounded hot dict (``max_hot`` entries) backed by immutable sorted
    parquet runs under ``spill_dir`` with in-memory blooms — resident
    memory per fingerprint drops to bloom bits (~2 B) + footer stats,
    the >1 B-digests regime the dict cannot hold (VERDICT r3 #8).
    Identical admission semantics behind the same actor interface;
    ``spill_dir`` must be actor-local disk (each shard owns its runs)."""

    def __init__(self, store: str = "dict", spill_dir: str | None = None,
                 max_hot: int = 1_000_000) -> None:
        if store not in ("dict", "spill"):
            raise ValueError(f"unknown store {store!r}")
        if store == "spill" and not spill_dir:
            raise ValueError("store='spill' requires spill_dir")
        self.store = store
        self.spill_dir = spill_dir
        self.max_hot = max_hot
        self.seen: dict[bytes, bytes] = {}  # hot set: fp -> batch key
        self.runs: list[_SortedRun] = []
        if store == "spill":
            import glob
            import os

            os.makedirs(spill_dir, exist_ok=True)
            # A leftover compact.parquet means a prior incarnation
            # crashed mid-compaction AFTER the merged file was fully
            # written (it lands via tmp+rename, so presence ⇒ complete)
            # but BEFORE the old runs were swapped out.  The merged file
            # is a superset of every run (hot set folded in), so finish
            # the compaction here: drop the stale runs, promote the
            # compact file.  Without this heal, the old glob-only attach
            # would either see a partial run set or — if the crash
            # landed between the deletes and the final rename — come
            # back EMPTY and silently re-admit all history (ADVICE r4).
            cpath = os.path.join(spill_dir, "compact.parquet")
            if os.path.exists(cpath):
                for f in glob.glob(os.path.join(spill_dir,
                                                "run_*.parquet")):
                    os.remove(f)
                os.replace(cpath, os.path.join(spill_dir,
                                               "run_000000.parquet"))
            # A non-empty spill_dir is a prior incarnation of THIS shard
            # (actor restart over node-local scratch): attach its runs
            # instead of silently starting empty — starting empty would
            # re-admit already-indexed content and the next flush would
            # clobber run files (the dict-store analog is the detached
            # named actor surviving a driver restart).
            for f in sorted(glob.glob(os.path.join(spill_dir,
                                                   "run_*.parquet"))):
                self.runs.append(_SortedRun(f))

    # -- spill mechanics -------------------------------------------------
    def _flush_hot(self) -> None:
        import os

        import pyarrow.parquet as pq

        if not self.seen:
            return
        items = sorted(self.seen.items())
        tbl = pa.table({
            "fp": pa.array([k for k, _ in items], pa.binary()),
            "batch_key": pa.array([v for _, v in items], pa.binary()),
        })
        path = os.path.join(self.spill_dir, f"run_{len(self.runs):06d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=_SortedRun._RG)
        os.replace(tmp, path)
        # bloom/ranges from the in-memory items — no read-back of the
        # file we just wrote
        self.runs.append(_SortedRun(path, fps=[k for k, _ in items]))
        self.seen = {}

    def _merged_pairs(self):
        """Streaming k-way merge of the hot set + every sorted run, in
        fp order — `heapq.merge` over one-row-group-at-a-time readers,
        so memory stays bounded at (runs × one row group) regardless of
        index size (the >1 B-digests path; runs hold disjoint fps by
        construction, so no duplicate resolution is needed)."""
        import heapq

        sources = [iter(sorted(self.seen.items()))]
        sources += [_iter_run(r.path) for r in self.runs]
        return heapq.merge(*sources, key=lambda kv: kv[0])

    def compact_runs(self) -> int:
        """Merge every spilled run (hot set folded in) into ONE sorted
        run via the streaming external merge — bounds the per-lookup
        bloom/probe fan-out after many flushes.  Returns total
        fingerprints.  No-op for the dict store.

        Crash-consistent with the attach heal in ``__init__``: the
        merged file commits first (tmp+rename to compact.parquet), so a
        crash anywhere in the delete/rename tail leaves either the old
        runs intact (compact not yet committed) or a complete superset
        file that the next incarnation promotes — never an empty or
        partial index."""
        import glob
        import os

        if self.store != "spill" or not self.runs:
            return self.size()
        cpath = os.path.join(self.spill_dir, "compact.parquet")
        n = _write_sorted_stream(self._merged_pairs(), cpath)
        for f in glob.glob(os.path.join(self.spill_dir, "run_*.parquet")):
            os.remove(f)
        rpath = os.path.join(self.spill_dir, "run_000000.parquet")
        os.replace(cpath, rpath)
        self.seen, self.runs = {}, [_SortedRun(rpath)]
        return n

    def _lookup_runs(self, fps: list[bytes]) -> dict[bytes, bytes]:
        """Batched read-through over the spilled runs (newest owns
        nothing older doesn't — runs are disjoint by construction)."""
        owners: dict[bytes, bytes] = {}
        remaining = fps
        for run in self.runs:
            if not remaining:
                break
            mask = run.maybe(remaining)
            cand = [fp for fp, m in zip(remaining, mask) if m]
            if cand:
                owners.update(run.get_many(cand))
                remaining = [fp for fp in remaining if fp not in owners]
        return owners

    # -- actor interface ---------------------------------------------------
    def dump(self, path: str) -> int:
        """Snapshot this shard's FULL state (hot + spilled runs) to one
        fp-sorted parquet file (tmp+rename inside the stream writer: a
        torn write never masquerades as a snapshot), via the same
        streaming merge as compaction — snapshot memory stays bounded
        at any index size.  The admitting batch keys are persisted too,
        so retry idempotency survives a save/load cycle.  Snapshot
        format is store-independent — a dict-store snapshot loads into
        a spill store and vice versa."""
        return _write_sorted_stream(self._merged_pairs(), path)

    def restore(self, path: str) -> int:
        """Replace this shard's state with a snapshot file's content.
        A spill store lands the snapshot as its first sorted run (reset
        hot set): `dump()` snapshots are already fp-sorted, so the copy
        streams row group by row group (bounded memory at any snapshot
        size); an unsorted legacy snapshot falls back to one in-memory
        sort."""
        import pyarrow.parquet as pq

        if self.store == "dict":
            tbl = pq.read_table(path)
            self.seen = dict(
                zip(tbl["fp"].to_pylist(), tbl["batch_key"].to_pylist())
            )
            return len(self.seen)
        import glob
        import os

        for f in glob.glob(os.path.join(self.spill_dir, "run_*.parquet")):
            os.remove(f)
        # a stale mid-compaction file would be promoted over the
        # restored state at the next restart-attach — clear it too
        stale = os.path.join(self.spill_dir, "compact.parquet")
        if os.path.exists(stale):
            os.remove(stale)
        self.seen, self.runs = {}, []
        if pq.ParquetFile(path).metadata.num_rows == 0:
            return 0
        rpath = os.path.join(self.spill_dir, "run_000000.parquet")

        def checked_stream():
            prev = None
            for fp, bk in _iter_run(path):
                if prev is not None and fp < prev:
                    raise ValueError("unsorted")
                prev = fp
                yield fp, bk

        try:
            n = _write_sorted_stream(checked_stream(), rpath)
        except ValueError:  # legacy unsorted snapshot: sort once
            import pyarrow.compute as pc

            tbl = pq.read_table(path)
            tbl = tbl.take(pc.sort_indices(tbl,
                                           sort_keys=[("fp", "ascending")]))
            n = _write_sorted_stream(
                zip(tbl["fp"].to_pylist(), tbl["batch_key"].to_pylist()),
                rpath)
        self.runs.append(_SortedRun(rpath))
        return n

    def admit(self, fps: list[bytes], batch_key: bytes) -> list[bool]:
        """First-writer-wins with retry idempotency: True where fp is
        new, or where THIS batch (same content key) already admitted it
        — a retried task reproduces its original answers.  Duplicate fps
        within one call keep only the first occurrence."""
        seen = self.seen
        spilled: dict[bytes, bytes] = {}
        if self.runs:
            unknown = [fp for fp in dict.fromkeys(fps) if fp not in seen]
            if unknown:
                spilled = self._lookup_runs(unknown)
        out = []
        first_in_call: set[bytes] = set()
        for fp in fps:
            owner = seen.get(fp)
            if owner is None:
                owner = spilled.get(fp)
            if owner is None:
                seen[fp] = batch_key
                out.append(True)
            elif owner == batch_key and fp not in first_in_call:
                out.append(True)  # retry of the admitting batch
            else:
                out.append(False)
            first_in_call.add(fp)
        if self.store == "spill" and len(seen) > self.max_hot:
            self._flush_hot()
        return out

    def size(self) -> int:
        return len(self.seen) + sum(r.n for r in self.runs)

    def get_config(self) -> dict:
        """Constructor-args probe: named re-attach uses
        ``get_if_exists=True``, which silently KEEPS a live shard's
        original args — the driver must be able to detect that its
        requested store/max_hot was dropped (ADVICE r4; same spirit as
        the num_shards identity check)."""
        return {"store": self.store, "max_hot": self.max_hot,
                "spill_dir": self.spill_dir}


class IncrementalDeduper:
    """Driver-side handle over the sharded index.

    >>> dd = IncrementalDeduper(num_shards=16)
    >>> first  = dd.dedup(shard_monday)    # Dataset -> Dataset (materialized)
    >>> second = dd.dedup(shard_tuesday)   # drops Monday's content too
    >>> dd.index_size()                    # distinct fingerprints admitted

    Pass ``name="crawl-2026"`` for a detached index that survives driver
    restarts (re-attach by constructing with the same name).

    ``store="spill"``: each shard keeps a bounded hot dict (``max_hot``
    entries) and spills to bloom-indexed sorted parquet runs under
    ``spill_dir/shard_<i>/`` — the >1 B-fingerprints regime where the
    resident dict (~60-100 B/entry) no longer fits.  ``spill_dir``
    defaults to a fresh /tmp dir; on a real cluster point it at each
    node's local scratch (runs are actor-local state; only ``save()``
    snapshots need shared storage).
    """

    _NAMESPACE = "occular_dedup_index"

    def __init__(self, num_shards: int = 16, text_col: str = "text",
                 name: str | None = None, store: str = "dict",
                 spill_dir: str | None = None,
                 max_hot: int = 1_000_000,
                 self_healing: bool = False) -> None:
        import os
        import uuid

        self.num_shards = num_shards
        self.text_col = text_col
        self.name = name
        if store == "spill" and spill_dir is None:
            spill_dir = f"/tmp/occular_fpindex/{uuid.uuid4().hex[:12]}"
        if self_healing and store != "spill":
            # a restarted DICT shard comes back EMPTY while looking
            # alive — silent re-admission of all history; only the
            # spill store re-attaches its runs on restart
            raise ValueError("self_healing requires store='spill' "
                             "(a restarted dict shard silently loses "
                             "its index)")

        def kw(i: int) -> dict:
            return dict(
                store=store, max_hot=max_hot,
                spill_dir=(os.path.join(spill_dir, f"shard_{i:04d}")
                           if store == "spill" else None),
            )

        # self_healing: Ray restarts a crashed shard with its original
        # args (same spill_dir) and transparently retries in-flight
        # admit() calls; the restarted shard re-attaches its spilled
        # runs, so AT MOST the un-flushed hot set (≤ max_hot recent
        # admissions) is forgotten — those re-admit once (duplicates
        # slip through, never data loss).  Documented at-least-once
        # admission under crash-restart, vs the default fail-loud.
        opts = (dict(num_cpus=0, max_restarts=-1, max_task_retries=-1)
                if self_healing else dict(num_cpus=0))
        actor = ray.remote(**opts)(_FingerprintShard)
        if name is None:
            self.shards = [actor.remote(**kw(i)) for i in range(num_shards)]
            return
        # num_shards is part of a named index's identity: routing is
        # fp % num_shards, so attaching with a different count would
        # silently re-admit content (wrong shard consulted).  Detect a
        # live index's width before creating anything.
        def _exists(i: int) -> bool:
            try:
                ray.get_actor(f"{name}:shard{i}", namespace=self._NAMESPACE)
                return True
            except ValueError:
                return False

        if _exists(0):
            if not _exists(num_shards - 1) or _exists(num_shards):
                raise ValueError(
                    f"named index {name!r} exists with a different num_shards; "
                    f"re-attach with the original shard count"
                )
        self.shards = [
            actor.options(
                name=f"{name}:shard{i}", namespace=self._NAMESPACE,
                lifetime="detached", get_if_exists=True,
            ).remote(**kw(i))
            for i in range(num_shards)
        ]
        # get_if_exists KEEPS a live shard's original constructor args:
        # requesting store='spill' against an existing dict-store index
        # would silently stay dict-backed.  Probe the attached config
        # and fail loudly on a store mismatch (the semantic one: memory
        # model + restart behavior differ); warn on tuning drift.
        live = ray.get(self.shards[0].get_config.remote())
        if live["store"] != store:
            raise ValueError(
                f"named index {name!r} is live with store="
                f"{live['store']!r}; requested store={store!r} was "
                f"dropped by re-attach — shut the index down (or use "
                f"save()/load()) to change its store")
        if live["max_hot"] != max_hot:
            import warnings

            warnings.warn(
                f"named index {name!r}: re-attach keeps the live "
                f"max_hot={live['max_hot']} (requested {max_hot})",
                stacklevel=2)

    def _filter_fn(self):
        import os

        shards, n, text_col = self.shards, self.num_shards, self.text_col
        # Scopes retry idempotency to THIS dedup() call: Ray task retries
        # re-run the same serialized closure and reproduce the key, but a
        # later dedup() call replaying identical batch content gets a new
        # nonce and is treated as a duplicate, not a retry.
        nonce = os.urandom(16)

        def f(batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_pylist()
            fps = [hashlib.md5((t or "").encode("utf-8")).digest() for t in texts]
            # one RPC per shard per batch — group row indices by shard
            by_shard: dict[int, list[int]] = {}
            for i, fp in enumerate(fps):
                s = int.from_bytes(fp[:8], "little") % n
                by_shard.setdefault(s, []).append(i)
            keep = [False] * len(fps)
            # batch identity = call nonce + the WHOLE batch's ordered
            # fingerprint list, derived once and sent to every shard: a
            # task retry recomputes the identical key, while two distinct
            # batches collide only if they carry identical fingerprint
            # sequences within the SAME dedup() call.  A per-shard
            # sublist key would make e.g. any two batches that each
            # route a single duplicate fp to some shard look like
            # retries of each other there, re-admitting the dup; a
            # nonce-free whole-batch key would make a content replay in
            # a LATER call (re-crawled increment) look like a retry.
            bkey = hashlib.blake2b(nonce + b"".join(fps),
                                   digest_size=16).digest()
            refs, owners = [], []
            for s, idxs in by_shard.items():
                sub = [fps[i] for i in idxs]
                refs.append(shards[s].admit.remote(sub, bkey))
                owners.append(idxs)
            for idxs, mask in zip(owners, ray.get(refs)):
                for i, ok in zip(idxs, mask):
                    keep[i] = ok
            return batch.filter(pa.array(keep, pa.bool_()))

        return f

    def dedup(self, ds):
        """Dataset → MATERIALIZED Dataset with all previously-admitted
        content removed (and this dataset's own exact dups collapsed).
        Materialization is mandatory: the filter mutates the index, so a
        lazy plan would re-execute per consumption and come back empty
        the second time."""
        return ds.map_batches(self._filter_fn(), batch_format="pyarrow").materialize()

    def save(self, dir_path: str) -> int:
        """Snapshot the whole index to ``dir_path`` (per-shard parquet +
        ``meta.json``) — the durability half of the detached-actor
        design: detached shards survive a DRIVER restart, but a cluster
        restart loses them, and without a snapshot the next ingest run
        would silently re-admit all history.  ``meta.json`` commits LAST
        (tmp+rename), so a crash mid-save leaves the previous loadable
        snapshot (or none), never a torn one.

        On a multi-node cluster ``dir_path`` must be shared storage
        (object store / NFS) reachable from every shard actor; in this
        sandbox everything is one node.  Returns total fingerprints
        saved."""
        import json
        import os

        os.makedirs(dir_path, exist_ok=True)
        counts = ray.get(
            [
                s.dump.remote(os.path.join(dir_path, f"shard_{i:04d}.parquet"))
                for i, s in enumerate(self.shards)
            ]
        )
        meta = {"version": 1, "num_shards": self.num_shards,
                "text_col": self.text_col, "total": sum(counts)}
        tmp = os.path.join(dir_path, "meta.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, os.path.join(dir_path, "meta.json"))
        return sum(counts)

    @classmethod
    def load(cls, dir_path: str, name: str | None = None,
             store: str = "dict", spill_dir: str | None = None,
             max_hot: int = 1_000_000) -> "IncrementalDeduper":
        """Reconstruct an index from a ``save()`` snapshot: shard count
        and text column come from ``meta.json`` (the snapshot owns the
        routing identity), each shard restores its own file in parallel.
        Restoring into a ``name`` whose detached actors are still alive
        REPLACES their state with the snapshot's.  The snapshot format
        is store-independent: pass ``store="spill"`` to load a
        dict-built snapshot into the off-heap store (or back)."""
        import json
        import os

        with open(os.path.join(dir_path, "meta.json")) as fh:
            meta = json.load(fh)
        dd = cls(num_shards=meta["num_shards"], text_col=meta["text_col"],
                 name=name, store=store, spill_dir=spill_dir,
                 max_hot=max_hot)
        ray.get(
            [
                s.restore.remote(os.path.join(dir_path, f"shard_{i:04d}.parquet"))
                for i, s in enumerate(dd.shards)
            ]
        )
        return dd

    def index_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def compact(self) -> int:
        """Merge each spill shard's runs into one (no-op for dict
        shards).  Run between increments when many flushes have
        accumulated.  Returns total fingerprints."""
        return sum(ray.get([s.compact_runs.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []

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
  roughly 60-100 GB — size N so each shard holds a few GB (N ≥ 32 for
  the 1 B-row regime), or swap the dict for an off-heap store behind the
  same actor interface.
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


class _FingerprintShard:
    """Owner of one hash-range of the fingerprint space."""

    def __init__(self) -> None:
        self.seen: dict[bytes, bytes] = {}  # fp -> admitting batch key

    def dump(self, path: str) -> int:
        """Snapshot this shard's state to one parquet file (tmp+rename:
        a torn write never masquerades as a snapshot).  The admitting
        batch keys are persisted too, so retry idempotency survives a
        save/load cycle."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "fp": pa.array(list(self.seen.keys()), pa.binary()),
                "batch_key": pa.array(list(self.seen.values()), pa.binary()),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return tbl.num_rows

    def restore(self, path: str) -> int:
        """Replace this shard's state with a snapshot file's content."""
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        self.seen = dict(
            zip(tbl["fp"].to_pylist(), tbl["batch_key"].to_pylist())
        )
        return len(self.seen)

    def admit(self, fps: list[bytes], batch_key: bytes) -> list[bool]:
        """First-writer-wins with retry idempotency: True where fp is
        new, or where THIS batch (same content key) already admitted it
        — a retried task reproduces its original answers.  Duplicate fps
        within one call keep only the first occurrence."""
        out = []
        first_in_call: set[bytes] = set()
        seen = self.seen
        for fp in fps:
            owner = seen.get(fp)
            if owner is None:
                seen[fp] = batch_key
                out.append(True)
            elif owner == batch_key and fp not in first_in_call:
                out.append(True)  # retry of the admitting batch
            else:
                out.append(False)
            first_in_call.add(fp)
        return out

    def size(self) -> int:
        return len(self.seen)


class IncrementalDeduper:
    """Driver-side handle over the sharded index.

    >>> dd = IncrementalDeduper(num_shards=16)
    >>> first  = dd.dedup(shard_monday)    # Dataset -> Dataset (materialized)
    >>> second = dd.dedup(shard_tuesday)   # drops Monday's content too
    >>> dd.index_size()                    # distinct fingerprints admitted

    Pass ``name="crawl-2026"`` for a detached index that survives driver
    restarts (re-attach by constructing with the same name).
    """

    _NAMESPACE = "occular_dedup_index"

    def __init__(self, num_shards: int = 16, text_col: str = "text",
                 name: str | None = None) -> None:
        self.num_shards = num_shards
        self.text_col = text_col
        self.name = name
        actor = ray.remote(num_cpus=0)(_FingerprintShard)
        if name is None:
            self.shards = [actor.remote() for _ in range(num_shards)]
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
            ).remote()
            for i in range(num_shards)
        ]

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
    def load(cls, dir_path: str, name: str | None = None) -> "IncrementalDeduper":
        """Reconstruct an index from a ``save()`` snapshot: shard count
        and text column come from ``meta.json`` (the snapshot owns the
        routing identity), each shard restores its own file in parallel.
        Restoring into a ``name`` whose detached actors are still alive
        REPLACES their state with the snapshot's."""
        import json
        import os

        with open(os.path.join(dir_path, "meta.json")) as fh:
            meta = json.load(fh)
        dd = cls(num_shards=meta["num_shards"], text_col=meta["text_col"],
                 name=name)
        ray.get(
            [
                s.restore.remote(os.path.join(dir_path, f"shard_{i:04d}.parquet"))
                for i, s in enumerate(dd.shards)
            ]
        )
        return dd

    def index_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []

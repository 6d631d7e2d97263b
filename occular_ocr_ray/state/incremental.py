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
- The index is N zero-CPU ``_FingerprintShard`` actors, sharded by
  fingerprint hash — memory and request load scale out with N, and each
  admission decision is a single-owner operation (no distributed
  locking).  Per shard the state is a plain ``set`` of 16-byte digests;
  1 B fingerprints ≈ 16 GB spread over the shard set, far below one
  node's RAM at N ≥ 16.
- ``filter_new`` batches run inside ``map_batches``: each batch computes
  md5 map-side, groups digests per shard, and makes ONE call per shard
  per batch (not per row).  Admission is first-writer-wins.
- Semantics: each distinct fingerprint is admitted exactly once across
  every dataset ever passed through the same index.  WHICH duplicate row
  survives follows arrival order, so it is deliberately NOT part of the
  deterministic query surface — for deterministic single-corpus dedup
  use ``stages.dedup.exact_dedup_ids`` (min-id winner).  Totals are
  deterministic: survivors across runs = distinct fingerprints seen.

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
        self.seen: set[bytes] = set()

    def admit(self, fps: list[bytes]) -> list[bool]:
        """First-writer-wins: True where fp was NOT seen before this
        call; duplicates *within* the list keep only their first
        occurrence (single-owner, so this is atomic per shard)."""
        out = []
        seen = self.seen
        for fp in fps:
            if fp in seen:
                out.append(False)
            else:
                seen.add(fp)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self.seen)


class IncrementalDeduper:
    """Driver-side handle over the sharded index.

    >>> dd = IncrementalDeduper(num_shards=16)
    >>> first  = dd.dedup(shard_monday)    # Dataset -> Dataset
    >>> second = dd.dedup(shard_tuesday)   # drops Monday's content too
    >>> dd.index_size()                    # distinct fingerprints admitted
    """

    def __init__(self, num_shards: int = 16, text_col: str = "text") -> None:
        self.num_shards = num_shards
        self.text_col = text_col
        actor = ray.remote(num_cpus=0)(_FingerprintShard)
        self.shards = [actor.remote() for _ in range(num_shards)]

    def _filter_fn(self):
        shards, n, text_col = self.shards, self.num_shards, self.text_col

        def f(batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_pylist()
            fps = [hashlib.md5((t or "").encode("utf-8")).digest() for t in texts]
            # one RPC per shard per batch — group row indices by shard
            by_shard: dict[int, list[int]] = {}
            for i, fp in enumerate(fps):
                by_shard.setdefault(fp[0] % n, []).append(i)
            keep = [False] * len(fps)
            refs, owners = [], []
            for s, idxs in by_shard.items():
                refs.append(shards[s].admit.remote([fps[i] for i in idxs]))
                owners.append(idxs)
            for idxs, mask in zip(owners, ray.get(refs)):
                for i, ok in zip(idxs, mask):
                    keep[i] = ok
            return batch.filter(pa.array(keep, pa.bool_()))

        return f

    def dedup(self, ds):
        """Dataset → Dataset with all previously-admitted content
        removed (and this dataset's own exact dups collapsed)."""
        return ds.map_batches(self._filter_fn(), batch_format="pyarrow")

    def index_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []

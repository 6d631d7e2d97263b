"""Hot-key salting for skewed aggregations — the explicit two-phase
pattern (ray_guide "Wide operations shuffle": "salt hot keys").

A plain ``groupby(key).sum()`` sends every row of a hot key to one
reducer; with power-law keys (hosts, users, languages) one reducer
becomes the job's critical path.  ``salted_groupby_sum`` splits each key
into ``num_salts`` sub-groups (salt = row-hash % S, so rows spread
evenly regardless of key skew), reduces the sub-groups in parallel, and
merges the tiny per-salt partials with a second groupby over at most
``distinct_keys × S`` rows.  Sums are associative+commutative, so the
result is exactly the unsalted answer at any parallelism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Sum


def salted_groupby_sum(ds, keys: list[str], sum_cols: list[str], *, num_salts: int = 16):
    """Exact grouped sums over skewed keys.  Returns a Dataset with
    ``keys`` + ``sum_cols`` (summed), identical to
    ``ds.groupby(keys).aggregate(Sum(...))`` but with the hot-key reduce
    fanned out ``num_salts`` ways."""

    def add_salt(b: pa.Table) -> pa.Table:
        # cycling ordinal, not hash(key): rows of ONE hot key must spread
        # across salts — a key-derived salt would keep them together
        salt = (np.arange(b.num_rows) % num_salts).astype(np.int32)
        return b.append_column("__salt", pa.array(salt, pa.int32()))

    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    partial = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([*keys, "__salt"])
        .aggregate(*aggs)
    )
    return partial.groupby(keys).aggregate(*aggs).select_columns([*keys, *sum_cols])

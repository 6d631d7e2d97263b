"""Distributed approximate COUNT(DISTINCT) via mergeable HLL sketches.

Scale shape (ray_guide "Aggregation at scale" sketch pattern): each
batch emits ONE serialized sketch row per group key; a tiny groupby
merges the fixed-size registers (element-wise max).  The shuffle moves
2^b bytes per (batch, key) — never the distinct keys themselves, which
is what makes COUNT(DISTINCT) feasible at 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import sketches as sk


def approx_distinct(
    ds,
    key_col: str,
    value_col: str,
    *,
    b: int = 12,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Per-``key_col`` approximate distinct count of ``value_col``.
    Returns (key, approx_distinct) sorted by key; standard error
    ≈ 1.04/sqrt(2^b) (~1.6% at b=12)."""

    def batch_sketches(batch: pa.Table) -> pa.Table:
        # group-by-key via one Arrow sort + run-boundary scan (no pandas
        # frame build per batch); values convert to Python once, as the
        # HLL hash consumes Python objects anyway
        import pyarrow.compute as pc

        idx = pc.sort_indices(batch[key_col])
        k_np = batch[key_col].take(idx).to_numpy(zero_copy_only=False)
        vals = batch[value_col].take(idx).to_pylist()
        bounds = [0, *(np.flatnonzero(k_np[1:] != k_np[:-1]) + 1), len(k_np)]
        keys, blobs = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if s == e:
                continue
            reg = sk.hll_create(b)
            sk.hll_add(reg, vals[s:e])
            keys.append(k_np[s])
            blobs.append(reg.tobytes())
        return pa.table(
            {
                key_col: pa.array(keys),
                "sketch": pa.array(blobs, pa.binary()),
            }
        )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        reg = sk.hll_create(b)
        for blob in g["sketch"]:
            reg = sk.hll_merge(reg, np.frombuffer(blob, dtype=np.uint8))
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "approx_distinct": [int(round(sk.hll_estimate(reg)))],
            }
        )

    out = (
        ds.map_batches(batch_sketches, batch_format="pyarrow", batch_size=batch_size)
        .groupby(key_col)
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(key_col).reset_index(drop=True)

"""Explicit partitioned hash join — the portable large-large join
pattern (ray_guide "Joins and lookups"): add ``bucket = hash(key) % B``
to both sides, tag each side, union, ``groupby(bucket)``, and join
matching buckets pairwise with pandas inside ``map_groups``.

Exists alongside ``Dataset.join`` (used by
``relational.orders_join_priority``) as the version whose shuffle
mechanics are fully explicit and portable to any Ray version: the only
exchange is the single groupby on the bucket column, and B is the skew
knob (salt hot keys by widening B; document per pipeline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def bucketed_hash_join(
    left,
    right,
    *,
    left_on: str,
    right_on: str,
    num_buckets: int = 32,
):
    """Inner join left ⋈ right on integer keys.  Returns a Dataset with
    left's columns + right's non-key columns (pandas merge semantics,
    suffix "_r" on collisions)."""

    # union needs one schema: pad each side with null columns of the
    # other side's fields (metadata-only reads)
    lschema, rschema = left.schema(), right.schema()
    lnames = set(lschema.names)
    rnames = set(rschema.names)
    pad_for_left = [(n, rschema.base_schema.field(n).type) for n in rschema.names if n not in lnames]
    pad_for_right = [(n, lschema.base_schema.field(n).type) for n in lschema.names if n not in rnames]
    all_names = lschema.names + [n for n in rschema.names if n not in lnames]

    def tag(side: str, key: str, pad):
        def f(batch: pa.Table) -> pa.Table:
            keys = batch[key].to_numpy(zero_copy_only=False)
            bucket = (np.abs(keys) % num_buckets).astype(np.int32)
            for n, typ in pad:
                batch = batch.append_column(n, pa.nulls(batch.num_rows, typ))
            batch = batch.select(all_names)
            batch = batch.append_column("__bucket", pa.array(bucket, pa.int32()))
            return batch.append_column(
                "__side", pa.array([side] * batch.num_rows, pa.string())
            )

        return f

    tagged = left.map_batches(tag("l", left_on, pad_for_left), batch_format="pyarrow").union(
        right.map_batches(tag("r", right_on, pad_for_right), batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"].dropna(axis=1, how="all")
        rg = g[g["__side"] == "r"].dropna(axis=1, how="all")
        lg = lg.drop(columns=["__bucket", "__side"], errors="ignore")
        rg = rg.drop(columns=["__bucket", "__side"], errors="ignore")
        if lg.empty or rg.empty:
            return pd.DataFrame()
        m = lg.merge(rg, left_on=left_on, right_on=right_on, suffixes=("", "_r"))
        if right_on != left_on and right_on in m.columns:
            m = m.drop(columns=[right_on])
        return m

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")

"""Explicit partitioned hash join — the portable large-large join
pattern (ray_guide "Joins and lookups"): add ``bucket = hash(key) % B``
to both sides, tag each side, union, ``groupby(bucket)``, and join
matching buckets pairwise with an Arrow hash join inside ``map_groups``.

Exists alongside ``Dataset.join`` (used by
``relational.orders_join_priority``) as the version whose shuffle
mechanics are fully explicit and portable to any Ray version: the only
exchange is the single groupby on the bucket column, and B is the skew
knob (salt hot keys by widening B; document per pipeline).

The per-bucket join is Arrow end-to-end (``batch_format="pyarrow"`` +
``pa.Table.join``): null-padded union columns keep their declared Arrow
types, so int64 keys survive exactly.  (A pandas merge here would coerce
null-padded int64 to float64 and corrupt any id ≥ 2^53 — the hash-derived
doc ids `training_data._with_int_id` emits are in [0, 2^62).)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _default_num_buckets() -> int:
    """Scale the exchange width with the cluster: ~2 buckets per core
    (floor 32) so bucket-join parallelism never caps a big cluster."""
    try:
        import ray

        cores = int(ray.cluster_resources().get("CPU", 16)) if ray.is_initialized() else 16
    except Exception:  # pragma: no cover - ray not importable
        cores = 16
    return max(32, 2 * cores)


def _arrow_schema(ds) -> pa.Schema:
    """Dataset schema as a pa.Schema.  Pandas-block datasets (e.g.
    ``from_pandas``) report numpy dtypes; map them to the Arrow types the
    pyarrow batch format will deliver (object → string — feed
    Arrow-native datasets for exotic object columns)."""
    s = ds.schema(fetch_if_missing=True)
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(s.names, base.types):
        if isinstance(typ, pa.DataType):
            fields.append((name, typ))
        elif getattr(typ, "kind", "O") == "O":
            fields.append((name, pa.string()))
        else:
            fields.append((name, pa.from_numpy_dtype(typ)))
    return pa.schema(fields)


def _tagged_bucket_union(left, right, left_on: str, right_on: str, num_buckets: int,
                         lschema: pa.Schema | None = None,
                         rschema: pa.Schema | None = None):
    """Shared exchange skeleton for the explicit-join family: pad both
    sides to one combined schema (pa.nulls keeps declared types — never
    pandas NaN coercion), tag with ``__side``, add ``__bucket`` =
    |key| % B, and union.  The single groupby("__bucket") a caller runs
    on the result IS the only shuffle; the caller supplies the
    per-bucket resolver (inner join, anti filter, ...).
    Returns (tagged_dataset, lschema, rschema).  Callers that know a
    side's schema a priori should pass it — inference executes a block
    and returns None for empty datasets."""
    lschema = lschema if lschema is not None else _arrow_schema(left)
    rschema = rschema if rschema is not None else _arrow_schema(right)
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    lset = set(lnames)
    pad_for_left = [
        (n, rschema.field(n).type) for n in rnames if n not in lset
    ]
    pad_for_right = [
        (n, lschema.field(n).type) for n in lnames if n not in set(rnames)
    ]
    all_names = lnames + [n for n in rnames if n not in lset]

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
    return tagged, lschema, rschema


def bucketed_hash_join(
    left,
    right,
    *,
    left_on: str,
    right_on: str,
    num_buckets: int | None = None,
    join_type: str = "inner",
):
    """Join left ⋈ right on integer keys (``join_type``: "inner" or
    "left outer").  Returns a Dataset with left's columns + right's
    non-key columns (suffix "_r" on name collisions; the key column is
    coalesced under ``left_on``).  Left-outer rows with no match carry
    nulls in the right columns — the same bucket exchange serves both
    types, since a left row's match can only live in its own bucket."""
    if join_type not in ("inner", "left outer"):
        raise ValueError(f"unsupported join_type {join_type!r}")
    if num_buckets is None:
        num_buckets = _default_num_buckets()
    tagged, lschema, rschema = _tagged_bucket_union(
        left, right, left_on, right_on, num_buckets
    )
    lnames, rnames = list(lschema.names), list(rschema.names)
    lset = set(lnames)

    # output schema, fixed at build time so every bucket (including
    # empty ones) emits identically-typed blocks
    out_fields = [(n, lschema.field(n).type) for n in lnames]
    for n in rnames:
        if n == right_on:
            continue  # coalesced into left_on
        out_name = f"{n}_r" if n in lset else n
        out_fields.append((out_name, rschema.field(n).type))
    out_schema = pa.schema(out_fields)

    def join_bucket(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g["__side"], "l")
        # each side's real columns come from the schemas captured above —
        # never inferred from the data (an all-null-within-bucket column
        # must survive as nulls, not vanish)
        lg = g.filter(lmask).select(lnames)
        rg = g.filter(pc.invert(lmask)).select(rnames)
        if lg.num_rows == 0:
            return out_schema.empty_table()
        if rg.num_rows == 0:
            if join_type == "inner":
                return out_schema.empty_table()
            for name in out_schema.names[len(lnames):]:  # null right cols
                lg = lg.append_column(
                    name, pa.nulls(lg.num_rows, out_schema.field(name).type)
                )
            return lg.select(out_schema.names).cast(out_schema)
        joined = lg.join(
            rg, keys=[left_on], right_keys=[right_on],
            join_type=join_type, right_suffix="_r",
        )
        return joined.select(out_schema.names).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")

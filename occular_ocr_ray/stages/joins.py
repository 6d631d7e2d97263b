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


def buckets_for(n_rows: int, rows_per_bucket: int = 65536) -> int:
    """Exchange width sized from the DATA, capped at the cluster width:
    ~64k rows per bucket up to ``_default_num_buckets()``.  At web scale
    the cap wins (full cluster parallelism); at test scale this collapses
    to a few buckets instead of spraying tiny blocks over 64 groups —
    row counts from parquet metadata (``ds.count()`` pre-transform) are
    free, so callers that know their input size should pass this."""
    return max(1, min(_default_num_buckets(), -(-n_rows // rows_per_bucket)))


def _bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket assignment for any key dtype: integer keys
    bucket by |k| % B (cheap, stable); string/other keys by pandas'
    fixed-key siphash (``pd.util.hash_array`` — process- and
    run-invariant, unlike builtin ``hash`` under PYTHONHASHSEED).
    Web-data joins are routinely on strings (url, domain, lang)."""
    if keys.dtype.kind in "iu":
        return (np.abs(keys) % num_buckets).astype(np.int32)
    import pandas as pd

    h = pd.util.hash_array(np.asarray(keys, dtype=object))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _arrow_schema(ds) -> pa.Schema:
    """Dataset schema as a pa.Schema.  Pandas-block datasets (e.g.
    ``from_pandas``) report numpy dtypes; map them to the Arrow types the
    pyarrow batch format will deliver (object → string — feed
    Arrow-native datasets for exotic object columns)."""
    s = ds.schema(fetch_if_missing=True)
    if s is None:  # fully-empty dataset: nothing executed a block
        raise ValueError(
            "cannot infer the schema of an empty dataset — pass it "
            "explicitly (left_schema=/right_schema=)"
        )
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(s.names, s.types):
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
            bucket = _bucket_of(keys, num_buckets)
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
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Join left ⋈ right on integer keys (``join_type``: "inner",
    "left outer" or "full outer").  Returns a Dataset with left's
    columns + right's non-key columns (suffix "_r" on name collisions;
    the key column is coalesced under ``left_on``).  Outer rows with no
    match carry nulls in the other side's columns — the same bucket
    exchange serves every type, since a row's match can only live in
    its own bucket (full outer included: an unmatched right row
    surfaces from exactly the bucket its key hashed to).  Pass
    ``left_schema``/``right_schema`` when a side can be empty — schema
    inference on an empty dataset has nothing to execute."""
    if join_type not in ("inner", "left outer", "full outer"):
        raise ValueError(f"unsupported join_type {join_type!r}")
    if num_buckets is None:
        num_buckets = _default_num_buckets()
    tagged, lschema, rschema = _tagged_bucket_union(
        left, right, left_on, right_on, num_buckets,
        lschema=left_schema, rschema=right_schema,
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
        if lg.num_rows == 0 and join_type != "full outer":
            return out_schema.empty_table()
        if rg.num_rows == 0:
            if join_type == "inner" or lg.num_rows == 0:
                return out_schema.empty_table()
            for name in out_schema.names[len(lnames):]:  # null right cols
                lg = lg.append_column(
                    name, pa.nulls(lg.num_rows, out_schema.field(name).type)
                )
            return lg.select(out_schema.names).cast(out_schema)
        # full outer with an empty left bucket falls through: Acero emits
        # the right rows with null left columns, key coalesced to left_on
        joined = lg.join(
            rg, keys=[left_on], right_keys=[right_on],
            join_type=join_type, right_suffix="_r",
        )
        return joined.select(out_schema.names).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def bucketed_lookup_join(
    left,
    right,
    *,
    left_on: str,
    right_on: str,
    num_buckets: int | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Left-outer 1:≤1 enrichment: attach ``right``'s non-key columns
    to ``left`` by key, resolved per bucket with an index-``take``
    instead of Acero's hash join.  Exists because Acero rejects
    list/struct NON-KEY columns on either side — this variant carries
    ANY left schema (e.g. the flagship's ``spans`` struct column)
    through the same single bucket exchange.  ``right`` must be unique
    per key (an aggregate/interval table); rows without a match get
    nulls, unmatched right rows are dropped."""
    if num_buckets is None:
        num_buckets = _default_num_buckets()
    tagged, lschema, rschema = _tagged_bucket_union(
        left, right, left_on, right_on, num_buckets,
        lschema=left_schema, rschema=right_schema,
    )
    lnames, rnames = list(lschema.names), list(rschema.names)
    lset = set(lnames)
    out_fields = [(n, lschema.field(n).type) for n in lnames]
    r_value_names = [n for n in rnames if n != right_on]
    r_out_names = [f"{n}_r" if n in lset else n for n in r_value_names]
    out_fields += [(o, rschema.field(n).type)
                   for n, o in zip(r_value_names, r_out_names)]
    out_schema = pa.schema(out_fields)

    def lookup_bucket(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g["__side"], "l")
        lg = g.filter(lmask).select(lnames)
        if lg.num_rows == 0:
            return out_schema.empty_table()
        rg = g.filter(pc.invert(lmask)).select(rnames)
        pos = {k: i for i, k in enumerate(rg[right_on].to_pylist())}
        idx = pa.array(
            [pos.get(k) for k in lg[left_on].to_pylist()], pa.int64()
        )  # null index → null output under Arrow take semantics
        for n, o in zip(r_value_names, r_out_names):
            lg = lg.append_column(o, rg[n].combine_chunks().take(idx))
        return lg.select(out_schema.names).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(
        lookup_bucket, batch_format="pyarrow")


def _mg_key_histogram(ds, col: str, capacity: int):
    """Approximate key histogram via a mergeable Misra-Gries fold over a
    key-only projection (one row of packed lists per batch, streaming
    driver fold — same shape as ``sketch_agg.topk_by_frequency``'s
    candidate pass).  Returns (estimates dict, n_total); every key with
    true count > n/(capacity+1) is guaranteed present."""
    from .sketch_agg import _mg_compress

    def partial(batch: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            batch[col].to_numpy(zero_copy_only=False), return_counts=True
        )
        mg = _mg_compress(dict(zip(keys.tolist(), counts.tolist())), capacity)
        # pack under the column's own Arrow type: string join keys are
        # routine in web data (url, domain, lang), not just int64
        kt = batch.schema.field(col).type
        return pa.table({
            "keys": pa.array([list(mg.keys())], pa.list_(kt)),
            "counts": pa.array([list(mg.values())], pa.list_(pa.int64())),
            "n": pa.array([batch.num_rows], pa.int64()),
        })

    acc: dict = {}
    n_total = 0
    proj = ds.map_batches(partial, batch_format="pyarrow")
    for b in proj.iter_batches(batch_format="pyarrow"):
        for ks, cs, n in zip(b["keys"].to_pylist(), b["counts"].to_pylist(),
                             b["n"].to_pylist()):
            for kk, cc in zip(ks, cs):
                acc[kk] = acc.get(kk, 0) + cc
            if len(acc) > capacity:
                acc = _mg_compress(acc, capacity)
            n_total += n
    return acc, n_total


def skew_aware_join(
    left,
    right,
    *,
    left_on: str,
    right_on: str,
    hot_keys: frozenset | None = None,
    hot_capacity: int = 64,
    hot_min_frac: float = 0.01,
    num_buckets: int | None = None,
):
    """Inner join that routes HOT keys around the shuffle — the skew
    killer for fact ⋈ dim joins where a handful of keys carry a large
    fraction of the fact table (a vanilla bucket exchange sends each hot
    key's entire row set to ONE bucket task).

    Plan (left scanned once, right twice — right is the small side):

    1. **Detect** hot keys with a Misra-Gries histogram over left's key
       projection (skipped when ``hot_keys`` is passed, e.g. from prior
       pipeline stats): keys with estimated frequency ≥ ``hot_min_frac``
       of left.  Exactness is NOT required — a missed hot key degrades
       to the bucketed path, a false hot key just rides the broadcast.
    2. **Broadcast** right's hot-key rows (``ray.put`` once; assumption,
       documented: right-side cardinality per hot key is small — the
       dim-side of a skewed fact join).
    3. **One exchange**: a single map over left joins hot rows against
       the broadcast table map-side (emitting finished output rows with
       ``__bucket = -1``) and tags cold rows with their hash bucket;
       cold right rows are tagged likewise; one ``groupby(__bucket)``
       then passes bucket −1 through untouched and hash-joins the rest.
       Hot volume never enters the shuffle.

    Output: identical schema and rows to ``bucketed_hash_join(...,
    join_type="inner")`` (asserted in tests on skewed data).
    """
    if num_buckets is None:
        num_buckets = _default_num_buckets()
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lnames, rnames = list(lschema.names), list(rschema.names)
    lset = set(lnames)

    if hot_keys is None:
        hist, n_total = _mg_key_histogram(left, left_on, hot_capacity)
        cut = max(2.0, hot_min_frac * n_total)
        hot_keys = frozenset(k for k, c in hist.items() if c >= cut)

    # output schema: left cols + right non-key cols (_r suffix on clash)
    out_fields = [(n, lschema.field(n).type) for n in lnames]
    r_out_names: list[str] = []
    for n in rnames:
        if n == right_on:
            continue
        out_name = f"{n}_r" if n in lset else n
        r_out_names.append(out_name)
        out_fields.append((out_name, rschema.field(n).type))
    out_schema = pa.schema(out_fields)
    # exchange schema: output cols + the right key (real only on r rows)
    exch_schema = pa.schema(
        list(out_fields) + ([(right_on, rschema.field(right_on).type)]
                            if right_on not in out_schema.names else [])
    )
    exch_names = list(exch_schema.names)

    import ray

    # hot-key membership array in the keys' native dtype (int64 or
    # unicode) — np.isin handles both; sorted for determinism
    hot_arr = (np.asarray(sorted(hot_keys)) if hot_keys
               else np.empty(0, dtype=np.int64))

    def collect_hot(batch: pa.Table) -> pa.Table:
        mask = np.isin(batch[right_on].to_numpy(zero_copy_only=False),
                       hot_arr)
        return batch.filter(pa.array(mask))

    # Seed with the typed empty table and drop zero-row blocks: an empty
    # right dataset otherwise contributes schema-less blocks that strip
    # the key column from the broadcast table (Arrow join then fails).
    hot_right = pa.concat_tables(
        [rschema.empty_table()]
        + [t for t in (ray.get(ref) for ref in
                       right.map_batches(collect_hot, batch_format="pyarrow")
                            .to_arrow_refs())
           if t.num_rows]
    ).combine_chunks() if hot_keys else rschema.empty_table()
    hot_ref = ray.put(hot_right)

    def pad_to_exchange(tbl: pa.Table, bucket: np.ndarray, side: str) -> pa.Table:
        for n in exch_names:
            if n not in tbl.column_names:
                tbl = tbl.append_column(n, pa.nulls(tbl.num_rows,
                                                    exch_schema.field(n).type))
        tbl = tbl.select(exch_names).cast(exch_schema)
        tbl = tbl.append_column("__bucket", pa.array(bucket, pa.int32()))
        return tbl.append_column("__side",
                                 pa.array([side] * tbl.num_rows, pa.string()))

    def route_left(batch: pa.Table) -> pa.Table:
        keys = batch[left_on].to_numpy(zero_copy_only=False)
        hot_mask = np.isin(keys, hot_arr)
        cold = batch.filter(pa.array(~hot_mask))
        out_parts = []
        if cold.num_rows:
            bucket = _bucket_of(
                cold[left_on].to_numpy(zero_copy_only=False), num_buckets)
            out_parts.append(pad_to_exchange(cold, bucket, "l"))
        hot = batch.filter(pa.array(hot_mask))
        if hot.num_rows:
            joined = hot.join(ray.get(hot_ref), keys=[left_on],
                              right_keys=[right_on], join_type="inner",
                              right_suffix="_r")
            joined = joined.select(out_schema.names).cast(out_schema)
            bucket = np.full(joined.num_rows, -1, dtype=np.int32)
            out_parts.append(pad_to_exchange(joined, bucket, "j"))
        if not out_parts:
            return pad_to_exchange(out_schema.empty_table(),
                                   np.empty(0, dtype=np.int32), "l")
        return pa.concat_tables(out_parts).combine_chunks()

    def route_right_cold(batch: pa.Table) -> pa.Table:
        keys = batch[right_on].to_numpy(zero_copy_only=False)
        cold = batch.filter(pa.array(~np.isin(keys, hot_arr)))
        # place right's non-key columns under their OUT names
        cols = {right_on: cold[right_on]}
        for n, out_name in zip([n for n in rnames if n != right_on],
                               r_out_names):
            cols[out_name] = cold[n]
        tbl = pa.table(cols)
        bucket = _bucket_of(
            cold[right_on].to_numpy(zero_copy_only=False), num_buckets)
        return pad_to_exchange(tbl, bucket, "r")

    tagged = left.map_batches(route_left, batch_format="pyarrow").union(
        right.map_batches(route_right_cold, batch_format="pyarrow")
    )

    def resolve(g: pa.Table) -> pa.Table:
        if g["__bucket"][0].as_py() == -1:
            return g.select(out_schema.names).cast(out_schema)
        lmask = pc.equal(g["__side"], "l")
        lg = g.filter(lmask).select(lnames)
        rg = g.filter(pc.equal(g["__side"], "r")).select([right_on, *r_out_names])
        if lg.num_rows == 0 or rg.num_rows == 0:
            return out_schema.empty_table()
        joined = lg.join(rg, keys=[left_on], right_keys=[right_on],
                         join_type="inner")
        return joined.select(out_schema.names).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(resolve, batch_format="pyarrow")


def data_scaled_join(left, right, *, on: tuple, right_on: tuple,
                     sizing_rows: int, join_type: str = "inner"):
    """``Dataset.join`` with data-scaled partitioning that SURVIVES
    sparse keyspaces.  Ray's hash-shuffle join aggregator builds each
    partition with an ``ArrowBlockBuilder``; a partition that receives
    ZERO rows builds a schemaless empty table and Acero then fails with
    "No match … for key field reference" (ray 2.49
    ``execution/operators/join.py`` ``finalize``).  Routing:

    - ``sizing_rows ≥ 10k``: ``Dataset.join``, parallelism
      ``max(8, min(cluster_cpus(), rows/50k + 1))`` — with ≥ ~1.2k
      rows per partition a hash-empty partition needs a degenerate
      key space (a handful of distinct keys; use
      ``bucketed_hash_join`` explicitly for those);
    - below 10k rows: ``bucketed_hash_join`` — its empty buckets are
      benign (``map_groups`` never sees absent groups), which is
      exactly the planted-fixture / tail-shard regime where hash-empty
      partitions are routine and performance is irrelevant.  Same
      inner-join column semantics (left + right non-key, key
      coalesced).

    ``sizing_rows`` comes from parquet metadata / a prior ``count()``
    — no extra scan — and must bound the LARGER side."""
    from .util import cluster_cpus

    if sizing_rows < 10_000:
        assert len(on) == 1 and len(right_on) == 1, (
            "bucketed fallback supports single-key joins only")
        return bucketed_hash_join(
            left, right, left_on=on[0], right_on=right_on[0],
            num_buckets=buckets_for(sizing_rows), join_type=join_type)
    nparts = max(8, min(cluster_cpus(), sizing_rows // 50_000 + 1))
    return left.join(right, join_type, num_partitions=nparts,
                     on=on, right_on=right_on)

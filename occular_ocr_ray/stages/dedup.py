"""Deduplication stages: exact (hash-partition + per-group first),
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale shape (ray_guide "Aggregation at scale"): signatures are computed
embarrassingly-parallel in ``map_batches`` actors; the only shuffles are
the ``groupby`` over (band, key) buckets — rows shuffled are the SMALL
signature/bucket rows, never the corpus.  Candidate verification happens
inside the bucket group; quadratic blowup inside a hot bucket is bounded
by ``max_pairs_per_bucket`` (documented cap — silent truncation would
read as "covered everything").

Clustering the pair graph (``neardup_drop_ids``) has two strategies:
``driver`` union-find over the collected pair list (valid while pairs ≪
corpus — the common case), and ``distributed`` min-label propagation
(stages/cc.py) where nothing corpus-sized ever reaches the driver: the
pair Dataset feeds connected components directly, and only the
*drop*-set (non-representative cluster members) is collected/broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Min

from ..functions import hashing as hs
from ..functions.textstats import md5_fingerprint

_PAIR_SCHEMA = {"id_a": "int64", "id_b": "int64", "similarity": "float64"}
_PAIR_ARROW = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("similarity", pa.float64())]
)


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({k: pd.Series(dtype=v) for k, v in _PAIR_SCHEMA.items()})


def _round6(x: float) -> float:
    """Half-away-from-zero at 6 decimals — matches DuckDB ``round()`` so
    pair similarities are oracle-comparable (Python's ``round`` is
    half-to-even and diverges on e.g. k/128 signature fractions)."""
    return float(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5) / 1e6)


# --- exact -------------------------------------------------------------
def exact_dedup_ids(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Distinct-content representatives: min(id) per md5(text).
    Hash-partition groupby on the 32-byte fingerprint — the corpus text
    itself never shuffles (fingerprint computed map-side)."""

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [md5_fingerprint(t or "") for t in batch[text_col].to_pylist()]
        return pa.table({id_col: batch[id_col], "fp": pa.array(fps, pa.string())})

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )


# --- MinHash + LSH -----------------------------------------------------
class MinHasher:
    """Actor stage: doc → (band, key, id, signature[, text]) rows.
    Permutation params are module-level constants compiled at import —
    per-actor state per SURVEY.md §2.3.  Total over null text; null and
    empty documents emit NO signature rows (near-dup candidates need
    content — empties collapse under exact dedup instead)."""

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_perm: int = 128,
        n_bands: int = 16,
        shingle_k: int = 5,
        char_ngrams: int | None = None,
        carry_text: bool = False,
    ) -> None:
        self.id_col, self.text_col = id_col, text_col
        self.n_perm, self.n_bands = n_perm, n_bands
        self.shingle_k, self.char_n = shingle_k, char_ngrams
        self.carry_text = carry_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_band, out_key, out_id, out_sig, out_text = [], [], [], [], []
        for i, t in zip(ids, texts):
            t = t or ""
            if not t.split():
                # contentless (empty/whitespace-only) doc — skip BOTH
                # paths: char n-grams over runs of spaces would otherwise
                # still collide all-with-all (see rationale below)
                continue
            sh = (
                hs.char_ngrams(t, self.char_n)
                if self.char_n
                else hs.shingles(t, self.shingle_k)
            )
            if not sh:
                # contentless doc: no signature rows.  Emitting the
                # degenerate all-max signature would (a) pair every
                # empty doc with every other (jaccard(∅,∅)=1) — a
                # quadratic hot bucket at web scale where empties are
                # millions — and (b) diverge from the SQL oracle, which
                # has no grams for them.  Collapsing empties is exact
                # dedup's job (identical md5), not near-dup's.
                continue
            sig = hs.minhash_signature(sh, self.n_perm)
            keys = hs.lsh_band_keys(sig, self.n_bands)
            sig_list = sig.astype(np.int64).tolist()  # reinterpret for Arrow
            for band, key in enumerate(keys):
                out_band.append(band)
                out_key.append(key)
                out_id.append(i)
                out_sig.append(sig_list)
                if self.carry_text:
                    out_text.append(t)
        cols = {
            "band": pa.array(out_band, pa.int32()),
            "key": pa.array(out_key, pa.int64()),
            "id": pa.array(out_id, pa.int64()),
            "sig": pa.array(out_sig, pa.list_(pa.int64())),
        }
        if self.carry_text:
            cols["text"] = pa.array(out_text, pa.string())
        return pa.table(cols)


# Grouping millions of tiny LSH buckets directly through
# groupby().map_groups() pays a per-group invocation cost; instead we
# group by a COARSE bucket (key mod a prime) — same co-location
# guarantee, ~2 orders of magnitude fewer groups — and resolve the fine
# (band, key) buckets vectorized in pandas inside each coarse group.
_COARSE = 199


def _add_coarse(ds, src_col: str):
    def f(batch: pa.Table) -> pa.Table:
        vals = batch[src_col].to_numpy(zero_copy_only=False)
        coarse = (np.abs(vals) % _COARSE).astype(np.int32)
        return batch.append_column("coarse", pa.array(coarse, pa.int32()))

    return ds.map_batches(f, batch_format="pyarrow")


def _emit_budgeted_pairs(ids, sim_of, threshold: float, budget: int, rows: list) -> None:
    """Shared verification skeleton for every bucket family: i<j loop
    under the per-bucket pair budget, threshold on ``sim_of(i, j)``,
    emit (id_a, id_b, sim) half-away-rounded at 6 decimals."""
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if budget <= 0:
                return
            budget -= 1
            sim = sim_of(i, j)
            if sim >= threshold:
                rows.append((int(ids[i]), int(ids[j]), _round6(sim)))


def _coarse_group_fn(bucket_cols, one_bucket):
    """Wrap a per-fine-bucket emitter into the coarse-group map_groups
    callable (fixed pair schema, even when no pairs emit)."""

    def coarse_group(cg: pd.DataFrame) -> pd.DataFrame:
        rows: list = []
        for _, g in cg.groupby(bucket_cols, sort=True):
            one_bucket(g, rows)
        if not rows:
            return _empty_pairs()
        return pd.DataFrame(rows, columns=list(_PAIR_SCHEMA))

    return coarse_group


def _bucket_pairs_fn(threshold: float, max_pairs_per_bucket: int, exact_ngram: int | None):
    def one_bucket(g: pd.DataFrame, rows: list) -> None:
        if len(g) < 2:
            return
        g = g.sort_values("id").drop_duplicates("id")
        ids = g["id"].to_numpy()
        sigs = [np.asarray(s) for s in g["sig"]]
        texts = g["text"].tolist() if "text" in g.columns else None
        if exact_ngram is not None and texts is not None:
            grams = [hs.char_ngrams(t, exact_ngram) for t in texts]
            sim_of = lambda i, j: hs.jaccard(grams[i], grams[j])  # noqa: E731
        else:
            sim_of = lambda i, j: float(np.mean(sigs[i] == sigs[j]))  # noqa: E731
        _emit_budgeted_pairs(ids, sim_of, threshold, max_pairs_per_bucket, rows)

    return _coarse_group_fn(["band", "key"], one_bucket)


def _dedupe_pairs(pairs_ds):
    """Drop duplicate (id_a, id_b) pairs found via multiple bands.
    Coarse-grouped by id_a so the shuffle moves only pair rows."""

    def dd(cg: pd.DataFrame) -> pd.DataFrame:
        return cg.drop_duplicates(["id_a", "id_b"])[list(_PAIR_SCHEMA)]

    return _add_coarse(pairs_ds, "id_a").groupby("coarse").map_groups(
        dd, batch_format="pandas"
    )


def normalize_pairs(pairs_ds):
    """Cast every block to the canonical (id_a, id_b, similarity) Arrow
    schema — distributed, no driver round-trip.  Downstream Dataset ops
    (union/join in connected components) require block-schema equality;
    hash-aggregated outputs can disagree on nullability/empties."""

    def cast(b: pa.Table) -> pa.Table:
        return b.select(_PAIR_ARROW.names).cast(_PAIR_ARROW)

    return pairs_ds.map_batches(cast, batch_format="pyarrow")


def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_perm: int = 128,
    n_bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    max_pairs_per_bucket: int = 200,
    concurrency=None,
    batch_size: int = 1024,
):
    """Near-dup candidate pairs (id_a < id_b, estimated Jaccard ≥
    threshold) via banded MinHash-LSH (MMDS ch.3).  Similarity is
    estimated from signature agreement — texts never shuffle."""
    kwargs = dict(
        id_col=id_col, text_col=text_col, n_perm=n_perm,
        n_bands=n_bands, shingle_k=shingle_k,
    )
    if concurrency is None:
        band_rows = ds.map_batches(
            MinHasher(**kwargs), batch_format="pyarrow", batch_size=batch_size
        )
    else:
        band_rows = ds.map_batches(
            MinHasher, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
            batch_size=batch_size, concurrency=concurrency, num_cpus=1,
        )
    pairs = _add_coarse(band_rows, "key").groupby("coarse").map_groups(
        _bucket_pairs_fn(threshold, max_pairs_per_bucket, None),
        batch_format="pandas",
    )
    return _dedupe_pairs(pairs)


def ngram_jaccard_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    ngram: int = 3,
    threshold: float = 0.8,
    n_perm: int = 64,
    n_bands: int = 8,
    max_pairs_per_bucket: int = 200,
):
    """Exact char-n-gram Jaccard pairs, LSH-bucketed for candidate
    generation (texts are carried into buckets for exact verification —
    acceptable because buckets hold only collision candidates)."""
    band_rows = ds.map_batches(
        MinHasher(
            id_col=id_col, text_col=text_col, n_perm=n_perm, n_bands=n_bands,
            char_ngrams=ngram, carry_text=True,
        ),
        batch_format="pyarrow",
    )
    pairs = _add_coarse(band_rows, "key").groupby("coarse").map_groups(
        _bucket_pairs_fn(threshold, max_pairs_per_bucket, ngram),
        batch_format="pandas",
    )
    return _dedupe_pairs(pairs)


def neardup_drop_ids_dataset(pairs_ds):
    """Fully Dataset-shaped drop-set: pair Dataset → connected-component
    labels (stages/cc.py) → ids where id ≠ label (non-representative
    cluster members).  Never collected — compose with ``anti_join_ids``
    for corpora where even the drop-set outgrows a driver broadcast.
    Returns None when there are no pairs (nothing to drop)."""
    from .cc import connected_component_labels

    pairs_m = normalize_pairs(pairs_ds).materialize()  # pair rows ≪ corpus
    if pairs_m.count() == 0:
        return None

    def flat(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": pa.concat_arrays(
                    [b["id_a"].combine_chunks(), b["id_b"].combine_chunks()]
                )
            }
        )

    nodes = (
        pairs_m.map_batches(flat, batch_format="pyarrow")
        .groupby("id")
        .aggregate(Count(alias_name="n"))
        .select_columns(["id"])
    )
    labels = connected_component_labels(nodes, pairs_m, id_col="id")
    return labels.map_batches(
        lambda b: b.filter(pc.not_equal(b["id"], b["label"])).select(["id"]),
        batch_format="pyarrow",
    )


def neardup_drop_ids(pairs_ds, *, strategy: str = "driver") -> pd.DataFrame:
    """Cluster a near-dup pair Dataset (from ANY pair family above) and
    return the ids to DROP — every cluster member except the min-id
    representative.  The drop-set is the small side of dedup (≈ number
    of duplicate documents, not corpus size), so it is the right thing
    to collect/broadcast; ids in no pair are trivially kept and never
    touch this function's output.

    ``strategy="driver"``: union-find over the collected pair list.
    ``strategy="distributed"``: min-label propagation over the pair
    Dataset (stages/cc.py) — the 10^12-row path; the pair list itself
    never materializes on the driver, only the final drop-set does.
    (For dup-heavy corpora where even the drop-set is huge, anti-join
    the labels against the corpus with ``stages.joins.bucketed_hash_join``
    instead of collecting — same labels Dataset feeds both.)"""
    if strategy == "distributed":
        drop_ds = neardup_drop_ids_dataset(pairs_ds)
        if drop_ds is None:
            return pd.DataFrame({"id": pd.Series(dtype="int64")})
        drop = drop_ds.to_pandas()
        return drop.sort_values("id").reset_index(drop=True)

    pairs = pairs_ds.to_pandas()
    if pairs.empty or "id_a" not in pairs.columns:
        return pd.DataFrame({"id": pd.Series(dtype="int64")})
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    drop = sorted(x for x in parent if find(x) != x)
    return pd.DataFrame({"id": pd.Series(drop, dtype="int64")})


def anti_join_ids(ds, drop_ds, id_col: str = "doc_id", num_buckets: int | None = None,
                  drop_col: str | None = None, bloom_bits: int | None = None):
    """Distributed anti-semi-join: remove from ``ds`` every row whose
    ``id_col`` appears in ``drop_ds`` (a Dataset whose id column is
    ``drop_col``, default ``id_col`` — ``neardup_drop_ids_dataset``
    emits ``id``) — NOTHING is collected or broadcast.  This is the
    dedup path for dup-heavy corpora where even the drop-set outgrows a
    broadcast: both sides bucket by id hash (the only shuffle), and each
    bucket filters its corpus rows against its bucket-local drop ids.

    ``bloom_bits`` (optional, e.g. ``1 << 22`` = 512 KiB): build a
    Bloom filter over the drop ids and route the bloom-negative corpus
    rows — definitely not dropped, no false negatives — straight to the
    output, so only ``|drops| + FPR·|corpus|`` rows enter the exchange
    instead of the whole corpus.  Trade-off (explicit, per the
    single-scan rule): the corpus dataset is consumed by TWO branches;
    for a parquet-backed ``ds`` that is two embarrassingly-parallel
    reads in exchange for eliminating ~all of an all-to-all shuffle —
    the right trade at 100 TB — but for an expensive derived pipeline,
    checkpoint ``ds`` first (cf. ``training_data._checkpoint``) or skip
    the bloom.  Result is exact either way (bloom-positive rows get the
    same per-bucket verify).

    The common case (drop-set ≪ corpus) should prefer the broadcast
    filter in ``pipelines/training_data.py`` — one ``ray.put`` beats a
    corpus-wide shuffle."""
    from .joins import _default_num_buckets, _tagged_bucket_union

    if num_buckets is None:
        num_buckets = _default_num_buckets()
    src_col = drop_col or id_col
    drop_only = drop_ds.map_batches(
        lambda b: pa.table({id_col: b[src_col].cast(pa.int64())}),
        batch_format="pyarrow",
    )

    if bloom_bits:
        import ray

        from .bloom import build_bloom

        # pinned: the bloom build AND the exact exchange below both
        # consume drop_only — left lazy, the drop-set derivation (often
        # a CC/labels pipeline) re-executes
        drop_only = drop_only.materialize()
        bloom_ref = ray.put(build_bloom(drop_only, id_col, num_bits=bloom_bits))

        def bloom_negative(batch: pa.Table) -> pa.Table:
            mask = ray.get(bloom_ref).contains(
                batch[id_col].to_numpy(zero_copy_only=False))
            return batch.filter(pa.array(~mask))

        def bloom_positive(batch: pa.Table) -> pa.Table:
            mask = ray.get(bloom_ref).contains(
                batch[id_col].to_numpy(zero_copy_only=False))
            return batch.filter(pa.array(mask))

        definite_keep = ds.map_batches(bloom_negative, batch_format="pyarrow")
        exact = anti_join_ids(
            ds.map_batches(bloom_positive, batch_format="pyarrow"),
            drop_only, id_col=id_col, num_buckets=num_buckets,
        )
        return definite_keep.union(exact)
    tagged, lschema, _ = _tagged_bucket_union(
        ds, drop_only, id_col, id_col, num_buckets,
        rschema=pa.schema([(id_col, pa.int64())]),  # drop side is known
    )
    out_names = list(lschema.names)

    def anti(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g["__side"], "l")
        lg = g.filter(lmask).select(out_names)
        drop_ids = g.filter(pc.invert(lmask))[id_col]
        if drop_ids.length() == 0:
            return lg
        return lg.filter(pc.invert(pc.is_in(lg[id_col], value_set=drop_ids.combine_chunks())))

    return tagged.groupby("__bucket").map_groups(anti, batch_format="pyarrow")


def minhash_dedup_keep_ids(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "driver",
    **kw,
):
    """Near-dup dedup: cluster candidate pairs and keep the min id per
    cluster.  Returns the sorted keep-id list as a pandas DataFrame
    (the *collection* is this function's contract — pipelines that must
    stay distributed use ``neardup_drop_ids`` + a broadcast anti-filter
    instead, see ``pipelines/training_data.py``).

    Both strategies are Dataset-shaped up to the final small result:
    the corpus is filtered distributedly against the broadcast drop-set;
    the driver only ever holds pair rows (``driver``) or the drop-set
    (``distributed``)."""
    pairs = minhash_lsh_pairs(ds, id_col=id_col, text_col=text_col, **kw)
    drop_df = neardup_drop_ids(pairs, strategy=strategy)
    drop_arr = pa.array(drop_df["id"].to_numpy(dtype="int64"), pa.int64())

    def keep_filter(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.invert(pc.is_in(b[id_col], value_set=drop_arr))
        ).select([id_col])

    out = (
        ds.select_columns([id_col])
        .map_batches(keep_filter, batch_format="pyarrow")
        .to_pandas()
    )
    return (
        out.sort_values(id_col)
        .reset_index(drop=True)
        .astype({id_col: "int64"})
    )


# --- SimHash -----------------------------------------------------------
class SimHasher:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text", n_bands: int = 4):
        self.id_col, self.text_col, self.n_bands = id_col, text_col, n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out = {"band": [], "key": [], "id": [], "sh": []}
        width = 64 // self.n_bands
        mask = (1 << width) - 1
        for i, t in zip(ids, texts):
            t = t or ""
            if not t.split():
                continue  # contentless doc — same rationale as MinHasher
            sh = hs.simhash64(t)
            signed = sh - (1 << 64) if sh >= (1 << 63) else sh
            for band in range(self.n_bands):
                out["band"].append(band)
                out["key"].append((sh >> (band * width)) & mask)
                out["id"].append(i)
                out["sh"].append(signed)
        return pa.table(
            {
                "band": pa.array(out["band"], pa.int32()),
                "key": pa.array(out["key"], pa.int64()),
                "id": pa.array(out["id"], pa.int64()),
                "sh": pa.array(out["sh"], pa.int64()),
            }
        )


def simhash_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_hamming: int = 3,
    n_bands: int | None = None,
    max_pairs_per_bucket: int = 200,
):
    """SimHash near-dup pairs: band-equality candidates verified by
    exact hamming distance.  By pigeonhole, a pair within hamming ≤ h
    is guaranteed a shared band iff n_bands ≥ h+1 — so the default
    picks the smallest 64-divisor band count ≥ max_hamming+1 (no
    silent recall loss)."""
    if n_bands is None:
        n_bands = next(d for d in (2, 4, 8, 16, 32) if d >= max_hamming + 1)
    threshold = float(64 - max_hamming) / 64.0  # sim ≥ thr ⟺ hamming ≤ h

    def one_bucket(g: pd.DataFrame, rows: list) -> None:
        if len(g) < 2:
            return
        g = g.sort_values("id").drop_duplicates("id")
        ids = g["id"].to_numpy()
        shs = [int(s) & ((1 << 64) - 1) for s in g["sh"]]
        sim_of = lambda i, j: float(64 - hs.hamming64(shs[i], shs[j])) / 64.0  # noqa: E731
        _emit_budgeted_pairs(ids, sim_of, threshold, max_pairs_per_bucket, rows)

    band_rows = ds.map_batches(
        SimHasher(id_col=id_col, text_col=text_col, n_bands=n_bands),
        batch_format="pyarrow",
    )
    pairs = _add_coarse(band_rows, "key").groupby("coarse").map_groups(
        _coarse_group_fn(["band", "key"], one_bucket), batch_format="pandas"
    )
    return _dedupe_pairs(pairs)


# --- embedding cosine near-dup ----------------------------------------
class HyperplaneBucketer:
    """Actor stage: vector → sign-pattern LSH bucket key (Charikar
    2002).  The seeded hyperplane matrix is built ONCE per actor in
    ``__init__`` (when ``dim`` is given) or on the first batch (dim
    inferred) — never per batch: at real embedding dims (1k-4k) a
    per-batch ``standard_normal((dim, n_planes))`` rebuild is a
    measurable pure-overhead tax on the hot path.  Seed is fixed →
    identical keys across actors, runs, and processes."""

    _SEED = 4801

    def __init__(self, id_col: str, vec_col: str, n_planes: int,
                 dim: int | None = None) -> None:
        self.id_col, self.vec_col, self.n_planes = id_col, vec_col, n_planes
        self._planes = self._build(dim) if dim else None

    def _build(self, dim: int) -> np.ndarray:
        return np.random.RandomState(self._SEED).standard_normal((dim, self.n_planes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .util import list_column_to_matrix

        vecs = list_column_to_matrix(batch[self.vec_col])
        dim = vecs.shape[1] if vecs.ndim == 2 else 0
        if self._planes is None or self._planes.shape[0] != dim:
            self._planes = self._build(dim)
        signs = (vecs @ self._planes) >= 0
        keys = signs.dot(1 << np.arange(self.n_planes)).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "id": batch[self.id_col],
                "vec": batch[self.vec_col],
            }
        )


def embedding_neardup_pairs(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
    n_planes: int = 12,
    max_pairs_per_bucket: int = 500,
    dim: int | None = None,
    concurrency=None,
):
    """Embedding near-dup via random-hyperplane LSH (Charikar 2002):
    sign-pattern bucket key, exact cosine verification inside buckets.
    The hyperplane matrix is seeded → stable across runs/processes, and
    held as per-actor state (``HyperplaneBucketer``)."""

    def one_bucket(g: pd.DataFrame, rows: list) -> None:
        if len(g) < 2:
            return
        g = g.sort_values("id").drop_duplicates("id")
        ids = g["id"].to_numpy()
        vecs = np.array([np.asarray(v, dtype=np.float64) for v in g["vec"]])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        sims = unit @ unit.T
        sim_of = lambda i, j: float(sims[i, j])  # noqa: E731
        _emit_budgeted_pairs(ids, sim_of, threshold, max_pairs_per_bucket, rows)

    kwargs = dict(id_col=id_col, vec_col=vec_col, n_planes=n_planes, dim=dim)
    if concurrency is None:
        buckets = ds.map_batches(HyperplaneBucketer(**kwargs), batch_format="pyarrow")
    else:
        buckets = ds.map_batches(
            HyperplaneBucketer, fn_constructor_kwargs=kwargs,
            batch_format="pyarrow", concurrency=concurrency, num_cpus=1,
        )
    pairs = _add_coarse(buckets, "key").groupby("coarse").map_groups(
        _coarse_group_fn(["key"], one_bucket), batch_format="pandas"
    )
    return _dedupe_pairs(pairs)


def url_dedup_ids(ds, id_col: str = "doc_id", url_col: str = "url"):
    """Canonical-URL dedup: min(id) per ``canonical_url(url)`` — the
    crawl-side complement of content dedup (catches utm/fragment/port
    variants of one page even when the body carries per-request noise).
    Same scale shape as ``exact_dedup_ids``: the canonical key is
    computed map-side and only (id, key) pairs shuffle."""
    from ..functions.urltools import canonical_url

    def add_key(batch: pa.Table) -> pa.Table:
        keys = [canonical_url(u) for u in batch[url_col].to_pylist()]
        return pa.table({id_col: batch[id_col], "curl": pa.array(keys, pa.string())})

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("curl")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )

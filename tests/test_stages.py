"""Unit tests for dedup / similarity / text-analysis / multimodal
stages and their kernels (SURVEY.md §5.3 + training-data additions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from occular_ocr_ray.functions import hashing as hs
from occular_ocr_ray.functions import textstats as ts

pytestmark = pytest.mark.usefixtures("ray_session")


# --- kernels (no Ray needed, but session shared anyway) ---------------
def test_minhash_estimates_jaccard():
    a = hs.shingles("the quick brown fox jumps over the lazy dog " * 20, 5)
    # ~10% token perturbation
    b = hs.shingles(
        ("the quick brown fox jumps over the lazy dog " * 18
         + "a very different tail sentence here now ok " * 2), 5)
    true_j = hs.jaccard(a, b)
    est = float(np.mean(hs.minhash_signature(a) == hs.minhash_signature(b)))
    assert abs(est - true_j) < 0.15
    assert hs.jaccard(a, a) == 1.0
    assert hs.jaccard(set(), set()) == 1.0 and hs.jaccard(a, set()) == 0.0


def test_minhash_signature_stable_and_bands():
    sh = hs.shingles("alpha beta gamma delta epsilon zeta eta theta", 3)
    s1, s2 = hs.minhash_signature(sh), hs.minhash_signature(sh)
    assert np.array_equal(s1, s2)
    k1, k2 = hs.lsh_band_keys(s1), hs.lsh_band_keys(s2)
    assert k1 == k2 and len(k1) == 16


def test_simhash_near_and_far():
    base = "ray data streaming execution with arrow blocks " * 10
    near = base.replace("arrow", "arrows", 1)
    far = "completely unrelated content about cooking recipes and food " * 10
    d_near = hs.hamming64(hs.simhash64(base), hs.simhash64(near))
    d_far = hs.hamming64(hs.simhash64(base), hs.simhash64(far))
    assert d_near < d_far
    assert d_near <= 12 and d_far > 12
    assert hs.simhash64("") == 0


def test_textstats_kernels():
    assert ts.token_count("a b  c") == 3 and ts.token_count("") == 0
    assert ts.bpe_ish_token_count("don't stop!") == 5  # don ' t stop !
    assert ts.lang_id("the cat and the dog sat on the mat") == "en"
    assert ts.lang_id("der Hund und die Katze sind nicht im Haus") == "de"
    assert ts.lang_id("и вот не на что это было") == "ru"
    assert ts.lang_id("") == "und" and ts.lang_id("zzz qqq") == "und"
    q_good = ts.quality_score("The quick brown fox jumps over the lazy dog. " * 30)
    q_junk = ts.quality_score("!!! ??? *** ### @@@ %%% ^^^ &&& " * 10)
    assert 0.0 <= q_junk < q_good <= 1.0
    assert ts.quality_score("") == 0.0
    assert ts.md5_fingerprint("abc") == "900150983cd24fb0d6963f7d28e17f72"
    assert ts.rolling_fingerprint("x" * 200) == ts.rolling_fingerprint("x" * 200)


# --- dedup stages ------------------------------------------------------
def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


BASE = "the quick brown fox jumps over the lazy dog near the river bank " * 8


def test_exact_dedup_ids():
    from occular_ocr_ray.stages.dedup import exact_dedup_ids

    ds = _docs_ds([(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "bbb")])
    keep = sorted(exact_dedup_ids(ds).to_pandas()["doc_id"])
    assert keep == [1, 2, 4]


def test_minhash_lsh_finds_neardups():
    from occular_ocr_ray.stages.dedup import minhash_dedup_keep_ids, minhash_lsh_pairs

    # a long non-repetitive doc: a one-word edit keeps Jaccard ≈ 0.92,
    # solidly above the banded-LSH detection threshold
    wide = " ".join(f"token{i} filler{i % 7}" for i in range(60))
    rows = [
        (1, wide),
        (2, wide.replace("token30", "tokenX", 1)),  # near-dup of 1 (J ≈ 0.9)
        (3, "totally different text about databases and query planners " * 8),
        (4, wide),  # exact dup of 1
    ]
    pairs = minhash_lsh_pairs(_docs_ds(rows), threshold=0.6).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (1, 4) in got and (1, 2) in got and (2, 4) in got
    assert not any(3 in p for p in got)
    keep = minhash_dedup_keep_ids(_docs_ds(rows), threshold=0.6)["doc_id"].tolist()
    assert keep == [1, 3]


def test_simhash_pairs_stage():
    from occular_ocr_ray.stages.dedup import simhash_pairs

    rows = [
        (1, BASE),
        (2, BASE.replace("lazy", "sleepy", 1)),
        (3, "unrelated corpus text on astronomy stars galaxies planets " * 8),
    ]
    pairs = simhash_pairs(_docs_ds(rows), max_hamming=8).to_pandas()
    got = {(a, b) for a, b in zip(pairs.get("id_a", []), pairs.get("id_b", []))}
    assert (1, 2) in got and not any(3 in p for p in got)


def test_ngram_jaccard_stage():
    from occular_ocr_ray.stages.dedup import ngram_jaccard_pairs

    rows = [(1, BASE), (2, BASE + " extra tail"), (3, "zebra xylophone quartz " * 10)]
    pairs = ngram_jaccard_pairs(_docs_ds(rows), threshold=0.8).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert got == {(1, 2)}
    # similarity column is the exact n-gram jaccard (repeated text has
    # few distinct 3-grams, so a short tail still dilutes noticeably)
    assert pairs["similarity"].iloc[0] > 0.8


def test_embedding_neardup_stage():
    import ray.data as rd

    from occular_ocr_ray.stages.dedup import embedding_neardup_pairs

    rng = np.random.RandomState(0)
    base = rng.standard_normal(32).astype(np.float32)
    rows = []
    for i in range(6):
        v = base + rng.standard_normal(32).astype(np.float32) * 0.01  # tight cluster
        rows.append({"vec_id": i, "embedding": v.tolist()})
    for i in range(6, 12):
        rows.append({"vec_id": i, "embedding": rng.standard_normal(32).tolist()})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    pairs = embedding_neardup_pairs(ds, threshold=0.98).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got or (0, 2) in got  # cluster members pair up
    assert all(a < 6 and b < 6 for a, b in got)


# --- similarity --------------------------------------------------------
def test_knn_bruteforce_exact():
    import ray.data as rd

    from occular_ocr_ray.stages.similarity import knn_bruteforce

    rng = np.random.RandomState(1)
    mat = rng.standard_normal((50, 16))
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(50)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = knn_bruteforce(ds, query_ids=[0], k=3).to_pandas()
    # numpy ground truth
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = unit @ unit[0]
    sims[0] = -np.inf
    expect = list(np.argsort(-sims)[:3])
    assert out["neighbor_id"].tolist() == expect
    assert out["rank"].tolist() == [1, 2, 3]
    # unknown query ids fail with a clear message, not a KeyError from
    # the schema-less empty filter result
    with pytest.raises(ValueError, match="query ids"):
        knn_bruteforce(ds, query_ids=[9999], k=3)


def test_knn_ivf_reasonable_recall(tmp_path):
    import ray.data as rd

    from occular_ocr_ray.stages.similarity import knn_bruteforce, knn_ivf

    rng = np.random.RandomState(2)
    mat = rng.standard_normal((200, 16))
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(200)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    exact = knn_bruteforce(ds, query_ids=[0, 1], k=5).to_pandas()
    approx = knn_ivf(ds, query_ids=[0, 1], k=5, n_clusters=8, nprobe=4,
                     index_dir=str(tmp_path / "ivf")).to_pandas()
    e = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    a = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
    assert len(e & a) / len(e) >= 0.5  # recall with half the buckets probed
    # the persisted index holds the same recall guarantee under reuse
    from occular_ocr_ray.stages.similarity import query_ivf

    again = query_ivf(str(tmp_path / "ivf"), [0, 1], k=5, nprobe=4).to_pandas()
    assert set(map(tuple, again[["query_id", "neighbor_id"]].values)) == a


def test_ivf_index_build_once_query_many(tmp_path):
    """Persistent IVF: one build serves many query batches (no refit,
    no full rescan), results equal the one-shot path, and the probe
    scan opens only cluster partitions."""
    import os

    import ray.data as rd

    from occular_ocr_ray.stages.similarity import (
        build_ivf_index, knn_ivf, query_ivf,
    )

    rng = np.random.RandomState(5)
    mat = rng.standard_normal((150, 12))
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(150)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(ds, idx, n_clusters=6)
    assert meta["n_clusters"] == 6
    parts = [d for d in os.listdir(os.path.join(idx, "data"))
             if d.startswith("cluster=")]
    assert 1 < len(parts) <= 6  # hive layout, empty clusters omitted

    cent_mtime = os.path.getmtime(os.path.join(idx, "centroids.npy"))
    a = query_ivf(idx, [0, 1], k=4, nprobe=3).to_pandas()
    b = query_ivf(idx, [7, 9], k=4, nprobe=3).to_pandas()  # second batch
    assert sorted(b["query_id"].unique()) == [7, 9]
    # composition equals the one-shot entry point on a prebuilt index
    c = knn_ivf(ds, [0, 1], k=4, n_clusters=6, nprobe=3,
                index_dir=idx).to_pandas()
    assert a.equals(c)
    # ... and nothing rebuilt the index along the way
    assert os.path.getmtime(os.path.join(idx, "centroids.npy")) == cent_mtime


# --- text analysis stage ----------------------------------------------
def test_analyze_documents_stage(sf_dir):
    import ray.data as rd

    from occular_ocr_ray.stages.text_analysis import analyze_documents

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = analyze_documents(ds, concurrency=2).limit(50).to_pandas()
    assert {"n_tokens", "n_bpe_tokens", "pred_lang", "quality", "fp_md5", "fp_rolling"} <= set(out.columns)
    assert (out["quality"].between(0, 1)).all()
    assert (out["n_tokens"] > 0).all()


# --- multimodal --------------------------------------------------------
def test_media_decode_and_frame_sample():
    import ray.data as rd

    from occular_ocr_ray.stages.multimodal import (
        FrameSample,
        MediaDecode,
        decode_media,
        decode_dataset,
        encode_fake_media,
    )

    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n...")  # real codec → stub boundary

    payload = bytes(range(200))
    rows = [
        {"media_id": 0, "media": encode_fake_media(0, 64, 48, 1, payload)},
        {"media_id": 1, "media": encode_fake_media(2, 320, 240, 20, payload * 20)},
        {"media_id": 2, "media": b"not-a-container"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    meta = decode_dataset(ds).to_pandas().sort_values("media_id")
    assert meta.loc[meta["media_id"] == 0, "width"].iloc[0] == 64
    assert meta.loc[meta["media_id"] == 2, "width"].isna().all()  # poison-pill → nulls
    # strict mode raises
    with pytest.raises(Exception):
        ds.map_batches(
            MediaDecode, fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow", concurrency=1,
        ).materialize()
    frames = (
        ds.map_batches(FrameSample(stride=5), batch_format="pyarrow")
        .to_pandas()
    )
    assert set(frames["media_id"]) == {1}
    assert frames["frame_index"].tolist() == [0, 5, 10, 15]


def test_media_resize_and_feature_extract():
    """Resize rewrites the container with target dims and an
    area-proportional byte budget (deterministic); FeatureExtract emits
    a unit-norm list<float32> the ANN stages can consume; both pass
    non-fake payloads through un-poisoned."""
    import numpy as np
    import ray.data as rd

    from occular_ocr_ray.stages.multimodal import (
        FeatureExtract,
        Resize,
        decode_media,
        encode_fake_media,
    )

    payload = bytes(range(256)) * 4  # 1024 bytes at 64x48
    rows = [
        {"media_id": 0, "media": encode_fake_media(0, 64, 48, 1, payload)},
        {"media_id": 1, "media": b"not-a-container"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = (ds.map_batches(Resize(target_w=32, target_h=24),
                          batch_format="pyarrow")
           .to_pandas().sort_values("media_id"))
    meta = decode_media(out["media"].iloc[0])
    assert (meta["width"], meta["height"]) == (32, 24)
    # byte budget scales with the area ratio: 1024 * (32*24)/(64*48) = 256
    assert meta["n_bytes"] == 256
    assert out["media"].iloc[1] == b"not-a-container"  # pass-through
    # determinism: same input → same container bytes
    out2 = (ds.map_batches(Resize(target_w=32, target_h=24),
                           batch_format="pyarrow")
            .to_pandas().sort_values("media_id"))
    assert out2["media"].iloc[0] == out["media"].iloc[0]
    # strict mode raises on the non-fake payload
    with pytest.raises(Exception):
        ds.map_batches(Resize, fn_constructor_kwargs={"strict": True},
                       batch_format="pyarrow", concurrency=1).materialize()

    feats = (ds.map_batches(FeatureExtract(dim=64), batch_format="pyarrow")
             .to_pandas().sort_values("media_id"))
    v = np.asarray(feats["embedding"].iloc[0], dtype=np.float32)
    assert v.shape == (64,) and abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    # uniform payload bytes → uniform folded histogram
    assert np.allclose(v, v[0])


# --- HLL sketch --------------------------------------------------------
def test_hll_kernel_accuracy():
    import numpy as np

    from occular_ocr_ray.functions import sketches as sk

    for true_n in (10, 500, 20000):
        reg = sk.hll_create(12)
        sk.hll_add(reg, [f"item-{i}" for i in range(true_n)])
        est = sk.hll_estimate(reg)
        assert abs(est - true_n) / true_n < 0.06, (true_n, est)
    # mergeability: sketch(A) ∪ sketch(B) == sketch(A∪B)
    a, b_, u = sk.hll_create(12), sk.hll_create(12), sk.hll_create(12)
    items_a = [f"x{i}" for i in range(1000)]
    items_b = [f"x{i}" for i in range(500, 1500)]
    sk.hll_add(a, items_a); sk.hll_add(b_, items_b); sk.hll_add(u, items_a + items_b)
    assert np.array_equal(sk.hll_merge(a, b_), u)


def test_approx_distinct_stage(sf_dir):
    import duckdb
    import ray.data as rd

    from occular_ocr_ray.stages.sketch_agg import approx_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    approx = approx_distinct(ds, "event_type", "user_id", batch_size=256)
    exact = duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS n FROM "
        f"read_parquet('{sf_dir}/events.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchdf()
    assert list(approx["event_type"]) == list(exact["event_type"])
    for got, want in zip(approx["approx_distinct"], exact["n"]):
        assert abs(got - want) / max(1, want) < 0.08, (got, want)


# --- distributed connected components ---------------------------------
def test_connected_components_matches_union_find():
    import ray.data as rd

    from occular_ocr_ray.stages.cc import connected_component_labels, keep_ids_from_labels

    # graph: {1,2,3} chained, {5,6} pair, {9} singleton, {10,11,12} star
    ids = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2, 3, 5, 6, 9, 10, 11, 12], pa.int64())}))
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([1, 2, 5, 10, 10], pa.int64()),
        "id_b": pa.array([2, 3, 6, 11, 12], pa.int64()),
    }))
    labels = connected_component_labels(ids, pairs).to_pandas().sort_values("doc_id")
    assert dict(zip(labels["doc_id"], labels["label"])) == {
        1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9, 10: 10, 11: 10, 12: 10,
    }
    keep = keep_ids_from_labels(connected_component_labels(ids, pairs))
    assert keep["doc_id"].tolist() == [1, 5, 9, 10]


def test_connected_components_deep_chain():
    """Chain of length 8 needs multiple propagation rounds."""
    import ray.data as rd

    from occular_ocr_ray.stages.cc import connected_component_labels

    n = 8
    ids = rd.from_arrow(pa.table({"doc_id": pa.array(list(range(n)), pa.int64())}))
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array(list(range(n - 1)), pa.int64()),
        "id_b": pa.array(list(range(1, n)), pa.int64()),
    }))
    labels = connected_component_labels(ids, pairs).to_pandas()
    assert set(labels["label"]) == {0}


def test_connected_components_pointer_doubling_logarithmic_rounds():
    """Diameter-16 chain: plain hash-min moves the min ONE hop per round
    (needs 16 rounds), pointer doubling squares the compression distance
    past warmup, so the same chain resolves — and detects convergence —
    in O(log d) rounds."""
    import ray.data as rd

    from occular_ocr_ray.stages.cc import connected_component_labels

    n = 17
    ids = rd.from_arrow(pa.table({"doc_id": pa.array(list(range(n)), pa.int64())}))
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array(list(range(n - 1)), pa.int64()),
        "id_b": pa.array(list(range(1, n)), pa.int64()),
    }))
    # plain propagation after 3 rounds: the tail is still >3 hops from 0
    plain = connected_component_labels(
        ids, pairs, max_rounds=3, doubling_after=10**9, num_buckets=8
    ).to_pandas()
    assert set(plain["label"]) != {0}
    # with doubling (default): reach 1,2 warmup then 6,14,30 → labels all
    # 0 after round 5, stable-sum detection on round 6
    stats: dict = {}
    doubled = connected_component_labels(
        ids, pairs, num_buckets=8, stats=stats
    ).to_pandas()
    assert set(doubled["label"]) == {0}
    assert stats["rounds"] <= 7, stats


def test_minhash_dedup_strategies_agree():
    from occular_ocr_ray.stages.dedup import minhash_dedup_keep_ids

    wide = " ".join(f"token{i} filler{i % 7}" for i in range(60))
    rows = [
        (1, wide),
        (2, wide.replace("token30", "tokenX", 1)),
        (3, "totally different text about databases and query planners " * 8),
        (4, wide),
        (7, "another unrelated document about oceanography and tides " * 8),
    ]
    a = minhash_dedup_keep_ids(_docs_ds(rows), threshold=0.6, strategy="driver")
    b = minhash_dedup_keep_ids(_docs_ds(rows), threshold=0.6, strategy="distributed")
    assert a["doc_id"].tolist() == b["doc_id"].tolist() == [1, 3, 7]


def test_minhash_dedup_hash_range_ids_and_null_text():
    """Hash-derived ids ≥ 2^53 must survive the distributed CC path
    exactly (regression: a pandas bucket join coerced null-padded int64
    to float64 and corrupted them), and null text must hash as the empty
    document instead of raising."""
    from occular_ocr_ray.stages.dedup import minhash_dedup_keep_ids

    big = (1 << 62) - 11
    wide = " ".join(f"token{i} filler{i % 7}" for i in range(60))
    rows = [(big, wide), (big - 1, wide), (5, "short solo document " * 20), (6, None)]
    a = minhash_dedup_keep_ids(_docs_ds(rows), threshold=0.6, strategy="driver")
    b = minhash_dedup_keep_ids(_docs_ds(rows), threshold=0.6, strategy="distributed")
    assert a["doc_id"].tolist() == b["doc_id"].tolist() == [5, 6, big - 1]


def test_neardup_drop_ids_empty_pairs():
    """No candidate pairs → empty drop-set on both strategies."""
    import ray.data as rd

    from occular_ocr_ray.stages.dedup import neardup_drop_ids

    pairs = rd.from_arrow(
        pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                  "similarity": pa.array([], pa.float64())})
    )
    assert neardup_drop_ids(pairs, strategy="driver").empty
    assert neardup_drop_ids(pairs, strategy="distributed").empty


def test_anti_join_ids_matches_broadcast_filter():
    """Distributed anti-semi-join drops exactly the drop-set rows,
    including ids ≥ 2^53, matching a driver-side filter."""
    import ray.data as rd

    from occular_ocr_ray.stages.dedup import anti_join_ids

    big = (1 << 62) - 3
    ids = [big, big - 1, 1, 2, 3, 4, 5]
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "payload": pa.array([f"p{i}" for i in range(len(ids))], pa.string()),
    }))
    drop = rd.from_arrow(pa.table({"doc_id": pa.array([big - 1, 2, 5], pa.int64())}))
    out = anti_join_ids(corpus, drop, id_col="doc_id").to_pandas()
    assert sorted(out["doc_id"]) == sorted([big, 1, 3, 4])
    assert set(out.columns) == {"doc_id", "payload"}
    # empty drop side → passthrough
    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    out2 = anti_join_ids(corpus, empty, id_col="doc_id").to_pandas()
    assert sorted(out2["doc_id"]) == sorted(ids)


def test_chunk_token_windows_kernel():
    from occular_ocr_ray.functions.textstats import chunk_token_windows

    assert chunk_token_windows("") == [] and chunk_token_windows(None) == []
    toks = " ".join(f"w{i}" for i in range(200))
    ch = chunk_token_windows(toks, 64, 48)
    # full coverage, deterministic indices, overlap = max_tokens - stride
    assert [c[0] for c in ch] == list(range(len(ch)))
    covered = []
    for _, c, n in ch:
        assert n == len(c.split())
        covered.extend(c.split())
    assert set(covered) == set(toks.split())
    assert ch[0][1].split()[48:] == ch[1][1].split()[:16]  # 16-token overlap
    # exact-fit boundary: window reaching the end stops the loop
    assert len(chunk_token_windows(" ".join(["x"] * 112), 64, 48)) == 2
    with pytest.raises(ValueError):
        chunk_token_windows("a b", 4, 9)


def test_chunk_documents_stage():
    from occular_ocr_ray.stages.text_analysis import chunk_documents

    rows = [(1, " ".join(f"t{i}" for i in range(100))), (2, "short doc"), (3, None)]
    out = chunk_documents(_docs_ds(rows), max_tokens=64, stride=48).to_pandas()
    out = out.sort_values(["doc_id", "chunk_index"]).reset_index(drop=True)
    assert out[out["doc_id"] == 1].shape[0] == 2
    assert out[out["doc_id"] == 2].shape[0] == 1
    assert 3 not in set(out["doc_id"])  # null text → no chunks
    assert out["n_tokens"].tolist() == [64, 52, 2]


def test_salted_groupby_sum_matches_unsalted():
    """Hot-key salting: a 90%-skewed key aggregates to exactly the same
    sums as the direct groupby (associative merge), while the first
    reduce phase fans the hot key across num_salts sub-groups."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from occular_ocr_ray.stages.salting import salted_groupby_sum

    n = 5000
    keys = ["hot"] * (n * 9 // 10) + [f"k{i % 7}" for i in range(n // 10)]
    vals = list(range(len(keys)))
    ds = rd.from_arrow(pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())}))
    salted = (
        salted_groupby_sum(ds, ["k"], ["v"], num_salts=8)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    direct = (
        ds.groupby("k").aggregate(Sum("v", alias_name="v"))
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(salted, direct, check_dtype=False)


def test_empty_docs_never_near_dup_candidates():
    """Null/empty documents emit no signature rows (no jaccard(∅,∅)=1
    pair storm, and the SQL oracle agrees); exact dedup still collapses
    them by identical md5."""
    from occular_ocr_ray.stages.dedup import (
        exact_dedup_ids, minhash_lsh_pairs, simhash_pairs,
    )

    wide = " ".join(f"token{i}" for i in range(80))
    rows = [(1, ""), (2, None), (3, wide), (4, wide), (5, "   ")]
    mp = minhash_lsh_pairs(_docs_ds(rows), threshold=0.5).to_pandas()
    sp = simhash_pairs(_docs_ds(rows), max_hamming=3).to_pandas()
    for pairs in (mp, sp):
        touched = set(pairs.get("id_a", [])) | set(pairs.get("id_b", []))
        assert touched <= {3, 4}
    assert (3, 4) in set(zip(mp["id_a"], mp["id_b"]))
    keep = sorted(exact_dedup_ids(_docs_ds([(1, ""), (2, ""), (3, wide)])).to_pandas()["doc_id"])
    assert keep == [1, 3]  # empties collapse under exact dedup


def test_incremental_dedup_across_runs():
    """Shared fingerprint index: a second dataset drops content admitted
    by the first run; totals equal distinct fingerprints; empty/null
    text collapses to one admission."""
    import ray.data as rd

    from occular_ocr_ray.state.incremental import IncrementalDeduper

    dd = IncrementalDeduper(num_shards=4)
    try:
        day1 = _docs_ds([(1, "alpha"), (2, "beta"), (3, "alpha"), (4, None)])
        out1 = dd.dedup(day1).to_pandas()
        assert len(out1) == 3  # alpha, beta, "" — one each
        assert dd.index_size() == 3
        day2 = _docs_ds([(5, "beta"), (6, "gamma"), (7, ""), (8, "gamma")])
        out2 = dd.dedup(day2).to_pandas()
        # beta and "" already admitted on day 1; gamma admitted once
        assert sorted(out2["doc_id"]) == [6]
        assert dd.index_size() == 4
    finally:
        dd.shutdown()


def test_incremental_dedup_reconsumption_and_retry_idempotent():
    """The returned Dataset is materialized (safe to consume twice), a
    retried admission (same batch content key) reproduces its original
    answers, and whitespace-only variants count as distinct exact
    content (distinct md5)."""
    import ray

    import ray.data as rd

    from occular_ocr_ray.state.incremental import IncrementalDeduper, _FingerprintShard

    dd = IncrementalDeduper(num_shards=4)
    try:
        out = dd.dedup(_docs_ds([(1, "aa"), (2, "bb"), (3, "aa")]))
        assert out.count() == 2
        assert len(out.to_pandas()) == 2  # second consumption identical
    finally:
        dd.shutdown()

    shard = ray.remote(num_cpus=0)(_FingerprintShard).remote()
    fps = [b"x" * 16, b"y" * 16, b"x" * 16]
    first = ray.get(shard.admit.remote(fps, b"batchA"))
    retry = ray.get(shard.admit.remote(fps, b"batchA"))  # task retry
    other = ray.get(shard.admit.remote(fps, b"batchB"))
    assert first == [True, True, False]
    assert retry == first  # idempotent under retry
    assert other == [False, False, False]
    ray.kill(shard)


def test_incremental_dedup_batch_key_is_whole_batch():
    """Retry-idempotency key must be derived from the WHOLE batch's
    fingerprint list, not the per-shard sublist: two distinct batches
    that each route a single duplicate fp to one shard must NOT look
    like retries of each other there (the per-shard key bug re-admitted
    the duplicate)."""
    import hashlib

    import pyarrow as pa

    from occular_ocr_ray.state.incremental import IncrementalDeduper

    n = 4

    def route(t: str) -> int:
        return int.from_bytes(
            hashlib.md5(t.encode()).digest()[:8], "little") % n

    dup = "dupx"
    # filler words routed AWAY from dup's shard, so each batch's sublist
    # to that shard is exactly [fp(dup)]
    fillers = [w for w in (f"w{i}" for i in range(100)) if route(w) != route(dup)]
    y, z = fillers[0], fillers[1]
    dd = IncrementalDeduper(num_shards=n)
    try:
        f = dd._filter_fn()
        a = f(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                        "text": pa.array([dup, y], pa.string())}))
        assert a.num_rows == 2
        b = f(pa.table({"doc_id": pa.array([3, 4], pa.int64()),
                        "text": pa.array([dup, z], pa.string())}))
        assert b["doc_id"].to_pylist() == [4]  # dup dropped, z admitted
        assert dd.index_size() == 3
    finally:
        dd.shutdown()


def test_incremental_dedup_content_replay_is_not_a_retry():
    """A LATER dedup() call replaying byte-identical batch content (a
    re-crawled increment) must deduplicate to zero — only Ray task
    retries within one call (same closure nonce) get their original
    admissions back.  Regression: a nonce-free whole-batch key made the
    replay indistinguishable from a retry and re-admitted everything."""
    from occular_ocr_ray.state.incremental import IncrementalDeduper

    rows = [(1, "rep-a"), (2, "rep-b"), (3, "rep-c")]
    dd = IncrementalDeduper(num_shards=4)
    try:
        assert dd.dedup(_docs_ds(rows)).count() == 3
        assert dd.dedup(_docs_ds(rows)).count() == 0  # identical batches
        assert dd.index_size() == 3
    finally:
        dd.shutdown()


def test_incremental_dedup_named_index_reattach():
    """A named index is detached: a second handle with the same name
    attaches to the SAME shards (simulating a restarted ingest driver)."""
    from occular_ocr_ray.state.incremental import IncrementalDeduper

    a = IncrementalDeduper(num_shards=2, name="t-reattach")
    try:
        assert a.dedup(_docs_ds([(1, "p"), (2, "q")])).count() == 2
        b = IncrementalDeduper(num_shards=2, name="t-reattach")
        assert b.index_size() == 2  # same index, not a fresh one
        assert b.dedup(_docs_ds([(3, "p"), (4, "r")])).count() == 1
    finally:
        a.shutdown()


def test_whitespace_only_docs_skip_ngram_path():
    """Whitespace-only docs emit no char-ngram signatures (they would
    otherwise all collide on space-run grams)."""
    from occular_ocr_ray.stages.dedup import ngram_jaccard_pairs

    rows = [(1, "   "), (2, "      "), (3, "\t\t"), (4, BASE), (5, BASE)]
    pairs = ngram_jaccard_pairs(_docs_ds(rows), threshold=0.5).to_pandas()
    assert set(zip(pairs["id_a"], pairs["id_b"])) == {(4, 5)}


def test_incremental_index_snapshot_restore(tmp_path):
    """save() → shutdown (simulated cluster loss) → load(): yesterday's
    content is still dropped, and retry idempotency survives the round
    trip (batch keys are persisted with the fingerprints)."""
    import ray

    from occular_ocr_ray.state.incremental import IncrementalDeduper

    snap = str(tmp_path / "snap")
    dd = IncrementalDeduper(num_shards=3)
    assert dd.dedup(_docs_ds([(1, "mon-a"), (2, "mon-b")])).count() == 2
    assert dd.save(snap) == 2
    dd.shutdown()  # cluster restart: all shard actors gone

    dd2 = dd3 = None
    try:
        dd2 = IncrementalDeduper.load(snap)
        assert dd2.index_size() == 2
        out = dd2.dedup(_docs_ds([(3, "mon-a"), (4, "tue-c")])).to_pandas()
        assert sorted(out["doc_id"]) == [4]  # mon-a still dropped
        assert dd2.index_size() == 3
        # retry idempotency across the snapshot: batch keys are persisted
        # with the fingerprints, so an admission replayed with its
        # original key (a task retry surviving a save/load cycle)
        # reproduces the original answers, while any other key does not
        fp_new = b"z" * 16
        shard0 = dd2.shards[int.from_bytes(fp_new[:8], "little") % 3]
        assert ray.get(shard0.admit.remote([fp_new], b"keyR")) == [True]
        snap2 = snap + "2"
        dd2.save(snap2)
        dd2.shutdown()
        dd3 = IncrementalDeduper.load(snap2)
        shard0 = dd3.shards[int.from_bytes(fp_new[:8], "little") % 3]
        assert ray.get(shard0.admit.remote([fp_new], b"keyR")) == [True]
        assert ray.get(shard0.admit.remote([fp_new], b"keyS")) == [False]
    finally:
        for h in (dd2, dd3):
            if h is not None:
                h.shutdown()


def test_incremental_spill_store_semantics(tmp_path):
    """The off-heap store (bounded hot dict + bloom-indexed sorted
    parquet runs) is semantics-identical to the dict store: cross-run
    dedup, retry idempotency ACROSS a spill flush, content replay, and
    index_size all behave the same with max_hot small enough that every
    batch forces a spill."""
    import os

    import ray

    from occular_ocr_ray.state.incremental import (
        IncrementalDeduper,
        _FingerprintShard,
    )

    dd = IncrementalDeduper(num_shards=2, store="spill",
                            spill_dir=str(tmp_path / "idx"), max_hot=3)
    try:
        day1 = _docs_ds([(i, f"s-{i}") for i in range(1, 21)]
                        + [(21, "s-1")])
        assert dd.dedup(day1).count() == 20
        assert dd.index_size() == 20
        # spills actually happened (max_hot=3 over ~10 fps/shard)
        assert any(
            f.endswith(".parquet")
            for shard in os.listdir(tmp_path / "idx")
            for f in os.listdir(tmp_path / "idx" / shard)
        )
        day2 = _docs_ds([(31, "s-5"), (32, "s-19"), (33, "fresh")])
        out = dd.dedup(day2).to_pandas()
        assert sorted(out["doc_id"]) == [33]
        assert dd.index_size() == 21
        # identical content replayed in a LATER call dedups to zero
        assert dd.dedup(_docs_ds([(41, "fresh")])).count() == 0
    finally:
        dd.shutdown()

    # retry idempotency across a flush: admit, force-spill, re-admit
    # with the original batch key → original answers come back from the
    # parquet run, any other key does not
    shard = ray.remote(num_cpus=0)(_FingerprintShard).remote(
        store="spill", spill_dir=str(tmp_path / "one"), max_hot=1)
    fps = [b"a" * 16, b"b" * 16, b"a" * 16]
    first = ray.get(shard.admit.remote(fps, b"batchA"))
    assert first == [True, True, False]
    assert ray.get(shard.admit.remote(fps, b"batchA")) == first
    assert ray.get(shard.admit.remote(fps, b"batchB")) == [False] * 3
    ray.kill(shard)


def test_incremental_spill_compaction(tmp_path):
    """compact() merges many spilled runs into one per shard with
    identical semantics before and after (dedup decisions, retry keys,
    index size)."""
    import os

    from occular_ocr_ray.state.incremental import IncrementalDeduper

    dd = IncrementalDeduper(num_shards=2, store="spill",
                            spill_dir=str(tmp_path / "idx"), max_hot=2)
    try:
        ds = _docs_ds([(i, f"c-{i}") for i in range(30)]).repartition(6)
        assert dd.dedup(ds).count() == 30
        runs_before = sum(
            1 for shard in os.listdir(tmp_path / "idx")
            for f in os.listdir(tmp_path / "idx" / shard)
            if f.startswith("run_"))
        assert runs_before > 2
        assert dd.compact() == 30
        runs_after = sum(
            1 for shard in os.listdir(tmp_path / "idx")
            for f in os.listdir(tmp_path / "idx" / shard)
            if f.startswith("run_"))
        assert runs_after <= 2  # one per shard
        assert dd.index_size() == 30
        out = dd.dedup(_docs_ds([(40, "c-7"), (41, "c-29"), (42, "post")]))
        assert sorted(out.to_pandas()["doc_id"]) == [42]
    finally:
        dd.shutdown()


def test_incremental_spill_dir_reattach(tmp_path):
    """A spill shard constructed over a NON-EMPTY spill_dir (actor
    restart over node-local scratch) attaches the existing sorted runs
    instead of silently starting empty — starting empty would re-admit
    already-indexed content and the next flush would clobber the run
    files (review finding, round 4)."""
    import ray

    from occular_ocr_ray.state.incremental import _FingerprintShard

    sd = str(tmp_path / "shard0")
    actor = ray.remote(num_cpus=0)(_FingerprintShard)
    s1 = actor.remote(store="spill", spill_dir=sd, max_hot=2)
    fps = [bytes([i]) * 16 for i in range(6)]
    assert ray.get(s1.admit.remote(fps, b"k1")) == [True] * 6
    assert ray.get(s1.size.remote()) == 6
    ray.kill(s1)  # actor dies; runs remain on local scratch

    s2 = actor.remote(store="spill", spill_dir=sd, max_hot=2)
    assert ray.get(s2.size.remote()) >= 4  # spilled runs re-attached
    # already-indexed content is still deduplicated after the restart
    res = ray.get(s2.admit.remote([fps[0], bytes([99]) * 16], b"k2"))
    assert res == [False, True]
    ray.kill(s2)


def test_semdedup_keeps_one_per_ball_and_respects_clusters():
    """SemDeDup on constructed vectors: within an ε-ball the min id
    survives; chained similars collapse greedily; dissimilar vectors
    all survive; invariant under repartitioning.  The cluster gate
    raises instead of co-locating an oversized cluster."""
    import ray.data as rd

    from occular_ocr_ray.stages.similarity import semdedup_keep_ids

    rng = np.random.RandomState(6)
    base_a = rng.standard_normal(32)
    base_b = rng.standard_normal(32)
    rows = []
    # ball A: ids 10,11,12 nearly identical → keep 10
    for i, eps in [(10, 0.0), (11, 0.01), (12, 0.02)]:
        rows.append({"vec_id": i, "embedding": (base_a + eps).tolist()})
    # ball B: ids 20,21 nearly identical → keep 20
    for i, eps in [(20, 0.0), (21, 0.005)]:
        rows.append({"vec_id": i, "embedding": (base_b + eps).tolist()})
    # singletons: orthogonal-ish random vectors
    for i in range(30, 40):
        rows.append({"vec_id": i, "embedding": rng.standard_normal(32).tolist()})
    ds = rd.from_pandas(pd.DataFrame(rows))
    keep = sorted(semdedup_keep_ids(
        ds, threshold=0.98, n_clusters=4, train_sample=100
    ).to_pandas()["vec_id"])
    assert 10 in keep and 11 not in keep and 12 not in keep
    assert 20 in keep and 21 not in keep
    assert set(range(30, 40)) <= set(keep)
    keep2 = sorted(semdedup_keep_ids(
        rd.from_pandas(pd.DataFrame(rows)).repartition(4),
        threshold=0.98, n_clusters=4, train_sample=100
    ).to_pandas()["vec_id"])
    assert keep == keep2

    with pytest.raises(Exception, match="max_cluster_rows"):
        semdedup_keep_ids(ds, threshold=0.98, n_clusters=1,
                          train_sample=100, max_cluster_rows=3).to_pandas()


def test_incremental_self_healing_spill_shards(tmp_path):
    """self_healing=True: a crashed shard is auto-restarted by Ray with
    its original spill_dir and re-attaches its runs — spilled history
    still deduplicates after the crash (at most the un-flushed hot set
    re-admits once).  Requires the spill store: dict shards raise."""
    import ray

    from occular_ocr_ray.state.incremental import IncrementalDeduper

    with pytest.raises(ValueError, match="self_healing"):
        IncrementalDeduper(num_shards=2, self_healing=True)

    dd = IncrementalDeduper(num_shards=2, store="spill",
                            spill_dir=str(tmp_path / "idx"), max_hot=1,
                            self_healing=True)
    try:
        rows = [(i, f"heal-{i}") for i in range(10)]
        assert dd.dedup(_docs_ds(rows)).count() == 10
        # crash every shard, allowing restart; subsequent calls hit the
        # restarted actors, which re-attach their spilled runs
        for s in dd.shards:
            ray.kill(s, no_restart=False)
        out = dd.dedup(_docs_ds([(20, "heal-3"), (21, "heal-8"),
                                 (22, "fresh")])).to_pandas()
        # max_hot=1 ⇒ nearly everything was flushed before the crash;
        # at most one un-flushed hot entry per shard may re-admit
        assert 22 in set(out["doc_id"])
        assert len(out) <= 1 + 2  # fresh + ≤1 per-shard hot-set loss
    finally:
        dd.shutdown()


def test_incremental_spill_snapshot_interop(tmp_path):
    """Snapshots are store-independent: a dict-built index loads into
    the spill store (and back) with content and retry keys intact."""
    import ray

    from occular_ocr_ray.state.incremental import IncrementalDeduper

    snap = str(tmp_path / "snap")
    dd = IncrementalDeduper(num_shards=3)
    assert dd.dedup(_docs_ds([(1, "x-a"), (2, "x-b")])).count() == 2
    dd.save(snap)
    dd.shutdown()

    dd2 = dd3 = None
    try:
        dd2 = IncrementalDeduper.load(snap, store="spill",
                                      spill_dir=str(tmp_path / "sp"),
                                      max_hot=2)
        assert dd2.index_size() == 2
        out = dd2.dedup(_docs_ds([(3, "x-a"), (4, "x-new")])).to_pandas()
        assert sorted(out["doc_id"]) == [4]
        # spill-built snapshot loads back into a dict store
        snap2 = str(tmp_path / "snap2")
        assert dd2.save(snap2) == 3
        dd2.shutdown()
        dd3 = IncrementalDeduper.load(snap2)  # dict store
        assert dd3.index_size() == 3
        assert dd3.dedup(_docs_ds([(5, "x-new"), (6, "x-c")])).count() == 1
    finally:
        for h in (dd2, dd3):
            if h is not None and h.shards:
                h.shutdown()


def test_incremental_spill_restores_legacy_unsorted_snapshot(tmp_path):
    """Pre-r4 dict-store snapshots were written in dict order (unsorted);
    the spill store's streaming restore must detect that and fall back
    to a one-time sort instead of building a broken sorted-run index."""
    import hashlib as _hl
    import json
    import os

    import pyarrow as pa_
    import pyarrow.parquet as pq

    from occular_ocr_ray.state.incremental import IncrementalDeduper

    texts = ["leg-a", "leg-b", "leg-c", "leg-d"]
    fps = [_hl.md5(t.encode()).digest() for t in texts]
    snap = tmp_path / "snap"
    os.makedirs(snap)
    n_shards = 2
    by_shard = {i: [] for i in range(n_shards)}
    for fp in fps:
        by_shard[int.from_bytes(fp[:8], "little") % n_shards].append(fp)
    for i in range(n_shards):
        rows = sorted(by_shard[i], reverse=True)  # deliberately unsorted
        pq.write_table(pa_.table({
            "fp": pa_.array(rows, pa_.binary()),
            "batch_key": pa_.array([b"k" * 16] * len(rows), pa_.binary()),
        }), str(snap / f"shard_{i:04d}.parquet"))
    with open(snap / "meta.json", "w") as fh:
        json.dump({"version": 1, "num_shards": n_shards,
                   "text_col": "text", "total": len(fps)}, fh)

    dd = IncrementalDeduper.load(str(snap), store="spill",
                                 spill_dir=str(tmp_path / "sp"), max_hot=2)
    try:
        assert dd.index_size() == 4
        out = dd.dedup(_docs_ds([(1, "leg-b"), (2, "brand-new")]))
        assert sorted(out.to_pandas()["doc_id"]) == [2]
    finally:
        dd.shutdown()


def test_incremental_named_index_shard_count_guard():
    """Attaching to a live named index with a different num_shards must
    raise (routing is fp % num_shards — a silent mismatch would
    re-admit content)."""
    from occular_ocr_ray.state.incremental import IncrementalDeduper

    a = IncrementalDeduper(num_shards=3, name="t-guard")
    try:
        a.dedup(_docs_ds([(1, "w")])).count()
        with pytest.raises(ValueError, match="num_shards"):
            IncrementalDeduper(num_shards=2, name="t-guard")
        with pytest.raises(ValueError, match="num_shards"):
            IncrementalDeduper(num_shards=5, name="t-guard")
        b = IncrementalDeduper(num_shards=3, name="t-guard")  # correct count
        assert b.index_size() == 1
    finally:
        a.shutdown()


def test_cc_random_graphs_match_union_find():
    """Distributed min-label propagation equals a reference union-find
    on a seeded random cluster graph.  Cluster-star topology (members →
    hub, random hub-hub merges) keeps the diameter ≤ ~5 so the test
    costs a handful of propagation rounds — each round is a join +
    groupby, so CI time scales with graph diameter, not node count."""
    import ray.data as rd

    from occular_ocr_ray.stages.cc import connected_component_labels

    rng = np.random.RandomState(3)
    n, n_clusters = 80, 12
    ids = list(range(n))
    cluster = rng.randint(0, n_clusters, size=n)
    hubs = {c: min(i for i in ids if cluster[i] == c)
            for c in set(int(c) for c in cluster)}
    edges = [(i, hubs[int(cluster[i])]) for i in ids if i != hubs[int(cluster[i])]]
    hub_list = sorted(hubs.values())
    for _ in range(5):  # random cluster merges
        a, b = rng.choice(hub_list, size=2, replace=False)
        edges.append((int(a), int(b)))
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, int] = {}
    for i in ids:
        r = find(i)
        comp[r] = min(comp.get(r, i), i)
    expect = {i: comp[find(i)] for i in ids}

    ids_ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([a for a, _ in edges], pa.int64()),
        "id_b": pa.array([b for _, b in edges], pa.int64()),
    }))
    labels = connected_component_labels(ids_ds, pairs).to_pandas()
    got = dict(zip(labels["doc_id"], labels["label"]))
    assert got == expect


def test_cc_no_edges_is_identity_labeling():
    """Zero edges: every node is its own component (regression: the
    empty edge Dataset crashed the round-join's schema inference)."""
    import ray.data as rd

    from occular_ocr_ray.stages.cc import connected_component_labels

    ids = rd.from_arrow(pa.table({"doc_id": pa.array([7, 3, 9], pa.int64())}))
    empty_pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}))
    out = (connected_component_labels(ids, empty_pairs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [3, 7, 9]
    assert out["label"].tolist() == [3, 7, 9]


def test_cc_bucket_width_tracks_cluster(ray_session):
    """The CC round-join width must scale with the cluster (the r2
    16-bucket hardcode capped the 10^12-row path at 16-way join
    parallelism) and accept an explicit override."""
    import ray
    import ray.data as rd

    from occular_ocr_ray.stages.cc import connected_component_labels
    from occular_ocr_ray.stages.joins import _default_num_buckets

    cores = int(ray.cluster_resources().get("CPU", 0))
    assert _default_num_buckets() == max(32, 2 * cores)

    ids_ds = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2, 3], pa.int64())}))
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([1], pa.int64()),
        "id_b": pa.array([2], pa.int64()),
    }))
    labels = connected_component_labels(
        ids_ds, pairs, num_buckets=4).to_pandas()
    assert dict(zip(labels["doc_id"], labels["label"])) == {1: 1, 2: 1, 3: 3}


def test_approx_quantiles_accuracy_and_invariance():
    """Log-bucket histogram quantiles: within the bucket's ~1% relative
    error of the exact discrete quantiles, and invariant to input
    partitioning (exact integer bucket counts — no sampling)."""
    import math

    import ray.data as rd

    from occular_ocr_ray.stages.sketch_agg import approx_quantiles

    rng = np.random.RandomState(11)
    vals = np.exp(rng.standard_normal(4000) * 0.8 + 5.0)  # lognormal prices
    keys = np.array(["a", "b"])[rng.randint(0, 2, size=4000)]
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals)})

    out1 = approx_quantiles(rd.from_arrow(tbl), "k", "v")
    out32 = approx_quantiles(rd.from_arrow(tbl).repartition(32), "k", "v")
    pd.testing.assert_frame_equal(
        out1.reset_index(drop=True), out32.reset_index(drop=True)
    )  # partitioning-invariant

    # empty input returns the typed empty shape, not a KeyError
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.string()),
                                    "v": pa.array([], pa.float64())}))
    eout = approx_quantiles(empty, "k", "v")
    assert list(eout.columns) == list(out1.columns) and eout.empty

    for key in ("a", "b"):
        v = np.sort(vals[keys == key])
        n = len(v)
        row = out1[out1["k"] == key].iloc[0]
        assert row["n_rows"] == n
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
            exact = v[max(0, math.ceil(q * n) - 1)]
            assert abs(row[col] - exact) / exact < 0.011  # ≤ bucket width

    # values <= 0 collapse into the underflow bucket, estimated 0.0
    t2 = pa.table({"k": pa.array(["z"] * 4),
                   "v": pa.array([-1.0, 0.0, 0.0, -5.0])})
    z = approx_quantiles(rd.from_arrow(t2), "k", "v")
    assert float(z["p50"].iloc[0]) == 0.0


def test_bucketed_hash_join_left_outer():
    """Explicit bucketed join: left-outer rows with no match carry
    nulls (incl. the all-empty-right-bucket fast path), inner drops
    them; int64 keys ≥ 2^53 survive exactly (the r2 pandas-coercion
    regression class)."""
    import ray.data as rd

    from occular_ocr_ray.stages.joins import bucketed_hash_join

    big = (1 << 60) + 7  # would corrupt under float64 coercion
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, big], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d"], pa.string()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, big], pa.int64()),
        "rv": pa.array([20, 99], pa.int64()),
    }))
    outer = bucketed_hash_join(left, right, left_on="k", right_on="k",
                               num_buckets=4, join_type="left outer"
                               ).to_pandas().sort_values("k").reset_index(drop=True)
    assert outer["k"].tolist() == [1, 2, 3, big]
    assert outer["rv"].tolist()[1] == 20 and outer["rv"].tolist()[3] == 99
    assert outer["rv"].isna().tolist() == [True, False, True, False]
    inner = bucketed_hash_join(left, right, left_on="k", right_on="k",
                               num_buckets=4).to_pandas()
    assert sorted(inner["k"]) == [2, big]
    with pytest.raises(ValueError, match="join_type"):
        bucketed_hash_join(left, right, left_on="k", right_on="k",
                           join_type="cross")


def test_bucketed_hash_join_full_outer():
    """Full outer surfaces unmatched rows from BOTH sides with nulls in
    the other side's columns, key coalesced into the left key column —
    including the empty-left-bucket and empty-right-bucket fast paths
    (num_buckets > distinct keys forces both)."""
    import ray.data as rd

    from occular_ocr_ray.stages.joins import bucketed_hash_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lv": pa.array(["a", "b", "c"], pa.string()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 4], pa.int64()),
        "rv": pa.array([20, 40], pa.int64()),
    }))
    out = bucketed_hash_join(left, right, left_on="k", right_on="k",
                             num_buckets=8, join_type="full outer"
                             ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["lv"].isna().tolist() == [False, False, False, True]
    assert out["rv"].isna().tolist() == [True, False, True, False]
    assert out.loc[1, "rv"] == 20 and out.loc[3, "rv"] == 40


def test_real_image_header_metadata():
    """PNG/GIF/JPEG dimensions parse from real headers (stdlib, no
    codec); truncated/garbage payloads stay behind the honest
    NotImplementedError boundary (→ nulls under strict=False)."""
    import struct as st

    import ray.data as rd

    from occular_ocr_ray.stages.multimodal import (
        MediaDecode, decode_media, parse_image_dimensions,
    )

    png = (b"\x89PNG\r\n\x1a\n" + st.pack(">I", 13) + b"IHDR"
           + st.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00" + b"crc0")
    gif = b"GIF89a" + st.pack("<HH", 320, 200) + b"\x00" * 6
    jpeg = (b"\xff\xd8"                                   # SOI
            + b"\xff\xe0" + st.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9  # APP0
            + b"\xff\xc0" + st.pack(">H", 17) + b"\x08"   # SOF0, precision
            + st.pack(">HH", 1080, 1920) + b"\x03" + b"\x00" * 9)
    assert parse_image_dimensions(png) == (640, 480)
    assert parse_image_dimensions(gif) == (320, 200)
    assert parse_image_dimensions(jpeg) == (1920, 1080)
    assert parse_image_dimensions(b"\x89PNG\r\n\x1a\nshort") is None
    assert parse_image_dimensions(b"not an image") is None

    meta = decode_media(png)
    assert (meta["kind"], meta["width"], meta["height"], meta["n_frames"]) == (0, 640, 480, 1)
    with pytest.raises(NotImplementedError):
        decode_media(b"RIFF....WEBP")  # unsupported container

    ds = rd.from_arrow(pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "media": pa.array([png, b"garbage", jpeg], pa.binary()),
    }))
    out = ds.map_batches(MediaDecode(), batch_format="pyarrow").to_pandas()
    out = out.sort_values("media_id")
    assert out["width"].tolist()[0] == 640 and out["width"].tolist()[2] == 1920
    assert pd.isna(out["width"].tolist()[1])  # poison-pill → nulls


def test_canonical_url_and_dedup():
    """URL canonicalization rules + the grouped dedup built on them."""
    import ray.data as rd

    from occular_ocr_ray.functions.urltools import canonical_url
    from occular_ocr_ray.stages.dedup import url_dedup_ids

    assert canonical_url("HTTP://Example.COM:80/a?utm_source=x&q=1#frag") == \
        "http://example.com/a?q=1"
    assert canonical_url("https://h.example:443/") == "https://h.example/"
    assert canonical_url("https://h.example:8443/x") == "https://h.example:8443/x"
    assert canonical_url("http://h.example") == "http://h.example/"
    assert canonical_url("http://h/p?b=2&a=1") == "http://h/p?b=2&a=1"  # order kept
    assert canonical_url("http://h/p?gclid=z&a=") == "http://h/p?a="
    assert canonical_url("http://h/CasePath") == "http://h/CasePath"  # not folded
    assert canonical_url(None) == "" and canonical_url("") == ""
    assert canonical_url("http://[bad") == "http://[bad"  # unparseable → as-is

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "url": pa.array([
            "http://a.example/x",
            "HTTP://A.EXAMPLE:80/x#sec",          # dup of 1
            "http://a.example/x?utm_campaign=c",  # dup of 1
            "http://a.example/y",
            "http://b.example/x",
        ], pa.string()),
    }))
    keep = sorted(url_dedup_ids(ds).to_pandas()["doc_id"])
    assert keep == [1, 4, 5]


# --- bloom filter / bloom semi-join ------------------------------------
def test_bloom_no_false_negatives_and_low_fpr():
    import ray.data as rd

    from occular_ocr_ray.stages.bloom import build_bloom

    rng = np.random.RandomState(7)
    members = rng.randint(-2**62, 2**62, size=5000).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": members})).repartition(6)
    bloom = build_bloom(ds, "k", num_bits=1 << 18, num_hashes=4)
    assert bloom.contains(members).all()  # never a false negative
    probe = rng.randint(-2**62, 2**62, size=20000).astype(np.int64)
    outside = probe[~np.isin(probe, members)]
    fpr = float(bloom.contains(outside).mean())
    assert fpr < 0.01  # 2^18 bits / 5k keys / k=4 → expected ~3e-5


def test_bloom_semi_join_matches_exact():
    import ray.data as rd

    from occular_ocr_ray.stages.bloom import bloom_semi_join

    rng = np.random.RandomState(11)
    left = pd.DataFrame({
        "key": rng.randint(0, 300, size=2000).astype(np.int64),
        "val": rng.randn(2000),
    })
    right = pd.DataFrame({"rk": np.arange(0, 300, 3, dtype=np.int64)})
    # tiny bloom → real false positives, proving the exact verify strips them
    out = bloom_semi_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(2),
        left_on="key", right_on="rk", num_bits=256, num_hashes=2,
        num_buckets=8,
    ).to_pandas()
    expected = left[left["key"].isin(set(right["rk"]))]
    key = ["key", "val"]
    got = out[key].sort_values(key).reset_index(drop=True)
    exp = expected[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_bloom_semi_join_empty_right():
    import ray.data as rd

    from occular_ocr_ray.stages.bloom import bloom_semi_join

    left = pd.DataFrame({"key": np.arange(50, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.array([], dtype=np.int64)})
    out = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right),
        left_on="key", right_on="rk", num_bits=256, num_hashes=2,
        num_buckets=4,
    ).to_pandas()
    assert len(out) == 0


# --- skew-aware join ---------------------------------------------------
def test_skew_aware_join_matches_bucketed_on_skewed_data():
    import ray.data as rd

    from occular_ocr_ray.stages.joins import bucketed_hash_join, skew_aware_join

    rng = np.random.RandomState(5)
    # 3 hot keys carry ~60% of the left side; the rest is uniform
    hot = rng.choice([7, 42, 99], size=3000)
    cold = rng.randint(100, 1000, size=2000)
    keys = np.concatenate([hot, cold]).astype(np.int64)
    rng.shuffle(keys)
    left = pd.DataFrame({"k": keys, "v": np.arange(len(keys), dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(0, 1000, 2, dtype=np.int64),
                          "tag": [f"t{i}" for i in range(0, 1000, 2)]})
    lds = rd.from_pandas(left).repartition(6)
    rds = rd.from_pandas(right).repartition(3)
    got = skew_aware_join(lds, rds, left_on="k", right_on="rk",
                          hot_min_frac=0.05, num_buckets=8).to_pandas()
    exp = bucketed_hash_join(lds, rds, left_on="k", right_on="rk",
                             num_buckets=8).to_pandas()
    cols = ["k", "v", "tag"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(["k", "v"]).reset_index(drop=True),
        exp[cols].sort_values(["k", "v"]).reset_index(drop=True),
    )
    # the detection pass must actually have routed the hot keys
    from occular_ocr_ray.stages.joins import _mg_key_histogram
    hist, n = _mg_key_histogram(lds, "k", 64)
    assert {7, 42, 99} <= {k for k, c in hist.items() if c >= 0.05 * n}


def test_skew_aware_join_explicit_hot_keys_and_no_hot():
    import ray.data as rd

    from occular_ocr_ray.stages.joins import skew_aware_join

    left = pd.DataFrame({"k": np.array([1, 1, 2, 3], dtype=np.int64)})
    right = pd.DataFrame({"rk": np.array([1, 3], dtype=np.int64),
                          "x": np.array([10, 30], dtype=np.int64)})
    for hk in (frozenset(), frozenset({1})):
        out = skew_aware_join(
            rd.from_pandas(left), rd.from_pandas(right),
            left_on="k", right_on="rk", hot_keys=hk, num_buckets=4,
        ).to_pandas().sort_values(["k"]).reset_index(drop=True)
        assert out["k"].tolist() == [1, 1, 3]
        assert out["x"].tolist() == [10, 10, 30]


def test_skew_aware_join_empty_right():
    """Inner join against an empty right side is 0 rows, not a crash
    (regression: an empty right dataset contributed schema-less blocks
    that stripped the key column from the broadcast hot table)."""
    import ray.data as rd

    from occular_ocr_ray.stages.joins import skew_aware_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 2], pa.int64()),
        "v": pa.array([1, 2, 3, 4], pa.int64())}))
    empty = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "w": pa.array([], pa.int64())}))
    assert skew_aware_join(left, empty, left_on="k", right_on="k").count() == 0


def test_skew_aware_join_string_keys():
    """String join keys (url/domain/lang — routine in web data) route
    through the same hot-broadcast + cold-bucket plan as integers
    (regression: MG histogram packed keys as list<int64> and bucket
    assignment used |k| % B, so string keys crashed)."""
    import ray.data as rd

    from occular_ocr_ray.stages.joins import bucketed_hash_join, skew_aware_join

    rng = np.random.RandomState(11)
    hot = rng.choice(["en", "de"], size=400).tolist()
    cold = [f"l{i % 37}" for i in range(300)]
    left = pd.DataFrame({"lang": hot + cold,
                         "v": np.arange(700, dtype=np.int64)})
    right = pd.DataFrame({"rl": ["en", "de"] + [f"l{i}" for i in range(37)],
                          "tag": [f"t{i}" for i in range(39)]})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(2)
    got = skew_aware_join(lds, rds, left_on="lang", right_on="rl",
                          hot_min_frac=0.05, num_buckets=8).to_pandas()
    exp = bucketed_hash_join(lds, rds, left_on="lang", right_on="rl",
                             num_buckets=8).to_pandas()
    cols = ["lang", "v", "tag"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(["lang", "v"]).reset_index(drop=True),
        exp[cols].sort_values(["lang", "v"]).reset_index(drop=True),
    )


# --- Misra-Gries exact top-k ------------------------------------------
def test_topk_by_frequency_exact_small_vocab():
    import ray.data as rd

    from occular_ocr_ray.stages.sketch_agg import topk_by_frequency

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(40)]
    weights = np.linspace(5, 1, 40); weights /= weights.sum()
    docs = [" ".join(rng.choice(vocab, size=30, p=weights)) for _ in range(200)]
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(5)
    got = topk_by_frequency(ds, "text", k=5, capacity=1024)
    exact = pd.Series(" ".join(docs).split()).value_counts()
    exp = (exact.rename_axis("token").reset_index(name="cnt")
           .sort_values(["cnt", "token"], ascending=[False, True])
           .head(5).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_topk_by_frequency_certifies_or_raises_under_pressure():
    import ray.data as rd

    from occular_ocr_ray.stages.sketch_agg import topk_by_frequency

    rng = np.random.RandomState(9)
    # heavy head over a huge tail with capacity far below vocab size:
    # compression WILL happen; the head must still certify exactly
    head = [f"hot{i}" for i in range(3)]
    docs = []
    for _ in range(300):
        toks = list(rng.choice(head, size=40)) + \
            [f"tail{rng.randint(0, 20000)}" for _ in range(10)]
        docs.append(" ".join(toks))
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(4)
    got = topk_by_frequency(ds, "text", k=3, capacity=256)
    assert sorted(got["token"]) == sorted(head)
    # asking deep into the uncertifiable tail must raise, not lie
    with pytest.raises(ValueError, match="not certifiably exact"):
        topk_by_frequency(ds, "text", k=200, capacity=256)


# --- PII kernels -------------------------------------------------------
def test_scrub_pii_kernels():
    from occular_ocr_ray.functions.pii import scrub_pii

    text = ("mail a.b-c_9%x@sub.example.co.uk or bob@ex.io, "
            "call +1-555-0199 / +44-201-9999, host 10.0.255.3 ok, "
            "not-an-ip 999.999 and half@nope stays")
    red, ne, np_, ni = scrub_pii(text)
    assert ne == 2 and np_ == 2 and ni == 1
    assert "<EMAIL>" in red and "<PHONE>" in red and "<IP>" in red
    assert "example.co.uk" not in red and "555-0199" not in red
    assert "10.0.255.3" not in red
    assert "half@nope stays" in red  # no TLD → not an email
    assert scrub_pii("") == ("", 0, 0, 0)


def test_bucketed_hash_join_string_keys():
    import ray.data as rd

    from occular_ocr_ray.stages.joins import bucketed_hash_join

    rng = np.random.RandomState(13)
    langs = ["en", "de", "fr", "zh", "es", "pt", "it", "nl"]
    left = pd.DataFrame({"lang": rng.choice(langs, 500),
                         "v": np.arange(500, dtype=np.int64)})
    right = pd.DataFrame({"code": ["en", "de", "fr", "xx"],
                          "family": ["ger", "ger", "rom", "unk"]})
    for jt in ("inner", "left outer"):
        got = bucketed_hash_join(
            rd.from_pandas(left).repartition(4), rd.from_pandas(right),
            left_on="lang", right_on="code", num_buckets=8, join_type=jt,
        ).to_pandas()
        exp = left.merge(right, left_on="lang", right_on="code",
                         how="inner" if jt == "inner" else "left").drop(columns=["code"])
        cols = ["lang", "v", "family"]
        pd.testing.assert_frame_equal(
            got[cols].sort_values(["lang", "v"]).reset_index(drop=True),
            exp[cols].sort_values(["lang", "v"]).reset_index(drop=True),
        )


def test_bucketed_lookup_join_matches_left_merge():
    """The lookup join ≡ pandas left merge on unique-keyed right sides
    (string keys, missing matches → nulls, collision suffix), and it
    carries list-typed left columns Acero's hash join rejects."""
    import ray.data as rd

    from occular_ocr_ray.stages.joins import bucketed_lookup_join

    rng = np.random.RandomState(7)
    langs = ["en", "de", "fr", "zh", "es"]
    left_tbl = pa.table({
        "lang": pa.array(rng.choice(langs, 200)),
        "v": pa.array(np.arange(200, dtype=np.int64)),
        "tags": pa.array([[i, i + 1] for i in range(200)],
                         pa.list_(pa.int64())),  # Acero-rejected payload
    })
    right = pd.DataFrame({"code": ["en", "de", "xx"],
                          "family": ["ger", "ger", "unk"]})
    got = bucketed_lookup_join(
        rd.from_arrow(left_tbl).repartition(4), rd.from_pandas(right),
        left_on="lang", right_on="code", num_buckets=8,
    ).to_pandas().sort_values("v").reset_index(drop=True)
    exp = (left_tbl.to_pandas()
           .merge(right, left_on="lang", right_on="code", how="left")
           .drop(columns=["code"]).sort_values("v").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["lang", "v", "family"]], exp[["lang", "v", "family"]])
    assert got["tags"].map(list).tolist() == exp["tags"].map(list).tolist()


def test_anti_join_bloom_prefilter_matches_plain():
    import ray.data as rd

    from occular_ocr_ray.stages.dedup import anti_join_ids

    rng = np.random.RandomState(17)
    ids = np.arange(2000, dtype=np.int64)
    corpus = pd.DataFrame({"doc_id": ids, "x": rng.randn(2000)})
    drops = pd.DataFrame({"doc_id": rng.choice(ids, 300, replace=False)})
    cds = rd.from_pandas(corpus).repartition(5)
    dds = rd.from_pandas(drops).repartition(2)
    plain = anti_join_ids(cds, dds, num_buckets=8).to_pandas()
    # 256-bit bloom over 300 keys → massive FPR: exercises BOTH branches
    bloomed = anti_join_ids(cds, dds, num_buckets=8, bloom_bits=256).to_pandas()
    assert len(plain) == 1700
    pd.testing.assert_frame_equal(
        plain.sort_values("doc_id").reset_index(drop=True),
        bloomed.sort_values("doc_id").reset_index(drop=True),
    )


def test_decontaminate_drops_ngram_overlap():
    """Corpus docs sharing a word 4-gram with the eval set are dropped;
    short (<n tokens) and empty docs always survive; the eval set's own
    grams only match contiguous runs (no bag-of-words false hits)."""
    import ray.data as rd

    from occular_ocr_ray.stages.decontam import decontaminate

    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon",   # shares 4-gram -> drop
            "zeta eta theta iota kappa",        # clean -> keep
            "delta gamma beta alpha",           # same words, wrong order -> keep
            "tiny doc",                         # < n tokens -> keep
            "",                                 # empty -> keep
        ], pa.string()),
    }))
    eval_ds = rd.from_arrow(pa.table({
        "text": pa.array(["xxx alpha beta gamma delta yyy"], pa.string()),
    }))
    out = decontaminate(corpus, eval_ds, text_col="text", n=4).to_pandas()
    assert sorted(out["doc_id"]) == [2, 3, 4, 5]

    # empty eval set (no benchmark files yet): everything passes through
    # (regression: zero eval blocks used to strip the hash column and
    # crash the gram reduction)
    empty_eval = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    out = decontaminate(corpus, empty_eval, text_col="text", n=4).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3, 4, 5]


def test_incremental_compaction_crash_heal(tmp_path):
    """The compaction protocol is crash-consistent (ADVICE r4): the
    merged compact.parquet commits before any run is deleted, and a
    restart over a spill_dir caught in ANY intermediate window (compact
    present + all/some/no runs deleted) heals to the full index instead
    of coming back empty and re-admitting history."""
    import glob
    import os

    from occular_ocr_ray.state.incremental import (
        _FingerprintShard,
        _write_sorted_stream,
    )

    fps = [bytes([i]) * 16 for i in range(8)]
    for n_runs_left in (3, 1, 0):  # crash windows within the delete loop
        sd = str(tmp_path / f"w{n_runs_left}")
        s = _FingerprintShard(store="spill", spill_dir=sd, max_hot=2)
        for i in range(0, 8, 3):  # multiple calls → multiple runs
            assert s.admit(fps[i:i + 3], b"k") == [True] * len(fps[i:i + 3])
        s._flush_hot()  # fold the hot tail into runs
        runs = sorted(glob.glob(os.path.join(sd, "run_*.parquet")))
        assert len(runs) >= 2
        # simulate: compact fully written, crash mid-delete
        _write_sorted_stream(s._merged_pairs(),
                             os.path.join(sd, "compact.parquet"))
        for f in runs[n_runs_left:]:
            os.remove(f)
        healed = _FingerprintShard(store="spill", spill_dir=sd, max_hot=2)
        assert healed.size() == 8
        assert healed.admit(fps, b"other") == [False] * 8
        assert not os.path.exists(os.path.join(sd, "compact.parquet"))


def test_sorted_run_fingerprint_width_guard(tmp_path):
    """_SortedRun's bloom derives its two probe seeds from the digest's
    8-byte halves — a non-16-byte fingerprint must fail loudly instead
    of silently fusing adjacent digests into wrong bloom keys (bloom
    false NEGATIVES → duplicate admissions; ADVICE r4)."""
    from occular_ocr_ray.state.incremental import _SortedRun

    with pytest.raises(ValueError, match="16-byte"):
        _SortedRun._hash_pairs([b"x" * 8, b"y" * 8])
    # 16-byte digests pass through
    assert _SortedRun._hash_pairs([b"x" * 16]).shape == (1, 2)


def test_named_reattach_config_mismatch(tmp_path):
    """Named re-attach (get_if_exists) keeps the live shards' original
    constructor args; requesting a DIFFERENT store must raise (the
    request would be silently dropped otherwise) and tuning drift on
    max_hot warns (ADVICE r4)."""
    import warnings

    from occular_ocr_ray.state.incremental import IncrementalDeduper

    name = "cfgprobe-idx"
    dd = IncrementalDeduper(num_shards=2, name=name)
    try:
        assert dd.dedup(_docs_ds([(1, "cfg-a")])).count() == 1
        with pytest.raises(ValueError, match="store"):
            IncrementalDeduper(num_shards=2, name=name, store="spill",
                               spill_dir=str(tmp_path / "sp"))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            dd2 = IncrementalDeduper(num_shards=2, name=name,
                                     max_hot=123)
            assert any("max_hot" in str(x.message) for x in w)
        # the re-attached handle still sees the index
        assert dd2.dedup(_docs_ds([(2, "cfg-a"), (3, "cfg-b")])
                         ).to_pandas()["doc_id"].tolist() == [3]
    finally:
        dd.shutdown()


def test_decontam_rolling_blake2b_parity():
    """The rolling polynomial gram kernel must produce the SAME
    filter decision as the independent per-window blake2b build on
    every document (hash values differ; membership semantics cannot,
    since both sides share the kernel) — the decontam analog of the
    span-dedup A/B (VERDICT r4 #3)."""
    import ray.data as rd

    from occular_ocr_ray.stages.decontam import decontaminate

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(50)]
    docs = [" ".join(rng.choice(vocab, size=rng.randint(1, 40)))
            for _ in range(60)]
    # plant exact 4-gram overlaps between some corpus docs and the eval set
    eval_texts = [docs[3], "q1 q2 " + " ".join(docs[7].split()[:4]),
                  "zz yy xx ww"]
    corpus = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(len(docs)), "text": docs}))
    eval_ds = rd.from_pandas(pd.DataFrame({"text": eval_texts}))

    kept_roll = sorted(decontaminate(
        corpus, eval_ds, n=4, hasher="rolling").to_pandas()["doc_id"])
    kept_b2b = sorted(decontaminate(
        rd.from_pandas(pd.DataFrame({"doc_id": range(len(docs)),
                                     "text": docs})),
        eval_ds, n=4, hasher="blake2b").to_pandas()["doc_id"])
    assert kept_roll == kept_b2b
    assert 3 not in kept_roll  # the planted contamination was caught


def test_semdedup_fat_cluster_tiled_sweep():
    """A fat cluster must not allocate a dense n×n sims matrix: 20k
    near-identical vectors through ONE cluster (20k² float64 = 3.2 GB
    dense — the tiled sweep peaks at tile²) collapse to the min id,
    and tiling is output-invariant vs the dense path on mixed data
    (VERDICT r4 #2)."""
    import ray.data as rd

    from occular_ocr_ray.stages.similarity import semdedup_keep_ids

    rng = np.random.RandomState(3)
    base = rng.standard_normal(16)
    n = 20_000
    mat = base[None, :] + rng.standard_normal((n, 16)) * 1e-4
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [r.tolist() for r in mat]})
    keep = semdedup_keep_ids(
        rd.from_pandas(df), threshold=0.99, n_clusters=1,
        train_sample=256, tile_rows=4096).to_pandas()["vec_id"]
    assert keep.tolist() == [0]

    # tiling invariance on data with real structure: tiny tiles ==
    # one-big-tile (the dense-equivalent path)
    rows = []
    for i, eps in [(10, 0.0), (11, 0.01), (12, 0.02)]:
        rows.append({"vec_id": i, "embedding": (base + eps).tolist()})
    for i in range(30, 60):
        rows.append({"vec_id": i,
                     "embedding": rng.standard_normal(16).tolist()})
    small = pd.DataFrame(rows)
    a = sorted(semdedup_keep_ids(
        rd.from_pandas(small), threshold=0.98, n_clusters=2,
        train_sample=100, tile_rows=2).to_pandas()["vec_id"])
    b = sorted(semdedup_keep_ids(
        rd.from_pandas(small), threshold=0.98, n_clusters=2,
        train_sample=100, tile_rows=1_000_000).to_pandas()["vec_id"])
    assert a == b


def test_spread_sample_covers_sorted_corpus():
    """Centroid training uses a hash-of-id SPREAD sample, not the scan
    head: on an id-sorted dataset the sample must cover the whole id
    range, be deterministic, and be invariant to partition layout
    (ADVICE r4)."""
    import ray.data as rd

    from occular_ocr_ray.stages.similarity import _spread_sample

    df = pd.DataFrame({"vec_id": np.arange(10_000, dtype=np.int64),
                       "x": np.arange(10_000)})
    s1 = _spread_sample(rd.from_pandas(df), 200, "vec_id")
    s2 = _spread_sample(rd.from_pandas(df).repartition(7), 200, "vec_id")
    assert len(s1) == 200
    assert s1["vec_id"].tolist() == s2["vec_id"].tolist()
    # spread: ids from both the head and the tail of scan order
    assert s1["vec_id"].min() < 2000 and s1["vec_id"].max() > 8000


# --- global-NTILE / perplexity-bucket boundary machinery (round 5) ----
def _write_orders(tmp_path, prices):
    import pyarrow.parquet as pq

    t = pa.table({
        "o_orderkey": pa.array(range(1, len(prices) + 1), pa.int64()),
        "o_custkey": pa.array([1] * len(prices), pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(prices)),
        "o_totalprice": pa.array(prices, pa.float64()),
        "o_orderdate": pa.array([0] * len(prices), pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(prices)),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_order_price_ntile_equal_prices_degenerate_bin(tmp_path):
    """All-equal prices collapse every row into bin 0 (histogram width
    0): ties are broken by o_orderkey exactly as SQL NTILE does."""
    import duckdb

    from occular_ocr_ray.pipelines import relational as R

    sf = _write_orders(tmp_path, [42.0] * 10)
    out = R.order_price_ntile(sf)
    exp = duckdb.sql(
        "SELECT o_orderkey, CAST(NTILE(4) OVER (ORDER BY o_totalprice, "
        f"o_orderkey) AS BIGINT) AS tile FROM '{sf}/orders.parquet' "
        "ORDER BY o_orderkey").fetchdf()
    assert out["tile"].tolist() == exp["tile"].tolist()
    # NTILE(4) of 10 rows: sizes 3,3,2,2
    assert out["tile"].value_counts().sort_index().tolist() == [3, 3, 2, 2]


def test_order_price_ntile_gate_before_collect(tmp_path):
    """The boundary-bin collect is gated BEFORE any row moves: a
    skew-degenerate histogram raises instead of materializing."""
    import pytest as _pytest

    from occular_ocr_ray.pipelines import relational as R

    sf = _write_orders(tmp_path, [42.0] * 10)  # one bin holds all rows
    with _pytest.raises(ValueError, match="boundary bins"):
        R.order_price_ntile(sf, max_boundary_rows=5)


def test_order_price_ntile_partition_invariance(tmp_path):
    """Tile assignment is a pure function of the (price, key) order —
    shard layout must not change it."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    rng = np.random.default_rng(7)
    prices = np.round(rng.uniform(10, 1000, size=200), 2)
    sf = _write_orders(tmp_path, list(prices))
    one = R.order_price_ntile(sf)
    # rewrite as many tiny shards
    t = pq.read_table(str(tmp_path / "orders.parquet"))
    (tmp_path / "orders.parquet").unlink()
    (tmp_path / "orders.parquet").mkdir()
    for i in range(8):
        pq.write_table(t.slice(i * 25, 25),
                       str(tmp_path / "orders.parquet" / f"p{i}.parquet"))
    many = R.order_price_ntile(sf)
    pd.testing.assert_frame_equal(one, many)


def test_perplexity_buckets_group_gate(tmp_path, monkeypatch):
    """Exact per-lang thirds co-locate the (lang, score, id) triples —
    the size gate must trip BEFORE the exchange on an oversized lang."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    from occular_ocr_ray.pipelines import relational as R

    t = pa.table({
        "doc_id": pa.array(range(50), pa.int64()),
        "text": pa.array([f"tok{i % 7} common words" for i in range(50)]),
        "lang": pa.array(["en"] * 50),
        "source": pa.array(["s"] * 50),
        "n_chars": pa.array([10] * 50, pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    monkeypatch.setattr(R, "_EXACT_QUANTILE_GROUP_LIMIT", 10)
    with _pytest.raises(ValueError, match="histogram-refine"):
        R.perplexity_buckets(str(tmp_path))


def test_embedding_components_planted_and_partition_invariant(tmp_path):
    """Planted orthogonal clusters → exact expected labels (min id per
    component); singleton one-hot vectors stay their own component; and
    the result is invariant to input sharding (the CC exchanges are
    keyed, never positional)."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    dim = 16
    vecs, ids = [], []
    # three planted clusters of 5: base e_i plus a tiny distinct wiggle
    for c in range(3):
        for j in range(5):
            v = np.zeros(dim, dtype=np.float32)
            v[c] = 1.0
            v[3 + j] = 0.05
            vecs.append(v)
            ids.append(c * 5 + j)
    # five exactly-orthogonal singletons
    for j in range(5):
        v = np.zeros(dim, dtype=np.float32)
        v[8 + j] = 1.0
        vecs.append(v)
        ids.append(15 + j)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(ids), pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    flat = R.embedding_components(str(tmp_path))

    expected = {i: (i // 5) * 5 if i < 15 else i for i in ids}
    assert dict(zip(flat["vec_id"], flat["component"])) == expected

    # rewrite as many tiny shards → identical result
    (tmp_path / "embeddings.parquet").unlink()
    (tmp_path / "embeddings.parquet").mkdir()
    for i in range(5):
        pq.write_table(t.slice(i * 4, 4),
                       str(tmp_path / "embeddings.parquet" / f"p{i}.parquet"))
    sharded = R.embedding_components(str(tmp_path))
    pd.testing.assert_frame_equal(flat, sharded)


def test_top_revenue_suppliers_keeps_all_tied_winners(tmp_path):
    """Q15 semantics: equality-with-max must keep EVERY tied supplier —
    exact int64 revenue makes the tie deterministic (planted: two
    suppliers with identical totals, one strictly below)."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    li = pa.table({
        "l_suppkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        # supplier 1: 100.00*(1-0.10) + 10.00*(1-0.00) = 100.00
        # supplier 2: 50.00*(1-0.00)*2               = 100.00  (tie)
        # supplier 3: 99.99                           (just below)
        "l_extendedprice": pa.array([100.0, 10.0, 50.0, 50.0, 99.99]),
        "l_discount": pa.array([0.10, 0.0, 0.0, 0.0, 0.0]),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    sup = pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s3"]),
    })
    pq.write_table(sup, str(tmp_path / "supplier.parquet"))

    out = R.top_revenue_suppliers(str(tmp_path))
    assert out["s_suppkey"].tolist() == [1, 2]
    assert out["total_revenue"].tolist() == [100.0, 100.0]


def test_cheapest_part_per_brand_tie_breaks_to_lowest_partkey(tmp_path):
    """The int64 (cents·10⁹ + partkey) encoding must make price ties
    resolve to the LOWEST partkey — the same total order the oracle's
    row_number(ORDER BY p_retailprice, p_partkey) imposes (planted:
    two parts at the same price, one cheaper part in another brand)."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    part = pa.table({
        "p_partkey": pa.array([7, 3, 9], pa.int64()),
        "p_brand": pa.array(["B1", "B1", "B2"]),
        # B1: partkeys 7 and 3 tie at 5.00 → keep 3; B2: only part 9
        "p_retailprice": pa.array([5.0, 5.0, 2.5]),
    })
    pq.write_table(part, str(tmp_path / "part.parquet"))

    out = R.cheapest_part_per_brand(str(tmp_path))
    assert out["p_brand"].tolist() == ["B1", "B2"]
    assert out["p_partkey"].tolist() == [3, 9]
    assert out["p_retailprice"].tolist() == [5.0, 2.5]


def test_sole_late_suppliers_requires_multi_supplier_and_unique_late(tmp_path):
    """Q21 semantics at the boundary: a single-supplier order never
    counts (ns ≥ 2), nor does an order where BOTH suppliers were late
    (nlate = 1) — only the sole-late supplier on the two-supplier
    order survives."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    day = 86_400_000_000  # µs
    base = pd.Timestamp("2024-01-01").value // 1000  # µs epoch
    ts = lambda d: pd.Timestamp((base + d * day) * 1000)
    li = pa.table({
        # order 1: suppliers 1 (late) + 2 (on time)  → supplier 1 counts
        # order 2: supplier 3 alone, late            → ns=1, excluded
        # order 3: suppliers 1 + 2, BOTH late        → nlate=2, excluded
        "l_orderkey": pa.array([1, 1, 2, 3, 3], pa.int64()),
        "l_suppkey": pa.array([1, 2, 3, 1, 2], pa.int64()),
        "l_shipdate": pa.array([ts(100), ts(5), ts(100),
                                ts(100), ts(90)],
                               pa.timestamp("us")),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([ts(0)] * 3, pa.timestamp("us")),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    sup = pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s3"]),
    })
    pq.write_table(sup, str(tmp_path / "supplier.parquet"))

    out = R.sole_late_suppliers(str(tmp_path))
    assert out["s_suppkey"].tolist() == [1]
    assert out["numwait"].tolist() == [1]


def test_big_ticket_orders_empty_when_no_order_qualifies(tmp_path):
    """HAVING-rejoin with an EMPTY qualifying set: the aggregate-fed
    join (data_scaled_join bucketed fallback) must flow an empty,
    fully-schema'd result through sort/limit/enrichment — not crash on
    a schemaless empty partition (the ray 2.49 Dataset.join failure
    mode) or on the empty dim filter."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    ts = pd.Timestamp("2024-01-01")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_quantity": pa.array([5.0, 7.0]),  # both far below 200
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 20], pa.int64()),
        "o_orderdate": pa.array([ts, ts], pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 200.0]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
        "c_name": pa.array(["c10", "c20"]),
    }), str(tmp_path / "customer.parquet"))

    out = R.big_ticket_orders(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["c_name", "c_custkey", "o_orderkey",
                                 "orderdate", "o_totalprice", "total_qty"]


def test_arrowize_empty_batch_keeps_string_schema():
    """_arrowize must coerce the object→null inference pyarrow applies
    to ZERO-row frames back to string, so empty partial blocks don't
    clash with the string-typed blocks other batches emit."""
    from occular_ocr_ray.pipelines.relational import _arrowize

    def build(df):
        out = df[df["k"] == "nope"]  # empties every row
        return out[["k", "v"]]

    run = _arrowize(build)
    tbl = run(pa.table({"k": pa.array(["a", "b"]),
                        "v": pa.array([1, 2], pa.int64())}))
    assert tbl.num_rows == 0
    assert tbl.schema.field("k").type == pa.string()
    assert tbl.schema.field("v").type == pa.int64()


def test_data_scaled_join_both_routes_match_pandas_merge():
    """The <10k bucketed route and the ≥10k Dataset.join route must
    produce the same inner-join rows (column order aside)."""
    import ray.data as rd

    from occular_ocr_ray.stages.joins import data_scaled_join

    rng = np.random.default_rng(7)
    n = 12_000
    left = pd.DataFrame({"k": rng.integers(0, 3_000, n),
                         "a": rng.integers(0, 100, n)})
    right = pd.DataFrame({"rk": np.arange(2_500, dtype=np.int64),
                          "b": rng.integers(0, 100, 2_500)})
    expect = (left.merge(right, left_on="k", right_on="rk")
              .drop(columns=["rk"])
              .sort_values(["k", "a", "b"]).reset_index(drop=True))

    for sizing in (n, 5_000):  # Dataset.join route, bucketed route
        got = (data_scaled_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on=("k",), right_on=("rk",), sizing_rows=sizing)
            .to_pandas())
        got = (got[["k", "a", "b"]]
               .sort_values(["k", "a", "b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype("int64"), expect.astype("int64"))


def test_customer_order_distribution_zero_bucket(tmp_path):
    """Q13 semantics: customers with NO orders must surface as the
    c_count=0 bucket (the LEFT-JOIN row a plain orders groupby drops;
    planted: 3 of 5 customers orderless), and the bucket must be
    absent when every customer ordered — matching the SQL GROUP BY,
    which emits no empty groups."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64())}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64())}),
        str(tmp_path / "orders.parquet"))

    out = R.customer_order_distribution(str(tmp_path))
    assert out["c_count"].tolist() == [0, 1, 2]
    assert out["custdist"].tolist() == [3, 1, 1]

    # every customer orders → no zero row
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64())}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 2], pa.int64())}),
        str(tmp_path / "orders.parquet"))
    out = R.customer_order_distribution(str(tmp_path))
    assert out["c_count"].tolist() == [1, 2]
    assert out["custdist"].tolist() == [1, 1]


def test_disjunctive_part_revenue_branch_boundaries(tmp_path):
    """Q19 semantics at the predicate edges: quantity exactly at a
    branch's inclusive bound counts, one past it does not; lineitems
    whose part is a non-named brand — or missing from part entirely —
    never match (exercises the broadcast lookup's found-mask)."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    pq.write_table(pa.table({
        "p_partkey": pa.array([10, 20, 30], pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#1", "Brand#9"]),
        "p_size": pa.array([5, 40, 5], pa.int32()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        # part 10 (Brand#1, size 5): qty 20 → IN (boundary);
        #                            qty 21 → OUT (past bound)
        # part 20 (Brand#1, size 40): size outside 1-15 → OUT
        # part 30 (Brand#9): brand not named → OUT
        # part 99: absent from part → OUT (found-mask)
        "l_partkey": pa.array([10, 10, 20, 30, 99], pa.int64()),
        "l_quantity": pa.array([20.0, 21.0, 5.0, 5.0, 5.0]),
        "l_extendedprice": pa.array([100.0] * 5),
        "l_discount": pa.array([0.25] * 5),
    }), str(tmp_path / "lineitem.parquet"))

    out = R.disjunctive_part_revenue(str(tmp_path))
    assert out["n_items"].tolist() == [1]
    assert out["revenue"].tolist() == [75.0]


def test_sliding_distinct_users_dedupes_within_window(tmp_path):
    """COUNT DISTINCT semantics the sliding SUM lacks: a user firing
    twice inside one window counts once there, while a second user's
    single event still counts — per window, across both overlapping
    slides."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    base = pd.Timestamp("2024-01-01 10:00:00")
    pq.write_table(pa.table({
        # user 1 at 10:00 and 10:10 (same two windows); user 2 at 10:10
        "ts": pa.array([base, base + pd.Timedelta(minutes=10),
                        base + pd.Timedelta(minutes=10)],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2], pa.int64()),
    }), str(tmp_path / "events.parquet"))

    out = R.sliding_distinct_users(str(tmp_path))
    # both events fall in windows starting 09:30 and 10:00
    assert out["window_start"].tolist() == [
        "2024-01-01 09:30:00", "2024-01-01 10:00:00"]
    assert out["n_users"].tolist() == [2, 2]


def test_covered_purchasers_strict_prior_view_semantics(tmp_path):
    """FOR-ALL division at the boundary: a view at the SAME timestamp
    as the earliest purchase does not cover it (strict <); users with
    only views, or whose first purchase precedes every view, drop;
    non-view/purchase event types are invisible to the quantifier."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    t = lambda s: pd.Timestamp(f"2024-01-01 00:00:{s:02d}")
    ev = pa.table({
        "event_id": pa.array(range(11), pa.int64()),
        "user_id": pa.array([1, 1, 2, 2, 3, 3, 4, 5, 5, 5, 6],
                            pa.int64()),
        "event_type": pa.array([
            "view", "purchase",        # u1: covered → IN
            "view", "purchase",        # u2: tie ts → OUT (strict <)
            "purchase", "view",        # u3: view after → OUT
            "view",                    # u4: no purchase → OUT
            "view", "purchase", "purchase",  # u5: both covered → IN
            "purchase",                # u6: no view at all → OUT
        ]),
        "ts": pa.array([t(1), t(2),
                        t(5), t(5),
                        t(3), t(4),
                        t(1),
                        t(1), t(2), t(9),
                        t(1)], pa.timestamp("us")),
    })
    pq.write_table(ev, str(tmp_path / "events.parquet"))

    out = R.covered_purchasers(str(tmp_path))
    assert out["user_id"].tolist() == [1, 5]


def _q8_q9_dims(tmp_path):
    import pyarrow.parquet as pq

    nation = pa.table({
        "n_nationkey": pa.array([7, 8], pa.int64()),
        "n_name": pa.array(["NATION_7", "NATION_8"]),
        "n_regionkey": pa.array([2, 3], pa.int64()),
    })
    pq.write_table(nation, str(tmp_path / "nation.parquet"))
    region = pa.table({
        "r_regionkey": pa.array([2, 3], pa.int64()),
        "r_name": pa.array(["ASIA", "EUROPE"]),
    })
    pq.write_table(region, str(tmp_path / "region.parquet"))
    sup = pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([7, 8], pa.int64()),  # 1→target nation
    })
    pq.write_table(sup, str(tmp_path / "supplier.parquet"))


def test_nation_market_share_zero_and_full_years(tmp_path):
    """Q8 semantics: a year where the target nation supplied nothing
    reads share 0.0 (not a dropped row), a year it supplied everything
    reads exactly 1.0; non-STANDARD parts and non-ASIA customers never
    enter the denominator."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    _q8_q9_dims(tmp_path)
    pq.write_table(pa.table({
        "p_partkey": pa.array([10, 11], pa.int64()),
        "p_type": pa.array(["STANDARD", "PROMO"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([100, 101], pa.int64()),
        "c_nationkey": pa.array([7, 8], pa.int64()),  # 100 ASIA, 101 not
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([100, 100, 101, 100], pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp("1995-06-01"),
                                 pd.Timestamp("1996-06-01"),
                                 pd.Timestamp("1995-07-01"),
                                 pd.Timestamp("1995-08-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # 1995: order 1 via non-target supplier 2 (STANDARD, ASIA) and
        #       order 4 via PROMO part (excluded) → share 0.0
        # 1996: order 2 via target supplier 1 only → share 1.0
        # order 3: non-ASIA customer → excluded entirely
        "l_orderkey": pa.array([1, 4, 2, 3], pa.int64()),
        "l_partkey": pa.array([10, 11, 10, 10], pa.int64()),
        "l_suppkey": pa.array([2, 1, 1, 1], pa.int64()),
        "l_extendedprice": pa.array([100.0, 40.0, 80.0, 70.0]),
        "l_discount": pa.array([0.0, 0.0, 0.25, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))

    out = R.nation_market_share(str(tmp_path))
    assert out["o_year"].tolist() == [1995, 1996]
    assert out["mkt_share"].tolist() == [0.0, 1.0]


def test_product_type_profit_signed_amounts(tmp_path):
    """Q9 semantics: profit is SIGNED (cost can exceed revenue) and
    exact — planted cents make the expected dollars representable;
    non-widget parts never enter."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    _q8_q9_dims(tmp_path)
    pq.write_table(pa.table({
        "p_partkey": pa.array([10, 11], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt"]),
        "p_retailprice": pa.array([30.0, 1.0]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp("1995-06-01"),
                                 pd.Timestamp("1996-06-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # 1995 / NATION_7 (supp 1): 100.00 − 30.00×2 = +40.00
        # 1996 / NATION_8 (supp 2):  10.00 − 30.00×2 = −50.00
        # non-widget part 11 row: excluded
        "l_orderkey": pa.array([1, 2, 1], pa.int64()),
        "l_partkey": pa.array([10, 10, 11], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1], pa.int64()),
        "l_quantity": pa.array([2.0, 2.0, 5.0]),
        "l_extendedprice": pa.array([100.0, 10.0, 99.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))

    out = R.product_type_profit(str(tmp_path))
    assert list(zip(out["nation"], out["o_year"], out["sum_profit"])) == [
        ("NATION_7", 1995, 40.0), ("NATION_8", 1996, -50.0)]


def test_longest_daily_streak_islands(tmp_path):
    """Gaps-and-islands boundaries: duplicate events on one day count
    once; a 1-day gap breaks the run; day boundaries are UTC epoch
    days (23:59 → 00:01 on adjacent days IS consecutive)."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    T = pd.Timestamp
    ev = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([
            # u1: days 1,1(dup),2,3 then gap to 5 → streak 3
            T("2024-01-01 10:00"), T("2024-01-01 23:59"),
            T("2024-01-02 00:01"), T("2024-01-03 12:00"),
            T("2024-01-05 09:00"),
            # u2: days 7 and 9 → streak 1
            T("2024-01-07"), T("2024-01-09"),
            # u3: one event → streak 1
            T("2024-02-01"),
        ], pa.timestamp("us")),
    })
    pq.write_table(ev, str(tmp_path / "events.parquet"))

    out = R.longest_daily_streak(str(tmp_path))
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["streak_days"].tolist() == [3, 1, 1]


def test_events_trailing_hour_sum_peer_and_boundary(tmp_path):
    """RANGE-frame semantics: rows at the SAME timestamp are peers —
    each sees the other's value — and an event exactly 1h earlier is
    INSIDE the frame (inclusive boundary) while 1h+1µs is out."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    T = pd.Timestamp
    ev = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array([
            T("2024-01-01 10:00:00"),           # e1
            T("2024-01-01 11:00:00"),           # e2: e1 exactly 1h back → in
            T("2024-01-01 11:00:00"),           # e3: peer of e2
            T("2024-01-01 12:00:00.000001"),    # e4: e2/e3 out by 1µs... 
            T("2024-01-01 10:30:00"),           # e5: other user
        ], pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0]),
    })
    pq.write_table(ev, str(tmp_path / "events.parquet"))

    out = R.events_trailing_hour_sum(str(tmp_path))
    got = dict(zip(out["event_id"], out["trailing_sum"]))
    assert got[1] == 1.0          # alone
    assert got[2] == 7.0          # 1 + 2 + 4 (peer e3 included, e1 at -1h in)
    assert got[3] == 7.0          # identical frame to e2
    assert got[4] == 8.0          # e2/e3 fell out by 1 µs
    assert got[5] == 16.0         # user isolation


def test_pairs_within_runs_matches_combinations():
    """The vectorized run-pair kernel equals itertools.combinations per
    run, including empty runs, singleton runs, and a long run."""
    import itertools

    from occular_ocr_ray.pipelines.relational import _pairs_within_runs

    rng = np.random.default_rng(7)
    keys, vals = [], []
    v = 0
    for k, ln in enumerate([1, 4, 2, 1, 9, 3]):
        run = sorted(rng.choice(10_000, size=ln, replace=False) + v)
        keys += [k] * ln
        vals += run
        v += 20_000
    keys = np.asarray(keys, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.int64)
    lo, hi = _pairs_within_runs(keys, vals)
    got = sorted(zip(lo.tolist(), hi.tolist()))
    want = []
    for k in np.unique(keys):
        run = vals[keys == k]
        want += list(itertools.combinations(run.tolist(), 2))
    assert got == sorted(want)
    # empty input
    e1, e2 = _pairs_within_runs(np.empty(0, np.int64), np.empty(0, np.int64))
    assert len(e1) == 0 and len(e2) == 0


def test_copurchase_triangles_planted(tmp_path):
    """Planted graph: order A = parts {1,2,3} (one triangle), order B =
    parts {3,4} plus order C = parts {4,5} (open wedges, no closure),
    order D repeats {1,2} (edge dedup — still one triangle).  Also
    sharding-invariant: two input files give the same counts."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    rows = [
        (100, 1), (100, 2), (100, 3),   # triangle 1-2-3
        (101, 3), (101, 4),             # wedge via 3
        (102, 4), (102, 5),             # chain, no closure
        (103, 1), (103, 2),             # duplicate edge (1,2)
        (103, 1),                       # duplicate line within order
    ]
    t = pa.table({
        "l_orderkey": pa.array([o for o, _ in rows], pa.int64()),
        "l_partkey": pa.array([p for _, p in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = R.copurchase_triangles(str(tmp_path))
    # edges: (1,2) (1,3) (2,3) (3,4) (4,5) — deduped
    assert out["n_edges"].tolist() == [5]
    assert out["triangles"].tolist() == [1]

    # sharding invariance: two row groups split order 101 across read
    # tasks — the order-bucket groupby reunites it before pair-gen
    sh = tmp_path / "sharded"
    sh.mkdir()
    pq.write_table(t, str(sh / "lineitem.parquet"), row_group_size=4)
    out2 = R.copurchase_triangles(str(sh))
    pd.testing.assert_frame_equal(out, out2)

    # degree vs id orientation must agree — including around a hub,
    # where the rank ordering actually flips edges (hub part 9 has
    # degree 7; under degree rank every 9-edge points INTO 9, under id
    # rank they all point OUT of it)
    hub = [(200 + i, 9) for i in range(5)] + [
        (200, 10), (201, 11), (202, 12), (203, 13),
        (204, 14), (204, 15),           # triangle 9-14-15
    ]
    t2 = pa.concat_tables([t, pa.table({
        "l_orderkey": pa.array([o for o, _ in hub], pa.int64()),
        "l_partkey": pa.array([p for _, p in hub], pa.int64()),
    })])
    hb = tmp_path / "hub"
    hb.mkdir()
    pq.write_table(t2, str(hb / "lineitem.parquet"))
    deg = R.copurchase_triangles(str(hb), orientation="degree")
    byid = R.copurchase_triangles(str(hb), orientation="id")
    pd.testing.assert_frame_equal(deg, byid)
    assert deg["n_edges"].tolist() == [12]   # +7 hub edges
    assert deg["triangles"].tolist() == [2]  # +{9,14,15}


def test_acctbal_percent_rank_ties_and_bucket_boundary(tmp_path):
    """percent_rank edges: min-rank ties (three equal balances share
    one pr), values straddling the 1024-cent range-bucket boundary get
    globally-correct ranks from the offset pass, a single-customer
    segment reports pr = 0, and negatives rank below positives."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    bal = [-5.00, 10.23, 10.23, 10.23, 10.24, 99.99]  # 1023 vs 1024 cents
    cust = pa.table({
        "c_custkey": pa.array(list(range(1, 7)) + [7], pa.int64()),
        "c_mktsegment": pa.array(["A"] * 6 + ["B"]),
        "c_acctbal": pa.array(bal + [42.0]),
    })
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    out = R.acctbal_percent_rank(str(tmp_path))
    got = dict(zip(out["c_custkey"], out["pr"]))
    n = 6
    assert got[1] == 0.0                      # rank 1
    assert got[2] == got[3] == got[4] == (2 - 1) / (n - 1)  # min-rank ties
    assert got[5] == (5 - 1) / (n - 1)        # first of next range bucket
    assert got[6] == 1.0                      # rank 6
    assert got[7] == 0.0                      # singleton segment: pr = 0


def test_surplus_suppliers_strict_threshold(tmp_path):
    """The 8·q > total compare is STRICT: a supplier at exactly 1/8 of
    a part's quantity is excluded; just above is included; counts sum
    across dominated parts."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    # part 1: total 800 → s1 ships exactly 100 (=1/8, out), s2 ships
    # 101 (in), s3 the remaining 599 (in).
    # part 2: s2 ships all of it (in) → s2 dominates two parts.
    li = pa.table({
        "l_partkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([1, 2, 3, 2], pa.int64()),
        "l_quantity": pa.array([100.0, 101.0, 599.0, 7.0]),
    })
    sup = pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s3"]),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    pq.write_table(sup, str(tmp_path / "supplier.parquet"))
    out = R.surplus_suppliers(str(tmp_path))
    assert out["s_suppkey"].tolist() == [2, 3]
    assert out["n_dominated"].tolist() == [2, 1]
    assert out["s_name"].tolist() == ["s2", "s3"]


def test_part_reach_hops_planted_chain(tmp_path):
    """Planted path graph 1-2-3-4-5 (one order per edge) plus a
    disconnected component {8,9}: BFS from seed=1 finds exactly one
    new part per hop, stops at max_hops=3 (part 5 unreached), and the
    disconnected component never appears."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)]
    t = pa.table({
        "l_orderkey": pa.array(
            [o for o, pr in enumerate(pairs) for _ in pr], pa.int64()),
        "l_partkey": pa.array([p for pr in pairs for p in pr], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = R.part_reach_hops(str(tmp_path))
    assert out["hop"].tolist() == [1, 2, 3]
    assert out["n_parts"].tolist() == [1, 1, 1]


# --- set-similarity join (prefix filtering) ----------------------------
def test_simjoin_matches_bruteforce_on_random_strings():
    """Prefix filtering must lose NO pairs: parity with the O(n^2)
    reference over adversarial random strings (shared substrings, short
    strings below the gram width, duplicates)."""
    import random

    import ray.data as rd

    from occular_ocr_ray.stages.simjoin import (
        similarity_self_join, similarity_self_join_bruteforce)

    r = random.Random(7)
    words = ["abc", "abcd", "xyzq", "ab", "a", "zqab", "abcz", "qqqq"]
    vals = ["".join(r.choice(words) for _ in range(r.randint(1, 3)))
            for _ in range(120)]
    for tau in (0.3, 0.5, 0.8):
        got = similarity_self_join(
            rd.from_pandas(pd.DataFrame({"v": vals})), "v", threshold=tau)
        exp = similarity_self_join_bruteforce(vals, threshold=tau)
        got_pairs = list(zip(got["name_a"], got["name_b"]))
        assert got_pairs == [(a, b) for a, b, _ in exp]
        for j_got, (_, _, j_exp) in zip(got["jaccard"], exp):
            assert abs(j_got - j_exp) <= 5e-5  # stage rounds to 4 digits


def test_simjoin_prefix_shorter_than_full_gram_set():
    """The blocking pass must emit strictly fewer grams than the full
    sets at a real threshold (the operator's entire cost story)."""
    from occular_ocr_ray.stages.simjoin import _prefix_len, char_ngrams

    s = "small yellow bolt"
    n_grams = len(char_ngrams(s))
    assert _prefix_len(n_grams, 0.8) < n_grams
    assert _prefix_len(1, 0.8) == 1  # short-string fallback emits itself


# --- exact phi-heavy-hitters (CMS-pruned two-pass) ----------------------
def _hh_bruteforce(items, phi):
    import collections
    c = collections.Counter(str(v) for v in items)
    n = sum(c.values())
    keep = [(t, k) for t, k in c.items() if k >= phi * n]
    return sorted(keep, key=lambda p: (-p[1], p[0]))


def test_heavy_hitters_matches_bruteforce_zipf():
    """Exactness across phi levels on a zipf-ish key distribution —
    including phi small enough that most keys qualify and large enough
    that none do."""
    import random

    import ray.data as rd

    from occular_ocr_ray.stages.sketch_agg import heavy_hitters

    r = random.Random(11)
    items = [str(min(int(r.paretovariate(1.2)), 40)) for _ in range(3000)]
    ds = rd.from_pandas(pd.DataFrame({"k": items}))
    for phi in (0.001, 0.02, 0.3, 0.9):
        got = heavy_hitters(ds, "k", phi=phi, batch_size=256)
        exp = _hh_bruteforce(items, phi)
        assert list(zip(got["item"], got["cnt"])) == exp


def test_heavy_hitters_partitioning_invariant_and_tiny_sketch():
    """Result is identical under repartitioning AND under a
    collision-saturated sketch (width=8): the CMS only prunes, never
    decides — correctness cannot depend on sketch size."""
    import ray.data as rd

    from occular_ocr_ray.stages.sketch_agg import heavy_hitters

    items = ["hot"] * 500 + ["warm"] * 60 + [f"cold{i}" for i in range(440)]
    df = pd.DataFrame({"k": items})
    exp = _hh_bruteforce(items, 0.05)
    for nparts in (1, 7):
        ds = rd.from_pandas(df).repartition(nparts)
        got = heavy_hitters(ds, "k", phi=0.05, batch_size=64,
                            width=8, depth=2)
        assert list(zip(got["item"], got["cnt"])) == exp


def test_heavy_hitters_threshold_boundary_and_empty():
    """An item at EXACTLY phi*N is included (>= semantics, matching the
    SQL oracle); one below is excluded; empty input returns the typed
    empty frame."""
    import ray.data as rd

    from occular_ocr_ray.stages.sketch_agg import heavy_hitters

    # N=100, phi=0.1 -> bar is 10: "edge" has exactly 10, "under" has 9
    items = ["edge"] * 10 + ["under"] * 9 + [f"u{i}" for i in range(81)]
    ds = rd.from_pandas(pd.DataFrame({"k": items}))
    got = heavy_hitters(ds, "k", phi=0.1, batch_size=16)
    assert list(got["item"]) == ["edge"]
    assert list(got["cnt"]) == [10]

    empty = heavy_hitters(
        rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype=str)})),
        "k", phi=0.1)
    assert len(empty) == 0
    assert list(empty.columns) == ["item", "cnt"]


# --- BM25 top-k search --------------------------------------------------
def _bm25_bruteforce(docs, terms, k, k1=1.2, b=0.75, digits=4):
    import collections
    import math
    n = len(docs)
    tokd = [d.split() for d in docs]
    total = sum(len(t) for t in tokd)
    avgdl = total / n
    rows = []
    for i, toks in enumerate(tokd):
        dl = len(toks)
        if not dl:
            continue
        c = collections.Counter(toks)
        s = 0.0
        for t in sorted(set(terms)):
            tf = c.get(t, 0)
            df = sum(1 for tt in tokd if t in tt)
            if tf:
                s += (math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                      * (tf * (k1 + 1.0))
                      / (tf + k1 * ((1.0 - b) + b * dl / avgdl)))
        if s > 0:
            rows.append((round(s, digits), i))
    rows.sort(key=lambda r: (-r[0], r[1]))
    return [(i, s) for s, i in rows[:k]]


def test_bm25_matches_bruteforce_and_partitioning():
    import random

    import ray.data as rd

    from occular_ocr_ray.stages.text_analysis import bm25_topk

    r = random.Random(3)
    vocab = ["alpha", "beta", "gamma", "delta", "rare", "spark"]
    docs = [" ".join(r.choices(vocab, weights=[8, 6, 4, 3, 1, 2],
                               k=r.randint(1, 40))) for _ in range(400)]
    docs[7] = ""  # empty doc must not crash or score
    exp = _bm25_bruteforce(docs, ["rare", "spark"], k=10)
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    for nparts in (1, 8):
        ds = rd.from_pandas(df).repartition(nparts)
        got = bm25_topk(ds, ["rare", "spark"], k=10, batch_size=32)
        assert list(zip(got["doc_id"], got["score"])) == exp


def test_bm25_no_hits_and_empty_query():
    import ray.data as rd

    from occular_ocr_ray.stages.text_analysis import bm25_topk

    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b c", "c d e"]}))
    assert len(bm25_topk(ds, ["zzz"], k=5)) == 0
    assert len(bm25_topk(ds, [], k=5)) == 0


# --- entity resolution: simjoin pairs -> CC clusters --------------------
def test_part_name_clusters_planted_chain(tmp_path):
    """Planted transitive chain: "one two three" ~ "two three four" ~
    "three four five" (adjacent Jaccard >= 0.4, endpoints 0.14 — below)
    must still land in ONE cluster labeled by the lexicographic min, while
    an unrelated singleton stays its own cluster — the property a
    pairwise-threshold join alone cannot express."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R
    from occular_ocr_ray.stages.simjoin import char_ngrams

    chain = ["one two three", "two three four", "three four five"]
    lone = "zz qq ww totally other"

    def jac(a, b):
        ga, gb = char_ngrams(a), char_ngrams(b)
        return len(ga & gb) / len(ga | gb)

    assert jac(chain[0], chain[1]) >= 0.4 and jac(chain[1], chain[2]) >= 0.4
    assert jac(chain[0], chain[2]) < 0.4  # endpoints only join via CC
    assert jac(chain[0], lone) < 0.4

    t = pa.table({"p_name": pa.array(chain + [lone] + [chain[0]])})
    pq.write_table(t, str(tmp_path / "part.parquet"))
    out = R.part_name_clusters(str(tmp_path))
    got = dict(zip(out["p_name"], out["cluster"]))
    assert got[chain[0]] == got[chain[1]] == got[chain[2]] == min(chain)
    assert got[lone] == lone
    assert len(out) == 4  # distinct names only, duplicate row collapsed


# --- Pareto frontier / grouped regression -------------------------------
def test_part_skyline_matches_bruteforce_with_ties(tmp_path):
    """Local-prune skyline must equal the O(n^2) definition on points
    with duplicated coordinates (duplicates don't dominate each other)
    and tied prices; invariant under sharding."""
    import random

    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    r = random.Random(5)
    pts = [(float(r.randint(1, 12)), r.randint(1, 12)) for _ in range(300)]
    pts += pts[:10]  # exact duplicate points
    keys = list(range(len(pts)))
    t = pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_retailprice": pa.array([p for p, _ in pts], pa.float64()),
        "p_size": pa.array([s for _, s in pts], pa.int32()),
    })

    def dominated(i):
        pi, si = pts[i]
        return any((q <= pi and t <= si and (q < pi or t < si))
                   for q, t in pts)

    exp = sorted(k for k in keys if not dominated(k))
    for nfiles in (1, 4):
        import shutil
        d = tmp_path / f"shard{nfiles}"
        d.mkdir()
        per = (len(keys) + nfiles - 1) // nfiles
        for f in range(nfiles):
            pq.write_table(t.slice(f * per, per),
                           str(d / f"part_{f}.parquet"))
        # relational._t reads the whole dir via the table name glob
        shutil.move(str(d / "part_0.parquet"), str(d / "part.parquet"))
        out = R.part_skyline(str(d))
        assert out["p_partkey"].tolist() == exp


def test_price_qty_regression_planted_exact_line(tmp_path):
    """Points on y = 3x + 7 exactly must recover slope 3, intercept 7
    (moment cancellation benign after the fixed shift)."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    x = np.arange(1, 51, dtype=np.float64)
    t = pa.table({
        "l_returnflag": pa.array(["A"] * 50),
        "l_quantity": pa.array(x, pa.float64()),
        "l_extendedprice": pa.array(3.0 * x + 7.0, pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = R.price_qty_regression(str(tmp_path))
    assert out["slope"].tolist() == [3.0]
    assert out["intercept"].tolist() == [7.0]
    assert out["n_items"].tolist() == [50]


def test_lineitem_measure_stats_planted(tmp_path):
    """Unpivot rollup on a tiny planted fact: exact cent sums, per-
    measure min/max, and all four measure rows present."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    t = pa.table({
        "l_quantity": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "l_extendedprice": pa.array([10.25, 20.50, 0.01], pa.float64()),
        "l_discount": pa.array([0.05, 0.00, 0.10], pa.float64()),
        "l_tax": pa.array([0.02, 0.08, 0.04], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = R.lineitem_measure_stats(str(tmp_path))
    assert out["measure"].tolist() == [
        "l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    assert out["n"].tolist() == [3, 3, 3, 3]
    assert out["total"].tolist() == [0.15, 30.76, 6.0, 0.14]
    assert out["min_v"].tolist() == [0.0, 0.01, 1.0, 0.02]
    assert out["max_v"].tolist() == [0.10, 20.50, 3.0, 0.08]


def test_price_qty_spearman_planted_monotone_and_ties(tmp_path):
    """Perfectly monotone pairs give rho = 1; an anti-monotone flag
    gives rho = -1; a tie-heavy flag matches the closed-form
    tie-averaged value."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    # flag A: qty i, price 100*i (monotone); flag B: price reversed;
    # flag C: qty all equal except one (tie-averaged ranks)
    qa = np.arange(1, 21, dtype=np.float64)
    t = pa.table({
        "l_returnflag": pa.array(["A"] * 20 + ["B"] * 20 + ["C"] * 4),
        "l_quantity": pa.array(
            np.concatenate([qa, qa, [5.0, 5.0, 5.0, 9.0]]), pa.float64()),
        "l_extendedprice": pa.array(
            np.concatenate([qa * 100, qa[::-1] * 100,
                            [10.0, 20.0, 30.0, 40.0]]), pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = R.price_qty_spearman(str(tmp_path))
    got = dict(zip(out["l_returnflag"], out["spearman_rho"]))
    assert got["A"] == 1.0
    assert got["B"] == -1.0
    # flag C closed form: r1 = (2,2,2,4), r2 = (1,2,3,4) → rho = 3/sqrt(3*5)
    import math
    want = round(3 / math.sqrt(3 * 5) / 1, 6)
    assert abs(got["C"] - 0.774597) < 1e-6 and abs(got["C"] - want) < 1e-6
    assert out["n_items"].tolist() == [20, 20, 4]


def test_brand_weighted_median_planted_boundary(tmp_path):
    """Lower weighted median: with weights (1, 1) the cumulative hits
    exactly half AT the first value — it must be chosen; with weights
    (1, 2) the second value carries the majority."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["X", "Y"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_quantity": pa.array([1.0, 1.0, 1.0, 2.0], pa.float64()),
        "l_extendedprice": pa.array([10.0, 20.0, 10.0, 20.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = R.brand_weighted_median(str(tmp_path))
    got = dict(zip(out["p_brand"], out["weighted_median_price"]))
    assert got["X"] == 10.0  # 2*cw(10)=2 >= tw=2 → lower median
    assert got["Y"] == 20.0  # 2*cw(10)=2 < tw=3 → second value
    assert dict(zip(out["p_brand"], out["total_qty"])) == {"X": 2, "Y": 3}


def test_brand_trimmed_mean_planted(tmp_path):
    """k = n//10 rows cut per side; a cut that lands INSIDE a repeated
    value trims it partially by weight; n < 10 degrades to the plain
    mean."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["X", "Y", "Z"]),
    }), str(tmp_path / "part.parquet"))
    # X: 1..10 → drop 1 and 10, mean(2..9) = 5.5
    # Y: five 10s, four 20s, one 30 → drop one 10 (partial: value has
    #    weight 5) and the 30 → (4·10 + 4·20)/8 = 15.0
    # Z: n=3 < 10 → k=0 → plain mean of (10, 20, 40) = 23.3333
    keys = [1] * 10 + [2] * 10 + [3] * 3
    prices = ([float(i) for i in range(1, 11)]
              + [10.0] * 5 + [20.0] * 4 + [30.0]
              + [10.0, 20.0, 40.0])
    pq.write_table(pa.table({
        "l_partkey": pa.array(keys, pa.int64()),
        "l_extendedprice": pa.array(prices, pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = R.brand_trimmed_mean(str(tmp_path))
    got = dict(zip(out["p_brand"], out["trimmed_mean_price"]))
    assert got == {"X": 5.5, "Y": 15.0, "Z": 23.3333}
    assert dict(zip(out["p_brand"], out["n_rows"])) == {"X": 10, "Y": 10, "Z": 3}


def test_brand_price_mad_planted(tmp_path):
    """Lower-median convention on both passes; the MAD shrugs off an
    outlier that would wreck a stddev."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["X", "Y"]),
    }), str(tmp_path / "part.parquet"))
    # X: (1,2,3,4,100) → med 3, |d| = (2,1,0,1,97) → mad 1
    # Y: (10,20,30,40) even n → LOWER med 20, |d| = (10,0,10,20) → mad 10
    pq.write_table(pa.table({
        "l_partkey": pa.array([1] * 5 + [2] * 4, pa.int64()),
        "l_extendedprice": pa.array(
            [1.0, 2.0, 3.0, 4.0, 100.0, 10.0, 20.0, 30.0, 40.0],
            pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = R.brand_price_mad(str(tmp_path))
    assert dict(zip(out["p_brand"], out["median_price"])) == {"X": 3.0, "Y": 20.0}
    assert dict(zip(out["p_brand"], out["mad_price"])) == {"X": 1.0, "Y": 10.0}


def test_source_oov_rate_planted(tmp_path):
    """Tokens below min_freq are OOV even when frequent within one
    source; the top-V cap evicts the rarest in-threshold token; all-
    empty sources vanish (matching the SQL replica)."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    # corpus freqs: alpha 5 (vocab), beta 4 (< min_freq → OOV),
    # gamma 5 (vocab) but with vocab_size=1 only alpha survives (tie on
    # freq 5 → token ASC → alpha)
    pq.write_table(pa.table({
        "source": pa.array(["s1", "s1", "s2", "s3"]),
        "text": pa.array([
            "alpha alpha beta",
            "gamma gamma gamma",
            "alpha alpha alpha beta beta beta gamma gamma",
            "",
        ]),
    }), str(tmp_path / "documents.parquet"))
    out = R.source_oov_rate(str(tmp_path), min_freq=5, vocab_size=256)
    assert out["source"].tolist() == ["s1", "s2"]  # s3 all-empty → gone
    got = out.set_index("source")
    assert got.loc["s1", "n_tokens"] == 6 and got.loc["s1", "n_oov"] == 1
    assert got.loc["s2", "n_tokens"] == 8 and got.loc["s2", "n_oov"] == 3
    assert got.loc["s2", "oov_rate"] == 0.375

    out1 = R.source_oov_rate(str(tmp_path), min_freq=5, vocab_size=1)
    got1 = out1.set_index("source")
    # gamma evicted by the cap → its 5 occurrences turn OOV
    assert got1.loc["s1", "n_oov"] == 4 and got1.loc["s2", "n_oov"] == 5


def test_peak_concurrent_events_planted(tmp_path):
    """Cross-bucket offset correctness (the peak spans an hour
    boundary), and the close-before-open tie rule (a window ending
    exactly when another opens never counts as concurrent)."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    # e1 opens 10:59, e2 opens 11:10 → both live in [11:10, 11:29) —
    # the peak (2) is attained in hour-bucket 11, whose entry offset
    # must carry e1's still-open +1 from bucket 10
    ts = pd.to_datetime(["2024-01-01 10:59:00", "2024-01-01 11:10:00"])
    pq.write_table(pa.table({"ts": pa.array(ts)}),
                   str(tmp_path / "events.parquet"))
    out = R.peak_concurrent_events(str(tmp_path))
    assert out["peak"].iloc[0] == 2
    assert out["first_peak_ts"].iloc[0] == "2024-01-01 11:10:00"

    # touching windows: [12:00, 12:30) closes exactly as the next opens
    ts = pd.to_datetime(["2024-01-01 12:00:00", "2024-01-01 12:30:00"])
    pq.write_table(pa.table({"ts": pa.array(ts)}),
                   str(tmp_path / "events.parquet"))
    out = R.peak_concurrent_events(str(tmp_path))
    assert out["peak"].iloc[0] == 1
    assert out["first_peak_ts"].iloc[0] == "2024-01-01 12:00:00"


def test_user_active_seconds_planted(tmp_path):
    """Closed forms: overlapping windows merge (gap < W clips), disjoint
    windows add full W, duplicates add zero."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    ts = pd.to_datetime([
        # u1: 10:00 and 10:10 overlap → 600 + 1800 = 2400
        "2024-01-01 10:00:00", "2024-01-01 10:10:00",
        # u2: 10:00 and 12:00 disjoint → 1800 + 1800 = 3600
        "2024-01-01 10:00:00", "2024-01-01 12:00:00",
        # u3: duplicate instant → 0 + 1800
        "2024-01-01 10:00:00", "2024-01-01 10:00:00",
    ])
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "ts": pa.array(ts),
    }), str(tmp_path / "events.parquet"))
    out = R.user_active_seconds(str(tmp_path))
    assert dict(zip(out["user_id"], out["active_seconds"])) == {
        1: 2400, 2: 3600, 3: 1800}


def test_source_size_gini_planted(tmp_path):
    """Closed forms: equal sizes → 0; sizes (1, 9) → (2·(1·1+2·9) − 3·10)
    / (2·10) = 8/20 = 0.4."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    pq.write_table(pa.table({
        "source": pa.array(["a"] * 5 + ["b"] * 5),
    }), str(tmp_path / "documents.parquet"))
    out = R.source_size_gini(str(tmp_path))
    assert out["gini"].iloc[0] == 0.0
    assert out["n_sources"].iloc[0] == 2 and out["n_docs"].iloc[0] == 10

    pq.write_table(pa.table({
        "source": pa.array(["a"] + ["b"] * 9),
    }), str(tmp_path / "documents.parquet"))
    out = R.source_size_gini(str(tmp_path))
    assert out["gini"].iloc[0] == 0.4


def test_segment_priority_chi2_planted(tmp_path):
    """A perfectly proportional table scores chi² = 0; a diagonal 2×2
    (with its zero cells reindexed in) scores the closed-form n."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    def write(custs, orders):
        pq.write_table(pa.table({
            "c_custkey": pa.array([k for k, _ in custs], pa.int64()),
            "c_mktsegment": pa.array([s for _, s in custs]),
        }), str(tmp_path / "customer.parquet"))
        pq.write_table(pa.table({
            "o_custkey": pa.array([k for k, _ in orders], pa.int64()),
            "o_orderpriority": pa.array([p for _, p in orders]),
        }), str(tmp_path / "orders.parquet"))

    # independent: A row = (10, 20), B row = (20, 40) — e == observed
    write([(1, "A"), (2, "B")],
          [(1, "P")] * 10 + [(1, "Q")] * 20 + [(2, "P")] * 20 + [(2, "Q")] * 40)
    out = R.segment_priority_chi2(str(tmp_path))
    total = out[out["segment"] == "__total"]
    assert total["contrib"].iloc[0] == 0.0
    assert total["observed"].iloc[0] == 90
    assert (out[out["segment"] != "__total"]["contrib"] == 0.0).all()

    # diagonal: A-P 10, B-Q 10, zero off-diagonal → every e = 5,
    # contribs 5+5+5+5 → chi2 = 20 = n (perfect association, 2×2)
    write([(1, "A"), (2, "B")], [(1, "P")] * 10 + [(2, "Q")] * 10)
    out = R.segment_priority_chi2(str(tmp_path))
    assert len(out) == 5  # 4 cells (2 reindexed zeros) + total
    zero_cells = out[(out["observed"] == 0) & (out["segment"] != "__total")]
    assert len(zero_cells) == 2 and (zero_cells["expected"] == 5.0).all()
    assert out[out["segment"] == "__total"]["contrib"].iloc[0] == 20.0


def test_bigram_pmi_planted_ordering(tmp_path):
    """A bigram that ALWAYS co-occurs outranks one diluted by extra
    unigram mass; counts below the threshold never surface."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    # "alpha beta" 12× (alpha/beta appear only together);
    # "gamma delta" 12× but gamma also appears 24× alone → lower pmi;
    # "rare pair" 2× → below MIN_CNT, must not appear
    docs = (["alpha beta"] * 12 + ["gamma delta"] * 12
            + ["gamma"] * 24 + ["rare pair"] * 2)
    pq.write_table(pa.table({"text": pa.array(docs)}),
                   str(tmp_path / "documents.parquet"))
    out = R.bigram_pmi(str(tmp_path))
    pairs = list(zip(out["tok1"], out["tok2"]))
    assert pairs[0] == ("alpha", "beta")
    assert ("gamma", "delta") in pairs
    assert ("rare", "pair") not in pairs
    pmi = dict(zip(pairs, out["pmi"]))
    assert pmi[("alpha", "beta")] > pmi[("gamma", "delta")]


def test_source_vocab_jaccard_planted(tmp_path):
    """Disjoint vocabularies → 0; identical → 1; half-overlap → 1/3
    (|A∩B|=1, |A∪B|=3)."""
    import pyarrow.parquet as pq

    from occular_ocr_ray.pipelines import relational as R

    pq.write_table(pa.table({
        "source": pa.array(["s1", "s1", "s2", "s3", "s4"]),
        "text": pa.array(["a b", "b a a", "a b", "x y", "b x"]),
    }), str(tmp_path / "documents.parquet"))
    out = R.source_vocab_jaccard(str(tmp_path))
    got = {(a, b): j for a, b, j in
           zip(out["source_a"], out["source_b"], out["jaccard"])}
    n = {(a, b): c for a, b, c in
         zip(out["source_a"], out["source_b"], out["n_common"])}
    assert got[("s1", "s2")] == 1.0 and n[("s1", "s2")] == 2
    assert ("s1", "s3") not in got  # zero intersection → no pair row
    assert got[("s1", "s4")] == round(1 / 3, 6)
    assert got[("s3", "s4")] == round(1 / 3, 6)

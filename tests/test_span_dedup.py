"""Span-level dedup semantics (stages/span_dedup.py): keeper survives,
re-occurrences are removed, overlaps merge, clean docs pass through."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from occular_ocr_ray.stages.span_dedup import (
    dedup_spans,
    dup_span_intervals,
    removable_occurrences,
    span_occurrences,
)

pytestmark = pytest.mark.usefixtures("ray_session")

BLOCK = "alpha bravo charlie delta echo foxtrot"  # 6 tokens


def _docs(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def _result(ds) -> dict[int, tuple[str, int]]:
    df = ds.to_pandas()
    return {int(r.doc_id): (r.text, int(r.n_removed_tokens))
            for r in df.itertuples()}


def test_cross_doc_block_survives_exactly_once():
    rows = [
        {"doc_id": 1, "text": f"one two three {BLOCK} four five"},
        {"doc_id": 2, "text": f"six seven {BLOCK} eight nine ten"},
        {"doc_id": 3, "text": "lonely words with no duplication at all"},
    ]
    out = _result(dedup_spans(_docs(rows), w=4))
    # keeper = min (doc_id, pos): doc 1 keeps the block
    assert out[1] == (rows[0]["text"], 0)
    assert out[2] == ("six seven eight nine ten", 6)
    assert out[3] == (rows[2]["text"], 0)
    # the block text survives exactly once across the corpus
    assert sum(BLOCK in t for t, _ in out.values()) == 1


def test_same_doc_repeat_removed():
    text = f"{BLOCK} intermezzo {BLOCK}"
    out = _result(dedup_spans(_docs([{"doc_id": 7, "text": text}]), w=4))
    assert out[7] == (f"{BLOCK} intermezzo", 6)


def test_overlapping_windows_merge_to_one_interval():
    rows = [
        {"doc_id": 1, "text": BLOCK},
        {"doc_id": 2, "text": f"pre {BLOCK} post"},
    ]
    ds = _docs(rows)
    occ = span_occurrences(ds, w=4)
    iv = dup_span_intervals(removable_occurrences(occ), w=4).to_pandas()
    assert len(iv) == 1  # only doc 2 has removals
    assert iv["doc_id"].iloc[0] == 2
    assert iv["starts"].iloc[0] == [1] and iv["ends"].iloc[0] == [7]


def test_short_docs_emit_no_windows():
    ds = _docs([{"doc_id": 1, "text": "too short"},
                {"doc_id": 2, "text": ""}])
    assert span_occurrences(ds, w=4).count() == 0
    out = _result(dedup_spans(ds, w=4))
    assert out[1] == ("too short", 0) and out[2] == ("", 0)


def test_partitioning_invariance():
    rows = [{"doc_id": i, "text": f"filler{i} {BLOCK} tail{i} extra{i}"}
            for i in range(1, 9)]
    a = _result(dedup_spans(_docs(rows), w=4, num_buckets=2))
    b = _result(dedup_spans(_docs(rows).repartition(5), w=4, num_buckets=7))
    assert a == b
    assert a[1][1] == 0 and all(a[i][1] == 6 for i in range(2, 9))


def test_rolling_hasher_matches_blake2b_results():
    """The O(L) rolling-polynomial gram build and the O(w·L) blake2b
    reference build yield the SAME dedup results (hash values differ by
    construction; duplicate-gram structure must not) — the dual-
    implementation cross-check for the hottest dedup kernel."""
    rng_texts = []
    for i in range(1, 41):
        filler = " ".join(f"w{i}x{j}" for j in range(i % 5 + 2))
        rng_texts.append(
            {"doc_id": i,
             "text": f"{filler} {BLOCK} mid{i} {BLOCK} tail{i} end{i}"
             if i % 3 == 0 else f"{filler} {BLOCK} tail{i} close{i} end{i}"})
    ds = _docs(rng_texts)
    a = _result(dedup_spans(ds, w=4, hasher="rolling"))
    b = _result(dedup_spans(ds, w=4, hasher="blake2b"))
    assert a == b
    assert sum(r > 0 for _, r in a.values()) > 30  # non-vacuous

    # occurrence structure (doc, pos, group size) identical too
    occ_r = span_occurrences(ds, w=4, hasher="rolling").to_pandas()
    occ_b = span_occurrences(ds, w=4, hasher="blake2b").to_pandas()
    key = ["doc_id", "pos"]
    ga = occ_r.groupby("h")[key].apply(lambda g: tuple(sorted(map(tuple, g.values))))
    gb = occ_b.groupby("h")[key].apply(lambda g: tuple(sorted(map(tuple, g.values))))
    assert sorted(ga.tolist()) == sorted(gb.tolist())


def test_rolling_hash_matches_direct_polynomial():
    """Pure-math check: the prefix-product rolling kernel equals the
    direct Σ th[i+j]·B^(w-1-j) mod 2^64 definition, windows and all."""
    import numpy as np

    from occular_ocr_ray.stages.span_dedup import (
        _B,
        _pow_table,
        _BINV,
        _rolling_gram_hashes,
    )

    rng = np.random.RandomState(9)
    M = 1 << 64
    for n, w in [(1, 1), (5, 5), (8, 3), (40, 8), (100, 16)]:
        th = rng.randint(0, 2**63, size=n).astype(np.uint64)
        got = _rolling_gram_hashes(th, w, _pow_table(_B, n),
                                   _pow_table(_BINV, n))
        exp = [
            sum(int(th[i + j]) * pow(_B, w - 1 - j, M) for j in range(w)) % M
            for i in range(n - w + 1)
        ]
        assert [int(x) & (M - 1) for x in got.astype(object)] == exp


def test_list_column_to_matrix_matches_boxed():
    """Zero-copy flatten→reshape equals the boxed to_pylist conversion
    on list, large_list, fixed_size_list, sliced, float32/64, empty."""
    import numpy as np
    import pyarrow as pa

    from occular_ocr_ray.stages.util import list_column_to_matrix

    rng = np.random.RandomState(4)
    rows, dim = 37, 19
    flat32 = rng.standard_normal(rows * dim).astype(np.float32)
    offs = pa.array(np.arange(0, rows * dim + 1, dim, dtype=np.int32))
    cases = [
        pa.ListArray.from_arrays(offs, pa.array(flat32)),
        pa.LargeListArray.from_arrays(
            pa.array(np.arange(0, rows * dim + 1, dim, dtype=np.int64)),
            pa.array(flat32.astype(np.float64))),
        pa.FixedSizeListArray.from_arrays(pa.array(flat32), dim),
    ]
    cases += [c.slice(5, 20) for c in list(cases)]
    cases.append(pa.array([], pa.list_(pa.float64())))
    for arr in cases:
        got = list_column_to_matrix(arr)
        exp = np.array(arr.to_pylist(), dtype=np.float64)
        if len(arr) == 0:
            assert got.shape[0] == 0
            continue
        np.testing.assert_array_equal(got, exp)
    # ragged input is rejected, not silently reshaped
    import pytest as _pytest

    ragged = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64()))
    with _pytest.raises(ValueError, match="ragged"):
        list_column_to_matrix(ragged)


def test_rolling_hasher_partition_invariant_values():
    """Gram hashes are pure values (fixed siphash key + fixed base):
    identical for the same window regardless of batching/partitioning."""
    rows = [{"doc_id": i, "text": f"head{i} {BLOCK} tail{i}"}
            for i in range(1, 7)]
    a = span_occurrences(_docs(rows), w=4).to_pandas()
    b = span_occurrences(_docs(rows).repartition(5), w=4).to_pandas()
    key = ["doc_id", "pos", "h"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(key).reset_index(drop=True),
        b[key].sort_values(key).reset_index(drop=True))


def test_dedup_spans_over_rows_with_a_spans_column():
    """The flagship's extracted rows carry a ``spans`` struct column;
    the interval exchange must not collide with it (regression: the
    join payload was named ``spans`` and the rewrite read the corpus
    column instead of the intervals)."""
    import pyarrow as pa
    import ray.data as rd

    rows = [
        {"doc_id": 1, "text": BLOCK, "spans": [{"start": 0, "end": 3}]},
        {"doc_id": 2, "text": f"pre {BLOCK} post",
         "spans": [{"start": 0, "end": 5}]},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = dedup_spans(ds, w=4).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_removed_tokens"] == 0
    assert out.loc[2, "n_removed_tokens"] == 6
    # the corpus's own spans column passes through untouched
    assert out.loc[1, "spans"] == [{"start": 0, "end": 3}]


def test_coarse_granularity_matches_fine():
    """The coarse-bucketed vectorized keeper/interval exchanges (one
    group per |h| % 199 / doc_id % 199, sorted-run shift compares) must
    reproduce the round-4 one-pandas-group-per-gram build exactly —
    removable occurrences, merged intervals, and the final rewrite
    (VERDICT r4 #1)."""
    rows = []
    for i in range(1, 31):
        filler = " ".join(f"f{i}v{j}" for j in range(i % 4 + 1))
        if i % 4 == 0:  # same-doc repeat
            rows.append({"doc_id": i,
                         "text": f"{BLOCK} gap{i} {BLOCK} t{i} u{i}"})
        else:
            rows.append({"doc_id": i,
                         "text": f"{filler} {BLOCK} tail{i} x{i} y{i}"})
    ds = _docs(rows)
    occ = span_occurrences(ds, w=4)

    rem_c = removable_occurrences(occ, granularity="coarse").to_pandas()
    rem_f = removable_occurrences(occ, granularity="fine").to_pandas()
    key = lambda df: sorted(map(tuple, df[["doc_id", "pos"]].values))
    assert key(rem_c) == key(rem_f)
    assert len(rem_c) > 20  # non-vacuous

    iv_c = dup_span_intervals(
        removable_occurrences(occ, granularity="coarse"),
        w=4, granularity="coarse").to_pandas()
    iv_f = dup_span_intervals(
        removable_occurrences(occ, granularity="fine"),
        w=4, granularity="fine").to_pandas()
    norm = lambda df: sorted(
        (int(r.doc_id), tuple(r.starts), tuple(r.ends))
        for r in df.itertuples())
    assert norm(iv_c) == norm(iv_f)

    a = _result(dedup_spans(ds, w=4, granularity="coarse"))
    b = _result(dedup_spans(ds, w=4, granularity="fine"))
    assert a == b

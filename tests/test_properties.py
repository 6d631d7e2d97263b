"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5: the reference has no property tests); these
pin the kernel invariants over arbitrary inputs."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from occular_ocr_ray.functions.extract import extract_row
from occular_ocr_ray.functions.normalize import normalize_ws
from occular_ocr_ray.functions.xycut import xy_cut_order


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_normalize_ws_idempotent_and_canonical(s):
    n = normalize_ws(s)
    assert normalize_ws(n) == n                  # idempotent
    assert n == n.strip()                        # no edge whitespace
    assert "  " not in n and "\n" not in n and "\t" not in n


_box = st.tuples(
    st.integers(0, 1000), st.integers(0, 1000),
    st.integers(1, 1000), st.integers(1, 1000),
).map(lambda t: (min(t[0], t[0] + t[2]), min(t[1], t[1] + t[3]),
                 t[0] + t[2], t[1] + t[3]))


@given(st.lists(_box, max_size=25))
@settings(max_examples=100, deadline=None)
def test_xycut_is_permutation(boxes):
    order = xy_cut_order(boxes)
    assert sorted(order) == list(range(len(boxes)))  # permutation, total
    # determinism
    assert xy_cut_order(boxes) == order


@given(st.binary(max_size=2000), st.one_of(st.none(), st.text(max_size=500)))
@settings(max_examples=150, deadline=None)
def test_extract_row_total_and_invariant(html, text):
    """Totality + the span/metric invariants for ARBITRARY payload
    bytes (the analog of fuzzing the reference's image loader)."""
    out = extract_row("u", html, text)
    et = out["extracted_text"]
    assert isinstance(et, str)
    assert out["bytes_emitted"] == len(et.encode("utf-8"))
    assert out["n_blocks_kept"] == len(out["spans"])
    assert out["method"] in ("native", "layout", "parsed")
    prev_end = -1
    for s in out["spans"]:
        assert 0.0 <= s["score"] <= 1.0
        assert prev_end < s["start"] <= s["end"] <= len(et)
        seg = et[s["start"]: s["end"]]
        assert seg == normalize_ws(seg)
        prev_end = s["end"]
    # determinism: same row → same bytes
    assert extract_row("u", html, text) == out


@given(
    st.text(alphabet=" abcdef\n\t", max_size=800),
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=1, max_value=32),
)
@settings(max_examples=200, deadline=None)
def test_chunk_token_windows_invariants(text, max_tokens, stride):
    """Chunking invariants for arbitrary text/params: every token
    covered exactly under the stride arithmetic, indices dense from 0,
    window bounds respected, determinism."""
    from occular_ocr_ray.functions.textstats import chunk_token_windows

    if stride > max_tokens:
        with pytest.raises(ValueError):
            chunk_token_windows(text, max_tokens, stride)
        return
    chunks = chunk_token_windows(text, max_tokens, stride)
    toks = text.split()
    if not toks:
        assert chunks == []
        return
    assert [c[0] for c in chunks] == list(range(len(chunks)))
    rebuilt = []
    for ix, c, n in chunks:
        ctoks = c.split()
        assert n == len(ctoks)
        assert 1 <= len(ctoks) <= max_tokens
        assert ctoks == toks[ix * stride: ix * stride + max_tokens]
        rebuilt.extend(ctoks if ix == 0 else ctoks[max_tokens - stride:])
    assert rebuilt == toks  # stride overlap reconstructs exactly
    assert chunk_token_windows(text, max_tokens, stride) == chunks


# --- spill fingerprint store ≡ dict store (model-based) -----------------
@given(
    ops=st.lists(
        st.tuples(
            st.lists(st.integers(0, 25), min_size=1, max_size=8),  # fps
            st.integers(0, 5),                                     # batch key
        ),
        min_size=1, max_size=12,
    ),
    max_hot=st.integers(1, 6),
    compact_at=st.integers(-1, 10),
)
@settings(max_examples=60, deadline=None)
def test_spill_store_equals_dict_model(tmp_path_factory, ops, max_hot,
                                       compact_at):
    """The off-heap spill store must answer every admit() exactly like
    the in-memory dict store for ANY operation sequence — including
    duplicate fps within a call, retries (repeated batch keys), flushes
    forced by a tiny max_hot, and a mid-sequence compaction (which must
    be a semantic no-op).  The shards are plain classes here (no Ray):
    the actor wrapper adds transport, not semantics."""
    from occular_ocr_ray.state.incremental import _FingerprintShard

    sd = tmp_path_factory.mktemp("spill")
    dict_shard = _FingerprintShard()
    spill_shard = _FingerprintShard(store="spill", spill_dir=str(sd),
                                    max_hot=max_hot)
    for i, (fp_ids, bk) in enumerate(ops):
        fps = [bytes([f]) * 16 for f in fp_ids]
        key = bytes([bk]) * 16
        assert spill_shard.admit(fps, key) == dict_shard.admit(fps, key)
        if i == compact_at:
            spill_shard.compact_runs()
    assert spill_shard.size() == dict_shard.size()


# --- rolling gram hash ≡ blake2b gram build (structure-level) -----------
@given(
    docs=st.lists(
        st.lists(st.sampled_from([f"t{i}" for i in range(12)]),
                 min_size=0, max_size=30),
        min_size=1, max_size=8,
    ),
    w=st.integers(1, 6),
)
@settings(max_examples=80, deadline=None)
def test_rolling_and_blake2b_gram_builds_agree(docs, w):
    """For arbitrary token streams the rolling-polynomial and blake2b
    gram builds induce the SAME duplicate structure: two windows share
    a rolling hash iff they share a blake2b hash (i.e. iff the token
    windows are equal — tiny alphabet makes collisions-by-equality
    dense).  This is the dual-implementation contract of the hottest
    dedup kernel, fuzzed beyond the fixed-corpus parity test."""
    import numpy as np
    import pandas as pd

    from occular_ocr_ray.stages.span_dedup import (
        _B,
        _BINV,
        _gram_hashes_blake2b,
        _pow_table,
        _rolling_gram_hashes,
    )

    occurrences = []  # (doc_idx, pos, rolling_h, blake_h, window_tuple)
    maxn = max((len(t) for t in docs), default=1)
    bp, bi = _pow_table(_B, max(maxn, 1)), _pow_table(_BINV, max(maxn, 1))
    for d, toks in enumerate(docs):
        if len(toks) < w:
            continue
        th = pd.util.hash_array(np.array(toks, dtype=object))
        roll = _rolling_gram_hashes(th, w, bp, bi)
        blake = _gram_hashes_blake2b(toks, w)
        assert len(roll) == len(blake) == len(toks) - w + 1
        for i in range(len(blake)):
            occurrences.append((d, i, int(roll[i]), blake[i],
                                tuple(toks[i:i + w])))
    for a in occurrences:
        for b in occurrences:
            same_window = a[4] == b[4]
            assert (a[2] == b[2]) == same_window  # rolling ≡ equality
            assert (a[3] == b[3]) == same_window  # blake2b ≡ equality


@given(st.dictionaries(st.text(min_size=1, max_size=8),
                       st.integers(1, 1000), min_size=1, max_size=60),
       st.integers(3, 64), st.integers(1, 4))
@settings(max_examples=150, deadline=None)
def test_cms_estimate_never_underestimates(counts, width, depth):
    """The prune in sketch_agg.heavy_hitters is lossless ONLY because
    the count-min estimate is an upper bound on the true count — pin
    that for arbitrary items/counts and adversarially small sketches."""
    import numpy as np

    from occular_ocr_ray.stages.sketch_agg import _cms_hashes

    items = list(counts.keys())
    cnts = np.array([counts[t] for t in items], dtype=np.int64)
    cms = np.zeros((depth, width), dtype=np.int64)
    h1, h2 = _cms_hashes(items)
    w = np.uint64(width)
    for d in range(depth):
        idx = ((h1 + np.uint64(d) * h2) % w).astype(np.int64)
        np.add.at(cms[d], idx, cnts)
    est = np.full(len(items), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        idx = ((h1 + np.uint64(d) * h2) % w).astype(np.int64)
        est = np.minimum(est, cms[d][idx])
    assert (est >= cnts).all()


@given(st.integers(1, 500),
       st.floats(0.05, 1.0, allow_nan=False, exclude_min=False))
@settings(max_examples=200, deadline=None)
def test_simjoin_prefix_len_bounds_and_monotone(size, tau):
    """Prefix length stays in [1, size] and a stricter threshold never
    needs a LONGER prefix (the filter's completeness/cost contract)."""
    from occular_ocr_ray.stages.simjoin import _prefix_len

    p = _prefix_len(size, tau)
    assert 1 <= p <= size
    tighter = min(1.0, tau + 0.1)
    assert _prefix_len(size, tighter) <= p

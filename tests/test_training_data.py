"""End-to-end corpus pipeline: funnel monotonicity, dedup behavior,
determinism."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_build_corpus_funnel(pages_dir):
    import ray.data as rd

    from occular_ocr_ray.pipelines.training_data import build_corpus

    pages = rd.read_parquet(pages_dir, columns=["url", "html", "text"])
    corpus, funnel = build_corpus(pages)
    assert funnel["input_rows"] == 500
    # funnel only shrinks
    assert (
        funnel["input_rows"]
        >= funnel["after_extract_and_quality"]
        >= funnel["after_exact_dedup"]
        >= funnel["corpus_rows"]
        > 0
    )
    # the fixture's exact-dup rows (slot 19 == slot 0 of each cycle)
    # must be removed by exact dedup
    assert funnel["after_exact_dedup"] < funnel["after_extract_and_quality"]
    df = corpus.to_pandas()
    assert df["url"].is_unique
    assert (df["n_tokens"] >= 20).all()
    assert df["quality"].between(0.35, 1.0).all()


def test_corpus_query_deterministic():
    from occular_ocr_ray.pipelines.training_data import corpus_pipeline_q

    a = corpus_pipeline_q("/root/testdata/sf0.001")
    b = corpus_pipeline_q("/root/testdata/sf0.001")
    assert a.equals(b)
    funnel_rows = a[a["url"].str.startswith("__funnel::")]
    assert len(funnel_rows) == 4


def _write_neardup_pages(out_dir, n_base: int = 24, n_clusters: int = 5) -> None:
    """Pages fixture with REAL near-duplicates: native-text rows where
    the first ``n_clusters`` base docs each get 1-2 variants differing
    only in the trailing words (5-shingle Jaccard ≫ 0.8) — so the
    near-dup drop path is genuinely exercised (a fixture with no pairs
    makes any broadcast-vs-anti_join equivalence test vacuous)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from occular_ocr_ray.sources.pages import PAGES_SCHEMA, _paragraph, _rng

    rows = []

    def add(i, url, text):
        rows.append(
            {"url": url, "warc_ts": 1_735_689_600_000_000 + i * 1_000_000,
             "html": b"", "text": text, "lang": "en"}
        )

    texts = []
    for i in range(n_base):
        r = _rng(7, i)
        # long docs (≈6 paragraphs) so a 3-word trailing change keeps
        # shingle-Jaccard well above the 0.8 pair threshold
        texts.append(" ".join(_paragraph(r) for _ in range(6)))
        add(i, f"https://h{i:03d}.example/native/{i}", texts[i])
    j = n_base
    for c in range(n_clusters):
        for k in range(1 + c % 2):
            add(j, f"https://dup{j:03d}.example/native/{j}",
                texts[c] + f" trailing variant {k}")
            j += 1
    import os

    os.makedirs(str(out_dir), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA),
                   os.path.join(str(out_dir), "pages_0000.parquet"))


def test_corpus_anti_join_strategy_matches_broadcast(ray_session, tmp_path):
    """drop_strategy='anti_join' (distributed CC + bucketed anti-join)
    must produce the identical corpus to the broadcast drop filter —
    on an input where near-dups EXIST, so the anti-join branch really
    runs (the funnel assertion below guards against a vacuous pass)."""
    import ray.data as rd

    from occular_ocr_ray.pipelines.training_data import build_corpus

    pages_dir = tmp_path / "pages"
    _write_neardup_pages(pages_dir)
    outs = {}
    for strat in ("broadcast", "anti_join"):
        pages = rd.read_parquet(str(pages_dir), columns=["url", "html", "text"])
        corpus, funnel = build_corpus(
            pages, checkpoint_dir=str(tmp_path / f"ckpt_{strat}"),
            drop_strategy=strat,
        )
        df = corpus.to_pandas().sort_values("url").reset_index(drop=True)
        outs[strat] = (df, funnel)
    a, b = outs["broadcast"], outs["anti_join"]
    # non-vacuity: the near-dup drop must have removed rows
    assert a[1]["corpus_rows"] < a[1]["after_exact_dedup"]
    assert a[1] == b[1]
    assert a[0].equals(b[0])


def test_corpus_checkpoint_rerun_no_duplicates(ray_session, tmp_path):
    """Re-running build_corpus with the same checkpoint_dir must reuse
    the completed checkpoints (marker contract), not mix a second
    generation of files into them — funnel and corpus identical."""
    import ray.data as rd

    from occular_ocr_ray.pipelines.training_data import build_corpus
    from occular_ocr_ray.sources.pages import write_pages

    pages_dir = tmp_path / "pages"
    write_pages(str(pages_dir), 80, seed=42, num_files=4)
    results = []
    for _ in range(2):
        pages = rd.read_parquet(str(pages_dir), columns=["url", "html", "text"])
        corpus, funnel = build_corpus(pages, checkpoint_dir=str(tmp_path / "ckpt"))
        results.append(
            (corpus.to_pandas().sort_values("url").reset_index(drop=True), funnel)
        )
    assert results[0][1] == results[1][1]
    assert results[0][0].equals(results[1][0])


def test_corpus_rejects_unknown_drop_strategy(ray_session, tmp_path):
    import pytest
    import ray.data as rd

    from occular_ocr_ray.pipelines.training_data import build_corpus
    from occular_ocr_ray.sources.pages import write_pages

    pages_dir = tmp_path / "pages"
    write_pages(str(pages_dir), 20, seed=42, num_files=1)
    pages = rd.read_parquet(str(pages_dir), columns=["url", "html", "text"])
    with pytest.raises(ValueError, match="drop_strategy"):
        build_corpus(pages, checkpoint_dir=str(tmp_path / "c"),
                     drop_strategy="anti-join")


def test_corpus_checkpoint_invalidated_by_param_change(ray_session, tmp_path):
    """Same checkpoint_dir, different filter params → the marker key
    mismatch forces recompute (no silently stale corpus)."""
    import ray.data as rd

    from occular_ocr_ray.pipelines.training_data import build_corpus
    from occular_ocr_ray.sources.pages import write_pages

    pages_dir = tmp_path / "pages"
    write_pages(str(pages_dir), 60, seed=42, num_files=2)
    counts = {}
    for q in (0.0, 0.55):
        pages = rd.read_parquet(str(pages_dir), columns=["url", "html", "text"])
        corpus, funnel = build_corpus(
            pages, min_quality=q, checkpoint_dir=str(tmp_path / "ckpt")
        )
        counts[q] = funnel["after_extract_and_quality"]
    assert counts[0.55] < counts[0.0]  # stricter threshold visibly applied


def test_corpus_empty_after_filters(ray_session, tmp_path):
    """Filters strict enough to drop EVERY row must yield an empty
    corpus (and a reusable empty checkpoint), not a crash: write_parquet
    of an empty dataset emits zero files, so the checkpoint must persist
    a schema-only file for the re-read."""
    import ray.data as rd

    from occular_ocr_ray.pipelines.training_data import build_corpus
    from occular_ocr_ray.sources.pages import write_pages

    pages_dir = tmp_path / "pages"
    write_pages(str(pages_dir), 40, seed=42, num_files=2)
    for _ in range(2):  # second run exercises marker reuse of the empty ckpt
        pages = rd.read_parquet(str(pages_dir), columns=["url", "html", "text"])
        corpus, funnel = build_corpus(
            pages, min_tokens=10**9, checkpoint_dir=str(tmp_path / "ckpt")
        )
        assert funnel["after_extract_and_quality"] == 0
        assert funnel["corpus_rows"] == 0
        assert corpus.count() == 0

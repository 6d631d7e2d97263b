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


def test_corpus_anti_join_strategy_matches_broadcast(ray_session, tmp_path):
    """drop_strategy='anti_join' (distributed CC + bucketed anti-join)
    must produce the identical corpus to the broadcast drop filter."""
    import ray.data as rd

    from occular_ocr_ray.pipelines.training_data import build_corpus
    from occular_ocr_ray.sources.pages import write_pages

    pages_dir = tmp_path / "pages"
    write_pages(str(pages_dir), 120, seed=42, num_files=4)
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

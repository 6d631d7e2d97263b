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

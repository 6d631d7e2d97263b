from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (SURVEY.md §5)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory) -> str:
    """500-row deterministic pages table, 8 shards (matches the golden
    fixtures' seed/row-count)."""
    from occular_ocr_ray.sources.pages import write_pages

    d = tmp_path_factory.mktemp("pages")
    write_pages(str(d), 500, seed=42, num_files=8)
    return str(d)


@pytest.fixture(scope="session")
def golden():
    import json

    with open(os.path.join(REPO, "tests", "golden", "hashes.json")) as fh:
        return json.load(fh)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"

"""CLI entry-point test — analog of the reference's CLI smoke
(``tests/test_smoke.py:81-113``): run as a subprocess, assert exit 0,
valid JSON summary, durable output + manifest; bad input → exit 1."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args: list[str]):
    return subprocess.run(
        [sys.executable, "-m", "occular_ocr_ray.run", *args],
        capture_output=True, text=True, cwd=REPO,
        env=dict(os.environ, RAY_DEDUP_LOGS="0"),
        timeout=300,
    )


def test_cli_end_to_end(tmp_path):
    from occular_ocr_ray.sources.pages import write_pages

    pages = tmp_path / "pages"
    out = tmp_path / "out"
    write_pages(str(pages), 60, num_files=4)
    r = _run_cli(["--input", str(pages), "--output", str(out), "--num-waves", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout[r.stdout.index("{"):])
    assert summary["totals"]["rows"] == 60
    assert (out / "manifest" / "wave_0.json").exists()
    assert (out / "manifest" / "wave_1.json").exists()
    data_files = list((out / "data").rglob("*.parquet"))
    assert data_files


def test_cli_missing_input(tmp_path):
    r = _run_cli(["--input", str(tmp_path / "nope"), "--output", str(tmp_path / "o")])
    assert r.returncode == 1
    assert "error:" in r.stderr

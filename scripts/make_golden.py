"""Regenerate the committed golden fixtures (tests/golden/).

The oracle is the pure-Python kernel ``extract_row`` run in-process with
no Ray — trivially auditable (FIXTURES.md).  The Ray pipeline tests then
assert the distributed execution reproduces these bytes exactly.

Run from the repo root:  python scripts/make_golden.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from occular_ocr_ray.functions.extract import extract_row  # noqa: E402
from occular_ocr_ray.sources.pages import gen_page_row  # noqa: E402

N_ROWS = 500
SEED = 42
# One representative url per variant, full text + spans committed for audit.
AUDIT_ROWS = [0, 1, 12, 15, 16, 17, 19, 21, 33, 37]

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")


def main() -> None:
    os.makedirs(os.path.join(GOLDEN_DIR, "texts"), exist_ok=True)
    hashes: dict[str, dict] = {}
    for i in range(N_ROWS):
        row = gen_page_row(i, SEED)
        out = extract_row(row["url"], row["html"], row["text"])
        hashes[out["url"]] = {
            "sha256": hashlib.sha256(out["extracted_text"].encode("utf-8")).hexdigest(),
            "method": out["method"],
            "n_blocks_kept": out["n_blocks_kept"],
            "n_blocks_dropped": out["n_blocks_dropped"],
            "bytes_emitted": out["bytes_emitted"],
        }
        if i in AUDIT_ROWS:
            name = hashlib.sha256(out["url"].encode()).hexdigest()[:16]
            with open(os.path.join(GOLDEN_DIR, "texts", f"{name}.txt"), "w") as fh:
                fh.write(out["extracted_text"])
            with open(os.path.join(GOLDEN_DIR, "texts", f"{name}.spans.json"), "w") as fh:
                json.dump({"url": out["url"], "spans": out["spans"]}, fh, indent=1)
    with open(os.path.join(GOLDEN_DIR, "hashes.json"), "w") as fh:
        json.dump({"seed": SEED, "n_rows": N_ROWS, "rows": hashes}, fh, indent=1, sort_keys=True)
    print(f"wrote goldens for {N_ROWS} rows ({len(AUDIT_ROWS)} audited in full)")


if __name__ == "__main__":
    main()

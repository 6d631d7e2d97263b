"""CLI entry point — the graft analog of the reference's CLI
(``ocr_skel/cli.py:22-184``): input/output resolution, component
selection (``--extractor``), sink selection, error → stderr + exit 1.

Intended launch shape on a real cluster (SURVEY.md §3):

    ray job submit -- python -m occular_ocr_ray.run \\
        --input <pages_parquet_dir> --output <out_dir> \\
        [--num-waves 16] [--num-parts 64] [--extractor density] \\
        [--concurrency 8] [--batch-size 32] [--no-resume]

This module OWNS a Ray session (guarded init, shutdown at exit) —
unlike the library code, which never initializes Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="occular_ocr_ray",
        description="Ray-Data-native main-content extraction over pages parquet",
    )
    ap.add_argument("--input", required=True, help="directory of pages parquet shards")
    ap.add_argument("--output", required=True, help="output directory (data/ + manifest/)")
    ap.add_argument("--extractor", default="density")
    ap.add_argument("--num-waves", type=int, default=4)
    ap.add_argument("--num-parts", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--concurrency", type=int, default=None,
                    help="actor pool size (default: stateless tasks)")
    ap.add_argument("--no-resume", action="store_true",
                    help="recompute every wave even if its manifest exists")
    ap.add_argument("--hive-partition", action="store_true",
                    help="write hive-style part=<k> dirs (many small files)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        from .pipelines.flagship import run_extraction

        summary = run_extraction(
            args.input,
            args.output,
            num_waves=args.num_waves,
            resume=not args.no_resume,
            extractor=args.extractor,
            concurrency=args.concurrency,
            batch_size=args.batch_size,
            num_parts=args.num_parts,
            hive_partition=args.hive_partition,
        )
        print(json.dumps(summary, indent=1))
        return 0
    except Exception as exc:  # CLI boundary: message + nonzero exit
        print(f"error: {exc}", file=sys.stderr)
        return 1
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())

"""CLI entry point — the graft analog of the reference's CLI
(``ocr_skel/cli.py:22-184``): input/output resolution, component
selection (``--extractor`` + ``--extractor-arg`` kwargs passthrough,
cf. ``cli.py:94-103``), sink selection (parquet always; ``--json-out``
file sink and ``--stdout-text`` console sink, cf. ``cli.py:161-180``),
``--force-parse`` (cf. ``pipeline.py:94`` force_ocr), error → stderr +
exit 1.

Intended launch shape on a real cluster (SURVEY.md §3):

    ray job submit -- python -m occular_ocr_ray.run \\
        --input <pages_parquet_dir> --output <out_dir> \\
        [--input-format warc|jsonl|csv] \\
        [--num-waves 16] [--num-parts 64] [--extractor density] \\
        [--extractor-arg keep_thresh=0.4] [--force-parse] \\
        [--giant-threshold 4000000 | --bucket-by-size 4000000 | --pre-bucketed] \\
        [--json-out <dir>] [--stdout-text] \\
        [--concurrency 8] [--batch-size 32] [--no-resume]

This module OWNS a Ray session (guarded init, shutdown at exit) —
unlike the library code, which never initializes Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_extractor_args(pairs: list[str]) -> dict:
    """``key=value`` strings → kwargs dict with int/float coercion (the
    thresholds in functions/classify.py are numeric)."""
    out: dict = {}
    for p in pairs:
        if "=" not in p:
            raise ValueError(f"--extractor-arg expects key=value, got {p!r}")
        k, v = p.split("=", 1)
        try:
            out[k] = int(v)
        except ValueError:
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="occular_ocr_ray",
        description="Ray-Data-native main-content extraction over pages parquet",
    )
    ap.add_argument("--input", required=True, help="directory of pages parquet shards")
    ap.add_argument("--output", required=True, help="output directory (data/ + manifest/)")
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "warc", "jsonl", "csv"],
                    help="non-parquet inputs are ingested once into "
                         "<output>/ingested/ pages parquet (idempotent "
                         "on resume), then extracted like a parquet job")
    ap.add_argument("--extractor", default="density")
    ap.add_argument("--extractor-arg", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="extractor constructor kwarg (repeatable), e.g. keep_thresh=0.4")
    ap.add_argument("--num-waves", type=int, default=4)
    ap.add_argument("--num-parts", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--concurrency", type=int, default=None,
                    help="actor pool size (default: stateless tasks)")
    ap.add_argument("--no-resume", action="store_true",
                    help="recompute every wave even if its manifest exists")
    ap.add_argument("--hive-partition", action="store_true",
                    help="write hive-style part=<k> dirs (many small files)")
    ap.add_argument("--force-parse", action="store_true",
                    help="re-extract from the raw payload even when a native "
                         "text layer exists (reference force_ocr analog)")
    ap.add_argument("--giant-threshold", type=int, default=None, metavar="BYTES",
                    help="route html payloads larger than BYTES to a "
                         "batch_size=1 sibling stage (skew mitigation; "
                         "reads the pruned input once per branch)")
    ap.add_argument("--bucket-by-size", type=int, default=None, metavar="BYTES",
                    help="first split the input into <output>/bucketed/"
                         "{small,giant} at BYTES (one ingest pass), then "
                         "extract each bucket with its own branch — the "
                         "single-scan alternative to --giant-threshold")
    ap.add_argument("--pre-bucketed", action="store_true",
                    help="input dir is already a small/ + giant/ layout "
                         "(bucket_pages_by_size output)")
    ap.add_argument("--target-file-bytes", type=int, default=128 * 1024 * 1024,
                    metavar="BYTES",
                    help="coalesce each write task's output into parquet "
                         "files of ~BYTES (0 = one file per block; layout "
                         "only, bytes identical)")
    ap.add_argument("--min-rows-per-write", type=int, default=None,
                    metavar="ROWS",
                    help="bundle upstream blocks so each write call gets "
                         "at least ROWS rows (cross-task small-file fix; "
                         "adds a buffering boundary)")
    ap.add_argument("--json-out", default=None, metavar="DIR",
                    help="also write extracted rows as JSON files under DIR")
    ap.add_argument("--stdout-text", action="store_true",
                    help="stream extracted text to stdout (summary moves to "
                         "stderr) — the reference CLI's plain-text sink")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        from .pipelines.flagship import read_extracted, run_extraction

        input_dir, pre_bucketed = args.input, args.pre_bucketed
        if args.input_format != "parquet":
            import os

            from .sources.ingest import ingest_to_pages_parquet

            ingest_dir = os.path.join(args.output, "ingested")
            totals = ingest_to_pages_parquet(args.input, ingest_dir,
                                             args.input_format)
            print(f"ingested: {totals}", file=sys.stderr)
            input_dir = ingest_dir
        if args.bucket_by_size is not None:
            if pre_bucketed or args.giant_threshold is not None:
                raise ValueError(
                    "--bucket-by-size conflicts with --pre-bucketed / "
                    "--giant-threshold"
                )
            import os

            from .sources.ingest import bucket_pages_by_size

            bucket_dir = os.path.join(args.output, "bucketed")
            # bucket the POST-ingest pages dir: with --input-format
            # warc/jsonl/csv the raw source dir has no parquet to bucket
            totals = bucket_pages_by_size(input_dir, bucket_dir,
                                          args.bucket_by_size)
            print(f"bucketed: {totals}", file=sys.stderr)
            input_dir, pre_bucketed = bucket_dir, True

        summary = run_extraction(
            input_dir,
            args.output,
            num_waves=args.num_waves,
            resume=not args.no_resume,
            extractor=args.extractor,
            concurrency=args.concurrency,
            batch_size=args.batch_size,
            num_parts=args.num_parts,
            hive_partition=args.hive_partition,
            force_parse=args.force_parse,
            giant_threshold=args.giant_threshold,
            extractor_kwargs=_parse_extractor_args(args.extractor_arg),
            pre_bucketed=pre_bucketed,
            target_file_bytes=args.target_file_bytes or None,
            min_rows_per_write=args.min_rows_per_write,
        )
        if args.json_out:
            # JSON file sink (reference --out, cli.py:161-164): one JSON
            # file per block, written in parallel — debugging/interchange
            # format, not the scale path.  Clear the dir first: Ray's
            # write filenames carry a fresh uuid per run, so a re-run
            # (incl. resume) would otherwise mix two generations of
            # files and duplicate rows — same hazard the parquet wave
            # dirs guard against in _run_wave.
            import shutil

            shutil.rmtree(args.json_out, ignore_errors=True)
            read_extracted(
                args.output, columns=["url", "extracted_text", "method"]
            ).write_json(args.json_out)
        if args.stdout_text:
            # Console sink (reference default sink, cli.py:169-180):
            # inherently driver-side; streams batch-by-batch, never
            # materializes the corpus.
            ds = read_extracted(args.output, columns=["extracted_text"])
            for batch in ds.iter_batches(batch_format="pyarrow"):
                for t in batch["extracted_text"].to_pylist():
                    print(t)
            print(json.dumps(summary, indent=1), file=sys.stderr)
        else:
            print(json.dumps(summary, indent=1))
        return 0
    except Exception as exc:  # CLI boundary: message + nonzero exit
        print(f"error: {exc}", file=sys.stderr)
        return 1
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())

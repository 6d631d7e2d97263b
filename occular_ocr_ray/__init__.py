"""occular_ocr_ray — a Ray-Data-native main-content extraction engine.

Built from scratch with the data-processing capabilities of the
``Bodhi42/Occular-ocr`` reference (read-only at ``/root/reference``),
re-expressed over Parquet tables of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)`` as ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow, with stateful extractor actor pools,
explicit hash partitioning, a resumable per-partition manifest, and
deterministic, byte-identical extracted text per url.

Layout (mirrors SURVEY.md §7):

- ``functions/``  — pure, deterministic per-row kernels (HTML block
  segmentation, density classification, normalization, XY-cut, hashing,
  text statistics).  These define the golden contract; no Ray imports.
- ``stages/``     — Ray ``map_batches`` callables (stateless fns + actor
  classes) wrapping the kernels: extraction, dedup, similarity, text
  analysis, multimodal stubs.
- ``sources/``    — readers/writers + the deterministic ``pages`` fixture
  generator.
- ``pipelines/``  — end-to-end pipelines: the flagship extraction job with
  wave-granular resumable manifest, and the relational query surface used
  by ``__ray_entry__.py``.
- ``state/``      — the extractor registry (analog of the reference's
  ``ocr_skel/registry.py``).

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (driver / bench.py / test fixture).
"""

__version__ = "0.1.0"

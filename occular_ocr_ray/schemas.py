"""Arrow schemas for the engine's tables (SURVEY.md §1.2)."""

from __future__ import annotations

import pyarrow as pa

SPAN_TYPE = pa.struct(
    [
        pa.field("start", pa.int64()),
        pa.field("end", pa.int64()),
        pa.field("tag_path", pa.string()),
        pa.field("score", pa.float64()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("extracted_text", pa.string()),
        pa.field("spans", pa.list_(SPAN_TYPE)),
        pa.field("method", pa.string()),
        pa.field("n_blocks_kept", pa.int64()),
        pa.field("n_blocks_dropped", pa.int64()),
        pa.field("bytes_emitted", pa.int64()),
    ]
)

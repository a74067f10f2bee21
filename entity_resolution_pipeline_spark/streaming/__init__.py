"""Structured Streaming ingest for the ER engine.

The reference is strictly batch (SURVEY.md §2.11) — its closest analog is
the manifest resume loop (process only files not yet in the checkpoint,
src/pipeline.py:66-120).  This package is the Spark-native generalization:
a `readStream` file source over the pages table, exactly-once incremental
extract + blocking via `foreachBatch` with Spark's own streaming checkpoint,
and watermarked windowed ingest statistics.
"""

from .ingest import (  # noqa: F401
    extract_records_stream,
    ingest_stats_stream,
    read_pages_stream,
    run_incremental,
)
from .sessions import (  # noqa: F401
    read_events_stream,
    session_window_stream,
    sessionize_stream,
)

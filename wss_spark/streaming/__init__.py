"""Structured Streaming surface: incremental page ingest + extraction.

The reference's batch-with-a-loop crawl (SURVEY.md §2.9) maps to streaming in
two places: continuous ingest of newly fetched pages (readStream → extraction
→ append), and event-time analytics with late data (watermark + window).
"""

from wss_spark.streaming.pipeline import (  # noqa: F401
    foreach_batch_dedup_append,
    host_budget_tracker,
    stream_crawl,
    stream_extract_entities,
    stream_pages,
    windowed_page_counts,
)

from docling_serve_spark.streaming.ingest import (
    PAGES_DDL,
    extract_stream,
    stream_pages,
    windowed_status_counts,
)

__all__ = [
    "PAGES_DDL",
    "extract_stream",
    "stream_pages",
    "windowed_status_counts",
]

from leann_rs_spark.streaming.ingest import (  # noqa: F401
    stream_dedup_events,
    stream_ingest_documents,
    stream_windowed_event_stats,
    windowed_event_stats,
)

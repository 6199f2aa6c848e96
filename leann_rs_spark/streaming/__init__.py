from leann_rs_spark.streaming.ingest import (  # noqa: F401
    stream_dedup_events,
    stream_ingest_documents,
    stream_windowed_event_stats,
    windowed_event_stats,
)
from leann_rs_spark.streaming.sessionize import (  # noqa: F401
    duckdb_sessionize,
    sessionize_events,
    stream_sessionize_events,
)

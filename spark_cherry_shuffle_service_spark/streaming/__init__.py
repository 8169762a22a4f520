from spark_cherry_shuffle_service_spark.streaming.streams import (  # noqa: F401
    EVENTS_SCHEMA,
    events_file_schema,
    normalize_ts,
    read_events_stream,
    sessionize_stream,
    windowed_counts_stream,
)

from comm_detect_spark.streaming.pipeline import (  # noqa: F401
    events_hourly_stream,
    streaming_decontaminate,
    streaming_exact_dedup,
)

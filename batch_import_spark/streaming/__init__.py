from batch_import_spark.streaming.stream_kg import (  # noqa: F401
    start_kg_stream,
    streaming_turn_stats,
)

from mysql_data_anonymizer_spark.streaming.stream_ops import (
    mask_stream,
    sliding_counts,
    session_aggregates,
    tumbling_aggregates,
)

__all__ = ["mask_stream", "sliding_counts", "session_aggregates", "tumbling_aggregates"]

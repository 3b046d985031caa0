from data_validation_spark.streaming.validate import (
    streaming_stats,
    validate_stream,
)

__all__ = ["streaming_stats", "validate_stream"]

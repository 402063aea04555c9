from pgverify_spark.streaming.incremental import (
    streaming_additive_fingerprint,
    streaming_windowed_counts,
)

__all__ = ["streaming_additive_fingerprint", "streaming_windowed_counts"]

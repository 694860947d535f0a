"""Source/sink helpers: multimodal binary columns, artifact packing."""

from hive_reflex_spark.sources.multimodal import (
    decode_frames,
    extract_features,
    with_binary_payload,
)

__all__ = ["decode_frames", "extract_features", "with_binary_payload"]

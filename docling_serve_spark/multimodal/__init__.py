from docling_serve_spark.multimodal.media import (
    MEDIA_SCHEMA,
    audio_features,
    build_media_df,
    cdc_chunk_stats,
    cdc_chunks,
    decode_metadata,
    frame_sample,
    image_resize,
)

__all__ = [
    "MEDIA_SCHEMA",
    "audio_features",
    "build_media_df",
    "cdc_chunk_stats",
    "cdc_chunks",
    "decode_metadata",
    "frame_sample",
    "image_resize",
]

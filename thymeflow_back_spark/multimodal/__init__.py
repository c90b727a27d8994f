from .ops import (
    MEDIA_SCHEMA,
    decode_image,
    extract_image_features,
    resize_images,
    sample_video_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_image",
    "extract_image_features",
    "resize_images",
    "sample_video_frames",
]

from .blobs import (
    BLOB_SCHEMA,
    decode_images,
    extract_features,
    make_blob_table,
    sample_frames,
)

__all__ = [
    "BLOB_SCHEMA",
    "decode_images",
    "extract_features",
    "make_blob_table",
    "sample_frames",
]

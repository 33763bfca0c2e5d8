"""Pure-Python/NumPy ISCC kernel (no Spark imports).

These are the functions the vectorized pandas UDFs in
``iscc_specs_spark.operators`` call per Arrow batch.  Semantics follow the
ISCC v1.0 specification; parity is pinned bit-for-bit by the vendored golden
vectors (tests/fixtures/test_data.json, from /root/reference/tests/).
"""

from iscc_specs_spark.kernel.codec import decode, distance, encode
from iscc_specs_spark.kernel.codes import (
    content_id_mixed,
    content_id_text,
    content_id_text_full,
    data_id,
    data_id_full,
    instance_id,
    meta_id,
)
from iscc_specs_spark.kernel.cdc import data_chunks
from iscc_specs_spark.kernel.images import (
    content_id_image,
    dct,
    image_hash,
    image_normalize,
)
from iscc_specs_spark.kernel.sketches import minimum_hash, similarity_hash
from iscc_specs_spark.kernel.textnorm import text_normalize, text_trim
from iscc_specs_spark.kernel.xxhashes import xxh32, xxh64

__all__ = [
    "encode",
    "decode",
    "distance",
    "meta_id",
    "content_id_text",
    "content_id_text_full",
    "content_id_image",
    "content_id_mixed",
    "image_hash",
    "image_normalize",
    "dct",
    "data_id",
    "data_id_full",
    "instance_id",
    "data_chunks",
    "minimum_hash",
    "similarity_hash",
    "text_normalize",
    "text_trim",
    "xxh32",
    "xxh64",
]

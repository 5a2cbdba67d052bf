from sedona_spark.sources.images import (
    synthesize_images,
    images_from_part,
    encode_image,
    decode_image,
    make_pixels,
    phash64,
)
from sedona_spark.sources.zones import synthesize_zones, lattice_fixture

__all__ = [
    "synthesize_images",
    "images_from_part",
    "encode_image",
    "decode_image",
    "make_pixels",
    "phash64",
    "synthesize_zones",
    "lattice_fixture",
]

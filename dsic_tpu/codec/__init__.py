from dsic_tpu.codec.rans import rans_encode, rans_decode, rans_available
from dsic_tpu.codec.cdf import (
    quantize_pmf_to_cdf, gaussian_cdf_rows, student_t_cdf_rows)
from dsic_tpu.codec.api import (Codec, ZooCodec, CheckerboardCodec,
                                make_codec, compress_images,
                                decompress_images)
from dsic_tpu.codec.bitstream import pack_bitstream, unpack_bitstream

__all__ = [
    "rans_encode", "rans_decode", "rans_available", "quantize_pmf_to_cdf",
    "gaussian_cdf_rows", "student_t_cdf_rows", "Codec", "ZooCodec", "CheckerboardCodec",
    "make_codec", "compress_images",
    "decompress_images", "pack_bitstream", "unpack_bitstream",
]

from pgen_tpu.ops.unpack import unpack_codes, unpack_codes_reference
from pgen_tpu.ops.pack import pack_codes_device
from pgen_tpu.ops.gt_text import (
    genotype_text,
    genotype_text_from_codes,
    genotype_text_planes,
)

__all__ = [
    "unpack_codes",
    "unpack_codes_reference",
    "pack_codes_device",
    "genotype_text",
    "genotype_text_from_codes",
    "genotype_text_planes",
]

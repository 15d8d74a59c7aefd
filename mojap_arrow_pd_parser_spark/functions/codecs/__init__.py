"""Pure numpy/pyarrow codec kernels (no Spark dependency).

dict / RLE / FSST / bit-pack / FOR-delta with sampled cost-based
auto-selection (SURVEY.md §2.6 N1-N8). Used inside mapInArrow on the
Spark side; unit-tested standalone per FIXTURES.md F4.
"""

from .bitpack import bit_width, pack, packed_nbytes, unpack
from .column import decode_array, encode_array
from .intcodec import (
    choose_int_codec,
    decode_int,
    encode_int,
    estimate_int_sizes,
    int_stats,
)

__all__ = [
    "bit_width", "pack", "unpack", "packed_nbytes",
    "encode_int", "decode_int", "choose_int_codec",
    "int_stats", "estimate_int_sizes",
    "encode_array", "decode_array",
]

from .fused_act import fused_snake_activation1d
from .packed import (pack_time, packed_conv1d, packed_snake_activation1d,
                     pallas_packed_conv1d, pallas_packed_conv_transpose1d,
                     unpack_time)

__all__ = [
    "fused_snake_activation1d",
    "pack_time", "unpack_time",
    "packed_conv1d", "packed_snake_activation1d",
    "pallas_packed_conv1d", "pallas_packed_conv_transpose1d",
]

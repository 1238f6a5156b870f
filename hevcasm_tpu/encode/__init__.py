from .ctu import tile_frame, untile_frame, pad_frame
from .loop import encode_inter_frame, encode_intra_frame, encode_gop, EncodeConfig

__all__ = [
    "tile_frame",
    "untile_frame",
    "pad_frame",
    "encode_inter_frame",
    "encode_intra_frame",
    "encode_gop",
    "EncodeConfig",
]

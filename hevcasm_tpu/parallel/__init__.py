from .sharding import (
    make_mesh,
    encode_p_frames_batch,
    encode_gop_data_parallel,
    encode_inter_frame_spatial,
    encode_gop_closed_loop_spatial,
)

__all__ = [
    "make_mesh",
    "encode_p_frames_batch",
    "encode_gop_data_parallel",
    "encode_inter_frame_spatial",
    "encode_gop_closed_loop_spatial",
]

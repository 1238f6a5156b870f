from .timing import time_fn, gbps, gops
from .psnr import psnr

__all__ = ["time_fn", "gbps", "gops", "psnr"]

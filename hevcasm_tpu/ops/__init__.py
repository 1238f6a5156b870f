"""Reference-tier (pure jnp) implementations of every kernel family.

Importing this module registers all REF-tier ops with the registry, the way
linking the reference's C objects makes every `hevcasm_populate_*` available.
"""

from .. import registry
from ..config import Tier

from .sad import sad, sad_multiref, sad_grid
from .ssd import ssd, ssd_linear
from .satd import satd
from .quantize import quantize, quantize_inverse, reconstruct
from .transform import (
    forward_transform,
    inverse_transform,
    inverse_transform_add,
    add_residual,
)
from .pred_inter import pred_uni, pred_uni_16, pred_bi, refine_qpel
from .residual import residual_pipeline
from .pred_intra import (
    pred_intra,
    pred_intra_dc,
    pred_intra_planar,
    pred_intra_angular,
    pred_intra_all_modes,
)

_REF_OPS = {
    "sad": sad,
    "sad_multiref": sad_multiref,
    "sad_grid": sad_grid,
    "ssd": ssd,
    "ssd_linear": ssd_linear,
    "satd": satd,
    "quantize": quantize,
    "quantize_inverse": quantize_inverse,
    "reconstruct": reconstruct,
    "forward_transform": forward_transform,
    "inverse_transform": inverse_transform,
    "inverse_transform_add": inverse_transform_add,
    "pred_uni": pred_uni,
    "pred_bi": pred_bi,
    "pred_intra": pred_intra,
    "refine_qpel": refine_qpel,
    "residual_pipeline": residual_pipeline,
}

# Python-level (shape/branch-determining) argument positions per op; the
# registry's default jit-of-REF tier marks these static.
_STATIC = {
    "sad_grid": (2, 3),        # num_dy, num_dx
    "pred_intra": (0, 4, 5),   # mode, n, filter_edge
    "pred_uni": (3,),          # taps
    "pred_bi": (6,),           # taps
    "forward_transform": (1,),  # transform type
    "inverse_transform": (1,),
    "inverse_transform_add": (2,),
    "residual_pipeline": (2, 3, 4, 5, 6, 7, 8),  # quant params, tu, tr_type
}

for _name, _fn in _REF_OPS.items():
    registry.register(_name, Tier.REF, _fn, static_argnums=_STATIC.get(_name))

__all__ = [
    "sad", "sad_multiref", "sad_grid",
    "ssd", "ssd_linear", "satd",
    "quantize", "quantize_inverse", "reconstruct",
    "forward_transform", "inverse_transform", "inverse_transform_add", "add_residual",
    "pred_uni", "pred_uni_16", "pred_bi", "refine_qpel",
    "residual_pipeline",
    "pred_intra", "pred_intra_dc", "pred_intra_planar", "pred_intra_angular",
    "pred_intra_all_modes",
]

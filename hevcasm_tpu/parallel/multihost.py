"""Multi-host runtime: process bring-up for pod-slice execution
(SURVEY.md section 2.3, BASELINE config 5).

GSPMD means the per-host program is identical; the only multi-host-specific
code is initialization and building a global mesh.  A 4K 32-frame GOP then
runs through encode_gop_data_parallel / encode_inter_frame_spatial unchanged:
frame-axis collectives ride DCN across hosts, row-axis halo exchange rides
ICI within a slice (lay the 'rows' axis along the slice's minor mesh
dimension, which make_global_mesh does by putting 'rows' innermost).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize", "make_global_mesh"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up jax.distributed for a multi-host slice.

    With TPU metadata available (GCE/Borg), bare ``initialize()`` suffices;
    the explicit arguments cover manual bring-up (e.g. on-prem pods).
    Idempotent: safe to call when already initialized or single-host.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # Already initialized, or single-process run without coordinator.
        pass


def make_global_mesh(frames: int, rows: int) -> Mesh:
    """A (frames, rows) mesh over ALL devices in the job (across hosts).

    'rows' is the innermost axis so halo ppermutes map to neighbouring
    chips (ICI) rather than cross-host hops (DCN); 'frames' spans hosts,
    where only whole reconstructed frames ever cross.
    """
    devs = np.asarray(jax.devices())
    assert devs.size == frames * rows, (
        f"mesh {frames}x{rows} != {devs.size} devices"
    )
    return Mesh(devs.reshape(frames, rows), axis_names=("frames", "rows"))

"""Device mesh + sharding helpers.

The reference has no distributed execution at all (SURVEY.md §2e); this is
the TPU-native scaling layer it lacks. One mesh axis, ``data``, with two
sharding modes selected per clip shape (pipelines/pose2vid.py):

- **Window-batch DP** (``mesh_axis="data"``): multi-window clips shard the
  window batch via sharding constraints; weights and banks replicate; the
  overlap-average scatter is a per-device partial sum that XLA turns into
  a psum when the scatter targets replicated output.
- **Frame-axis parallelism** (``frame_axis="data"`` + ``mesh``): the
  flagship 24-frame clip has ONE window, so window DP degenerates.
  shard_map splits the frame axis through VAE encode/decode, the pose
  guider, and the denoising UNet — every op is frame-local except the
  temporal attention, which swaps frame- for spatial-sharding with one
  all-to-all each way (models/unet.py::motion_module_apply). Per-device
  FLOPs are 1/n of the global work.

Collectives ride XLA/SPMD entirely — no hand-written NCCL analog is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None,
             axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def shard_batch(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch/window/frame) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_sharded(x, mesh: Mesh, axis_name: str = "data"):
    return jax.device_put(x, shard_batch(mesh, axis_name))


def put_replicated(x, mesh: Mesh):
    return jax.device_put(x, replicate(mesh))

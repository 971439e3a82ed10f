"""Device mesh and sharding helpers.

The reference's only data-parallelism is OpenMP-threaded env stepping
(vec_env_base.cpp:124,156) and its training is single-GPU (SURVEY.md §2.5).
The TPU-native replacement: a 1-D ``data`` mesh over chips, batch sharded on
axis 0, parameters replicated, XLA inserting the psum gradient all-reduce
over ICI.  TP/PP/SP/EP are deliberately NOT built — the models are 0.2M-12M
params (SURVEY.md §2.5 rules them out); the scaling dimension for this
workload is streams/trajectories, i.e. pure DP.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicate_params(params, mesh: Mesh):
    """Place every param fully replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard every batch array along its leading (frame/stream) axis."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))

"""Device mesh and sharding helpers.

The reference has no multi-device runtime at all — "multi-GPU" is a
CUDA_VISIBLE_DEVICES env var (/root/reference/edgegan/train.py:77).
Here data parallelism is first-class: a 1-D 'data' mesh over all local
(or distributed) devices, the batch sharded on it, parameters/optimizer
state replicated, and XLA inserting the psum gradient reductions over
ICI (SURVEY.md §2.4).

EdgeGAN is a ~40M-param CNN at 64x64 — batch is the only axis worth
sharding; TP/PP/SP would add collectives with nothing to amortise them
(documented absence, SURVEY.md §2.4).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Optional[Sequence] = None,
                axis_name: str = 'data') -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def maybe_distributed_init():
    """Multi-host init: call jax.distributed.initialize() when a
    coordinator is configured (TPU pod / multi-process launch); no-op
    for single-process runs. Collectives then ride ICI within a slice
    and DCN across slices — all through the same Mesh."""
    import os
    if (os.environ.get('JAX_COORDINATOR_ADDRESS')
            or os.environ.get('COORDINATOR_ADDRESS')):
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass  # already initialised


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with the batch axis sharded over the mesh."""
    sharding = batch_sharding(mesh)
    return tuple(jax.device_put(a, sharding) for a in arrays)

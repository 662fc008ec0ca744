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
    and DCN across slices — all through the same Mesh.

    On TPU pods the launcher environment is auto-detected; for explicit
    launches (and the 2-process CPU test) set JAX_COORDINATOR_ADDRESS
    plus JAX_NUM_PROCESSES/JAX_PROCESS_ID."""
    import os
    addr = (os.environ.get('JAX_COORDINATOR_ADDRESS')
            or os.environ.get('COORDINATOR_ADDRESS'))
    if not addr:
        return
    kwargs = {}
    if os.environ.get('JAX_NUM_PROCESSES'):
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ['JAX_NUM_PROCESSES']),
            process_id=int(os.environ['JAX_PROCESS_ID']))
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialised


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with the batch axis sharded over the mesh."""
    sharding = batch_sharding(mesh)
    return tuple(jax.device_put(a, sharding) for a in arrays)


def is_process_zero() -> bool:
    """True on the process that should own host-side writes (stdout,
    metrics.jsonl, TensorBoard). Checkpoint saves are NOT guarded by
    this — Orbax saves are collective across processes."""
    return jax.process_index() == 0


def barrier(name: str, timeout_ms: int = 1_800_000):
    """Coordination-service barrier (multi-process only; no-op
    otherwise). Unlike a device collective, this rendezvous has a
    configurable timeout — use it to absorb inter-process COMPILE-TIME
    skew before the first executed collective: Gloo/ICI context
    creation inside a collective has a short (~30 s) key-exchange
    timeout, so if one host compiles from cache in seconds while
    another compiles cold for minutes, the faster one dies waiting."""
    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed
        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_ms)
    except Exception as e:  # pragma: no cover - depends on jax internals
        import logging
        logging.warning('parallel.barrier(%s) unavailable: %s', name, e)


def warm_collectives(mesh: Mesh, axis_name: str = 'data'):
    """Execute one tiny psum over the mesh so the cross-process
    communicator contexts (Gloo on CPU, ICI/DCN on TPU pods) are
    created NOW, while the processes are tightly synchronized.

    Context creation happens lazily at the first *executed* collective
    and has a short (~30 s) peer key-exchange deadline. The host work
    between the post-compile barrier and the first real train step is
    asymmetric across processes (process 0 builds the SummaryWriter,
    opens metrics.jsonl, ...), so on a loaded host the slower process
    can exceed the deadline and kill its peer's first step. One
    executed psum right after the barrier moves context creation
    inside the synchronized window; every later collective reuses the
    established context. No-op single-process."""
    if jax.process_count() == 1:
        return
    sharding = NamedSharding(mesh, P(axis_name))
    f = jax.jit(jax.shard_map(lambda x: jax.lax.psum(x, axis_name),
                              mesh=mesh, in_specs=P(axis_name),
                              out_specs=P()))
    local = np.ones((mesh.devices.size // jax.process_count(),),
                    np.float32)
    (x,) = put_global(sharding, local)
    # force execution + completion: the context is only created (and
    # the race only closed) once the collective actually runs
    np.asarray(f(x).addressable_data(0))


def put_global(sharding: NamedSharding, *arrays):
    """Assemble global device arrays from per-process host shards.

    Single-process: a plain device_put of the full batch. Multi-process
    (TPU pod / multi-host DP): each process passes only ITS slice of
    the global batch (the rows destined for its addressable devices)
    and `jax.make_array_from_process_local_data` stitches them into one
    global jax.Array on the mesh — host->device stays local, gradient
    psums ride ICI/DCN. No reference counterpart (SURVEY.md §2.4)."""
    if jax.process_count() == 1:
        return tuple(jax.device_put(a, sharding) for a in arrays)
    return tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in arrays)

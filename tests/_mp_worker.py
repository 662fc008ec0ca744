"""Worker for the 2-process jax.distributed CPU test.

Launched twice by tests/test_parallel.py::test_two_process_distributed
with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set.
Each process owns 4 virtual CPU devices; together they form the same
8-device 'data' mesh the single-process tests use, so one train step on
a fixed global batch must reproduce the single-process metrics exactly.
This drives the real multi-host path: jax.distributed.initialize via
maybe_distributed_init, per-process batch shards assembled with
put_global (jax.make_array_from_process_local_data), Gloo collectives.
"""
import json
import os
import sys


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))  # repo root -> import edgegan_tpu
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=4')
    import jax
    jax.config.update('jax_platforms', 'cpu')

    import numpy as np
    from edgegan_tpu.core.config import Config
    from edgegan_tpu.parallel import (barrier, batch_sharding, create_mesh,
                                      is_process_zero,
                                      maybe_distributed_init, put_global,
                                      replicated)
    from edgegan_tpu.train import (Networks, create_train_state,
                                   make_train_step)

    maybe_distributed_init()
    nproc = jax.process_count()
    pid = jax.process_index()
    assert nproc == 2, nproc
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    cfg = Config(batch_size=8, num_classes=3, z_dim=8,
                 output_height=32, output_width=64,
                 input_height=32, input_width=64,
                 image_dis_size=32, edge_dis_size=32).derive('train')
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)

    mesh = create_mesh()
    repl = replicated(mesh)
    sharding = batch_sharding(mesh)
    # replicate the (identically-initialised) state across both hosts
    state = jax.tree.map(
        lambda x: put_global(repl, np.asarray(x))[0], state)

    # fixed GLOBAL batch, identical in both processes and in the
    # single-process reference computed by the pytest side
    b = cfg.batch_size
    images_g = np.random.RandomState(0).randn(
        b, 32, 64, 3).astype(np.float32).clip(-1, 1)
    z_g = np.random.RandomState(1).randn(
        b, cfg.z_feed_width()).astype(np.float32)
    z_g[:, -1] = np.random.RandomState(2).randint(0, 3, b)
    lo = pid * (b // nproc)
    hi = lo + b // nproc
    images, z = put_global(sharding, images_g[lo:hi], z_g[lo:hi])
    assert images.shape == (b, 32, 64, 3)  # global shape, local shard

    # compile-before-execute + rendezvous: absorbs compile-time skew so
    # the first collective's Gloo context init can't time out
    key = jax.device_put(jax.random.PRNGKey(3), repl)
    step = jax.jit(make_train_step(nets, cfg)).lower(
        state, images, z, key).compile()
    barrier('mp_worker_compiled')
    new_state, metrics = step(state, images, z, key)
    jax.block_until_ready(metrics)
    metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
    if is_process_zero():
        print('MPMETRICS ' + json.dumps(metrics), flush=True)


if __name__ == '__main__':
    main()

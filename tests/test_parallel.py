"""Data-parallel tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from edgegan_tpu.core.config import Config
from edgegan_tpu.parallel import (batch_sharding, create_mesh, replicated,
                                  shard_batch)
from edgegan_tpu.train import Networks, create_train_state, make_train_step


def tiny_cfg():
    return Config(batch_size=8, num_classes=3, z_dim=8,
                  output_height=32, output_width=64,
                  input_height=32, input_width=64,
                  image_dis_size=32, edge_dis_size=32).derive('train')


def test_mesh_creation(devices):
    mesh = create_mesh(devices)
    assert mesh.shape == {'data': 8}


def test_sharded_train_step(devices):
    cfg = tiny_cfg()
    mesh = create_mesh(devices)
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    state = jax.device_put(state, replicated(mesh))

    b = cfg.batch_size
    images = np.random.RandomState(0).randn(
        b, 32, 64, 3).astype(np.float32).clip(-1, 1)
    z = np.random.RandomState(1).randn(
        b, cfg.z_feed_width()).astype(np.float32)
    z[:, -1] = np.random.RandomState(2).randint(0, 3, b)
    images, z = shard_batch(mesh, images, z)
    assert images.sharding.spec == P('data')

    step = jax.jit(make_train_step(nets, cfg))
    new_state, metrics = step(state, images, z, jax.random.PRNGKey(3))
    jax.block_until_ready(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # updated params stay replicated
    leaf = jax.tree.leaves(new_state.params['G1'])[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_matches_single_device(devices):
    """DP semantics: the sharded step must produce the same numbers as
    the unsharded step (global-mean losses, replicated updates)."""
    cfg = tiny_cfg()
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    b = cfg.batch_size
    images = jnp.asarray(np.random.RandomState(0).randn(
        b, 32, 64, 3).astype(np.float32).clip(-1, 1))
    # device-z default: the feed is the class column; the step's global
    # on-device draw must be sharding-invariant for this test to pass
    z_np = np.random.RandomState(1).randn(
        b, cfg.z_feed_width()).astype(np.float32)
    z_np[:, -1] = np.random.RandomState(2).randint(0, 3, b)
    z = jnp.asarray(z_np)

    step = jax.jit(make_train_step(nets, cfg))
    _, metrics_single = step(state, images, z, jax.random.PRNGKey(3))

    mesh = create_mesh(devices)
    state_r = jax.device_put(state, replicated(mesh))
    images_s, z_s = shard_batch(mesh, np.asarray(images), z_np)
    _, metrics_sharded = step(state_r, images_s, z_s, jax.random.PRNGKey(3))

    for k in metrics_single:
        np.testing.assert_allclose(float(metrics_single[k]),
                                   float(metrics_sharded[k]),
                                   rtol=2e-4, atol=1e-5)


def test_put_global_single_process(devices):
    """put_global == device_put in the 1-process case."""
    from edgegan_tpu.parallel import put_global
    mesh = create_mesh(devices)
    sharding = batch_sharding(mesh)
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    (arr,) = put_global(sharding, x)
    assert arr.sharding.spec == P('data')
    np.testing.assert_array_equal(np.asarray(arr), x)


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    """Real multi-host DP: 2 jax.distributed CPU processes x 4 virtual
    devices run one train step on per-process batch shards; process 0's
    metrics must match a single-process 8-device run on the same global
    batch (SURVEY.md §2.4 — the component the reference never had)."""
    import json
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), '_mp_worker.py')
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
        env.update(JAX_COORDINATOR_ADDRESS=f'localhost:{port}',
                   JAX_NUM_PROCESSES='2', JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    mp_line = [ln for ln in outs[0].splitlines()
               if ln.startswith('MPMETRICS ')]
    assert mp_line, outs[0][-3000:]
    mp_metrics = json.loads(mp_line[0][len('MPMETRICS '):])

    # single-process reference on the identical global batch
    cfg = tiny_cfg()
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    b = cfg.batch_size
    images = np.random.RandomState(0).randn(
        b, 32, 64, 3).astype(np.float32).clip(-1, 1)
    z = np.random.RandomState(1).randn(
        b, cfg.z_feed_width()).astype(np.float32)
    z[:, -1] = np.random.RandomState(2).randint(0, 3, b)
    step = jax.jit(make_train_step(nets, cfg))
    _, ref = step(state, jnp.asarray(images), jnp.asarray(z),
                  jax.random.PRNGKey(3))
    for k, v in mp_metrics.items():
        np.testing.assert_allclose(v, float(ref[k]), rtol=2e-4, atol=1e-5)


def test_graft_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'graft_entry', '/root/repo/__graft_entry__.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_inference_matches_single_device(devices):
    """Multi-chip batched inference (cli/test.py --test_batch_size,
    serve.Batcher(mesh=...)): the test forward over a batch-sharded
    input + replicated params must match the single-device forward
    numerically (same rng key both ways). Not bit-for-bit: the
    generator's FIRST norm is train-mode BATCH norm (quirk Q14), so
    batch statistics span devices and GSPMD's psum reduction order
    differs from the single-device sum at the ~1e-6 level."""
    from edgegan_tpu.infer import make_test_forward

    cfg = tiny_cfg().derive('test')
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    params = {k: state.params[k] for k in ('G1', 'G2', 'E')}
    aux = {k: state.aux[k] for k in ('G1', 'G2', 'E')}

    b = 8
    images = np.random.RandomState(0).randn(
        b, cfg.output_height, cfg.output_width, 3).astype(
            np.float32).clip(-1, 1)
    classes = np.arange(b, dtype=np.int32) % cfg.num_classes
    key = jax.random.PRNGKey(7)

    forward = make_test_forward(nets, cfg)
    edge_1, img_1 = forward(params, aux, images, classes, key)

    mesh = create_mesh(devices)
    params_r = jax.device_put(params, replicated(mesh))
    aux_r = jax.device_put(aux, replicated(mesh))
    images_s, classes_s = shard_batch(mesh, images, classes)
    edge_s, img_s = forward(params_r, aux_r, images_s, classes_s, key)
    assert edge_s.sharding.spec == P('data')

    np.testing.assert_allclose(np.asarray(edge_1), np.asarray(edge_s),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(img_1), np.asarray(img_s),
                               rtol=1e-4, atol=1e-5)


def test_batcher_mesh_serving(devices):
    """serve.Batcher with a mesh: requests ride batch-sharded padded
    batches; outputs must match the single-device batcher for the same
    submissions (same per-dispatch rng)."""
    from edgegan_tpu.infer import make_test_forward
    from edgegan_tpu.serve import Batcher

    cfg = tiny_cfg().derive('test')
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    params = {k: state.params[k] for k in ('G1', 'G2', 'E')}
    aux = {k: state.aux[k] for k in ('G1', 'G2', 'E')}
    forward = make_test_forward(nets, cfg, jit=False)
    hw = (cfg.output_height, cfg.output_width)
    img = np.random.RandomState(3).uniform(
        -1, 1, (cfg.output_height, cfg.output_width, 3)).astype(
            np.float32)

    outs = {}
    for name, mesh in [('single', None), ('mesh', create_mesh(devices))]:
        batcher = Batcher(forward, params, aux, hw, cfg.num_classes,
                          max_batch=8, max_wait_ms=50.0,
                          transfer_dtype='float32', mesh=mesh)
        try:
            # one full batch: all 8 submitted before the wait expires
            qs = [batcher.submit(img, i % cfg.num_classes)
                  for i in range(8)]
            outs[name] = [q.get(timeout=300) for q in qs]
        finally:
            batcher.stop()
        for o in outs[name]:
            assert not isinstance(o, Exception), o

    for a, b in zip(outs['single'], outs['mesh']):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

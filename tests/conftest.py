"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the TPU ('axon') backend and
forces jax_platforms via jax.config, so env vars alone don't switch the
platform — override through jax.config before any backend initialises.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def devices():
    devs = jax.devices()
    assert len(devs) == 8 and devs[0].platform == 'cpu', devs
    return devs


@pytest.fixture(scope='session')
def tiny_config():
    from edgegan_tpu.core.config import Config
    # Small but structurally complete: multiclass, all three critics.
    return Config(batch_size=8, num_classes=4, z_dim=16,
                  image_dis_size=32, edge_dis_size=32).derive('train')

"""bf16 mixed-precision and 128x128 (BASELINE config 5) coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgegan_tpu.core.config import Config
from edgegan_tpu.train import Networks, create_train_state, make_train_step


def make_batch(cfg, seed=0):
    b = cfg.batch_size
    images = jnp.asarray(np.random.RandomState(seed).randn(
        b, cfg.output_height, cfg.output_width, 3).astype(np.float32)
        .clip(-1, 1))
    zdim = cfg.z_feed_width()  # full z (host_z) or class column (device z)
    z = np.random.RandomState(seed + 1).randn(b, zdim).astype(np.float32)
    if cfg.multiclasses:
        z[:, -1] = np.random.RandomState(seed + 2).randint(
            0, cfg.num_classes, b)
    return images, jnp.asarray(z)


def test_bf16_step_finite_and_params_stay_f32():
    cfg = Config(batch_size=4, num_classes=3, z_dim=8,
                 output_height=32, output_width=64,
                 input_height=32, input_width=64,
                 image_dis_size=32, edge_dis_size=32,
                 dtype='bfloat16').derive('train')
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    step = jax.jit(make_train_step(nets, cfg))
    images, z = make_batch(cfg)
    new_state, metrics = step(state, images, z, jax.random.PRNGKey(3))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
        assert jnp.asarray(v).dtype == jnp.float32  # f32 loss reductions
    for leaf in jax.tree.leaves(new_state.params):
        assert leaf.dtype == jnp.float32  # master params stay f32
    for name in new_state.params:
        before = jax.tree.leaves(state.params[name])
        after = jax.tree.leaves(new_state.params[name])
        assert any(not np.allclose(a, b) for a, b in zip(before, after)), name


def test_128x128_config():
    # BASELINE config 5: 128x128 upscaled variant (pairs are 128x256).
    cfg = Config(batch_size=2, num_classes=3, z_dim=8,
                 output_height=128, output_width=256,
                 input_height=128, input_width=256,
                 image_dis_size=128, edge_dis_size=128).derive('train')
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    # generators produce 128x128 halves
    z_in = jnp.zeros((2, nets.gen_input_dim), jnp.float32)
    edge, image = nets.generate(state.params, state.aux, z_in)
    assert edge.shape == (2, 128, 128, 3)
    assert image.shape == (2, 128, 128, 3)

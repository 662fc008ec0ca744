"""Checkpoint save/restore roundtrip with the reference's step-parsing
resume semantics (models/edgegan.py:635-657)."""
import jax
import jax.numpy as jnp
import numpy as np

from edgegan_tpu import checkpoint as ckpt
from edgegan_tpu.core.config import Config
from edgegan_tpu.train import Networks, create_train_state


def make_state():
    cfg = Config(batch_size=4, num_classes=3, z_dim=8,
                 output_height=32, output_width=64,
                 input_height=32, input_width=64,
                 image_dis_size=32, edge_dis_size=32).derive('train')
    nets = Networks(cfg)
    return create_train_state(nets, jax.random.PRNGKey(0),
                              cfg.learning_rate)


def test_roundtrip(tmp_path):
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    ckpt.save(d, 502, state)
    loaded, counter, restored = ckpt.load(d, state)
    assert loaded and counter == 502
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step_picked(tmp_path):
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    ckpt.save(d, 2, state)
    ckpt.save(d, 1002, state)
    assert ckpt.latest_step(d) == 1002


def test_missing_returns_false(tmp_path):
    state = make_state()
    loaded, counter, restored = ckpt.load(str(tmp_path / 'nope'), state)
    assert not loaded and counter == 0 and restored is None

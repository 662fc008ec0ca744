"""TensorBoard summaries + dataset cache tests."""
import glob
import os

import jax
import numpy as np
import pytest

from edgegan_tpu.core.config import Config
from edgegan_tpu.summaries import SCALARS, SummaryWriter, _grid
from edgegan_tpu.train import Networks, create_train_state


def tiny_cfg():
    return Config(batch_size=4, num_classes=3, z_dim=8,
                  output_height=32, output_width=64,
                  input_height=32, input_width=64,
                  image_dis_size=32, edge_dis_size=32).derive('train')


def test_writer_produces_event_files(tmp_path):
    cfg = tiny_cfg()
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    tb = SummaryWriter(str(tmp_path), nets, cfg)
    metrics = {k: 0.5 for k in SCALARS}
    tb.scalars(1, metrics)
    images = np.random.RandomState(0).randn(4, 32, 64, 3).astype(
        np.float32).clip(-1, 1)
    z = np.random.RandomState(1).randn(4, 9).astype(np.float32)
    z[:, -1] = 0
    tb.extras(1, state, images, z)
    tb.close()
    events = glob.glob(os.path.join(str(tmp_path), 'events.out.*'))
    assert events and os.path.getsize(events[0]) > 1000


def test_extras_accepts_device_z_feed(tmp_path):
    """Under the device-z default (Config.host_z=False) the train loop
    hands extras a class-column-only z ([B,1]); the writer must widen it
    with a step-seeded latent for the sample forward + z histogram."""
    cfg = tiny_cfg()
    assert cfg.z_feed_width() == 1
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    tb = SummaryWriter(str(tmp_path), nets, cfg)
    images = np.random.RandomState(0).randn(4, 32, 64, 3).astype(
        np.float32).clip(-1, 1)
    z = np.zeros((4, 1), np.float32)  # class ids only
    tb.extras(1, state, images, z)
    tb.close()
    events = glob.glob(os.path.join(str(tmp_path), 'events.out.*'))
    assert events and os.path.getsize(events[0]) > 1000


def test_written_tag_set_is_reference_superset(tmp_path):
    """The written TB tag set must cover everything the reference's
    d_sum/g_sum contain (models/edgegan.py:344-411)."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    cfg = tiny_cfg()
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    tb = SummaryWriter(str(tmp_path), nets, cfg)
    tb.scalars(1, {k: 0.5 for k in SCALARS})
    images = np.random.RandomState(0).randn(4, 32, 64, 3).astype(
        np.float32).clip(-1, 1)
    z = np.random.RandomState(1).randn(4, 9).astype(np.float32)
    z[:, -1] = 0
    tb.extras(1, state, images, z)
    tb.close()

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    # flax writes TBv2 tensor events: every tag lands under 'tensors'
    got = set(acc.Tags()['tensors'])
    ref_scalars = {'joint_dis_dloss', 'joint_dis_gloss', 'image_dis_dloss',
                   'image_dis_gloss', 'edge_dis_dloss', 'edge_dis_gloss',
                   'edge_gloss', 'image_gloss', 'zl_loss', 'loss_g_ac',
                   'loss_d_ac'}
    ref_hists = {'z', 'd', 'd_', 'imageD', 'imageDfake', 'edgeD',
                 'edgeDfake'}
    ref_images = {'inputs', 'G1', 'G2', 'resized_inputs_image',
                  'resized_G_image', 'resized_inputs_p3_image',
                  'resized_G_p3_image'}
    assert (ref_scalars | ref_hists | ref_images) <= got, sorted(got)


def test_grid_range():
    batch = np.random.RandomState(0).uniform(-1, 1, (4, 8, 8, 3))
    g = _grid(batch)
    assert g.shape == (8, 32, 3)
    assert g.min() >= 0.0 and g.max() <= 1.0


def test_dataset_cache_hits(tmp_path):
    from PIL import Image
    from edgegan_tpu.data import Dataset
    root = str(tmp_path)
    for i in range(4):
        d = os.path.join(root, 'ds', 'train', '0')
        os.makedirs(d, exist_ok=True)
        arr = np.random.RandomState(i).randint(0, 256, (64, 128, 3),
                                               dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f'{i}.png'))
    cfg = {'input_height': 64, 'input_width': 128, 'output_height': 64,
           'output_width': 128, 'crop': False, 'grayscale': False,
           'z_dim': 4}
    ds = Dataset(root, 'ds', float('inf'), 4, cfg, 1, 'train', cache=True)
    imgs1, _, files = ds[0]
    assert len(ds._cache) == 4
    imgs2, _, _ = ds[0]
    np.testing.assert_array_equal(imgs1, imgs2)
    # cached load skips decode: poke the cache to prove it's used
    key = files[0]
    ds._cache[key] = ds._cache[key] * 0
    imgs3, _, _ = ds[0]
    assert np.all(imgs3[0] == 0)

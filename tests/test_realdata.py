"""Real-data path tests: the reference's own example images
(/root/reference/images/dataset_example) through decode -> bytescale ->
resize -> mask -> forward -> save, plus golden fixtures pinning the
scipy-quirk image pipeline (bytescale's +0.4999 round, imresize's
uint8 round-trip — reference utils.py:125-160).
"""
import glob
import os
import shutil

import numpy as np
import pytest

from edgegan_tpu.utils.images import (bytescale, get_image, imresize,
                                      save_images)

REF_TEST = '/root/reference/images/dataset_example/test'
REF_TRAIN = '/root/reference/images/dataset_example/train'
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_TEST),
                                reason='reference examples not present')


# ---- golden fixtures ----

def test_bytescale_golden():
    # hand-computed from old-scipy bytescale: (x-cmin)*255/(cmax-cmin)
    # + 0.4999, clip, uint8 cast. x=1 of [0,2] -> 127.9999 -> 127.
    np.testing.assert_array_equal(
        bytescale(np.array([[0., 1., 2.]])), [[0, 127, 255]])
    # constant array: cscale 0 -> treated as 1 -> all zeros
    np.testing.assert_array_equal(
        bytescale(np.array([[10., 10.]])), [[0, 0]])
    np.testing.assert_array_equal(
        bytescale(np.array([[-1., 0., 1.]])), [[0, 127, 255]])
    # uint8 passthrough, no stretch
    np.testing.assert_array_equal(
        bytescale(np.array([[5, 9]], np.uint8)), [[5, 9]])


def test_imresize_golden():
    # committed regression values: 4x6 float ramp (x10), bilinear 2x3.
    # The stretch maps [0,230] onto [0,255] BEFORE the PIL resize.
    arr = np.arange(24, dtype=np.float64).reshape(4, 6) * 10
    expected = np.array([[56, 76, 95], [160, 180, 199]], np.uint8)
    np.testing.assert_array_equal(imresize(arr, (2, 3)), expected)


def test_get_image_golden_real_file():
    """Pins the full decode->bytescale->resize->[-1,1] pipeline on a
    REAL reference example pair (committed goldens)."""
    img = get_image(os.path.join(REF_TEST, '14809.png'),
                    64, 128, 64, 128, crop=False)
    assert img.shape == (64, 128, 3)
    assert img.min() >= -1.0 and img.max() <= 1.0
    np.testing.assert_allclose(float(img.sum()), 22961.788235294116,
                               rtol=1e-9)
    np.testing.assert_allclose(
        img[40, 20:24, 0], [1.0, 0.9372549, 0.20784314, 0.52156863],
        atol=1e-8)
    np.testing.assert_allclose(
        img[40, 84:87, 0], [0.98431373, 0.9372549, 0.20784314], atol=1e-8)


# ---- real-data dataset + masking ----

def test_real_testset_loads(tmp_path):
    """Recursive test glob over the real files; batch transform."""
    from edgegan_tpu.data import Dataset
    root = str(tmp_path)
    dst = os.path.join(root, 'ds', 'test', '0')
    os.makedirs(dst)
    for f in sorted(glob.glob(os.path.join(REF_TEST, '*.png'))):
        shutil.copy(f, dst)
    cfg = {'input_height': 64, 'input_width': 128, 'output_height': 64,
           'output_width': 128, 'crop': False, 'grayscale': False}
    ds = Dataset(root, 'ds', float('inf'), 1, cfg, None, 'test')
    assert len(ds) == 4
    imgs, files = ds[0]
    assert imgs.shape == (1, 64, 128, 3)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0


def test_broken_output_combination_rejected(tmp_path):
    """Quirk Q7: the reference's 'outputL_inputR' mode crashes
    (undefined inputR, models/edgegan.py:613-614); the rebuild rejects
    it up front with a clear error instead of a NameError."""
    from edgegan_tpu.cli import test as cli_test
    with pytest.raises(SystemExit, match='outputL_inputR'):
        cli_test.main(['--dataroot', str(tmp_path), '--dataset', 'ds',
                       '--output_combination', 'outputL_inputR'])


def test_flat_test_paths_are_masked_not_fatal():
    """The reference's example test files sit flat (no class dir): the
    class parse hits 'test' -> masked out like the reference's bare
    except (models/edgegan.py:556-570), never an exception."""
    from edgegan_tpu.cli.test import classes_of
    files = sorted(glob.glob(os.path.join(REF_TEST, '*.png')))
    ids, mask = classes_of(files, 14)
    assert ids == [] and not mask.any()
    # and a valid class dir parses
    ids, mask = classes_of(['data/ds/test/3/x.png', 'x.png'], 14)
    assert ids == [3]
    np.testing.assert_array_equal(mask, [True, False])


@pytest.mark.slow
def test_real_infer_and_save(tmp_path):
    """Full-size inference graph (encoder -> G1/G2, reference test
    stack test.py:115-126) on a REAL sketch pair, saved through the
    bytescale path."""
    import jax
    from edgegan_tpu.core.config import Config
    from edgegan_tpu.infer import make_test_forward
    from edgegan_tpu.train import Networks, create_train_state

    cfg = Config().derive('test')  # full-size 64x128, 14 classes
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    forward = make_test_forward(nets, cfg)
    img = get_image(os.path.join(REF_TEST, '14809.png'),
                    64, 128, 64, 128, crop=False)[np.newaxis].astype(
                        np.float32)
    edge_out, image_out = forward(state.params, state.aux, img,
                                  np.zeros((1,), np.int32),
                                  jax.random.PRNGKey(6666))
    full = np.concatenate([img, np.asarray(edge_out),
                           np.asarray(image_out)], axis=2)
    out = str(tmp_path / 'out.png')
    save_images(full, [1, 1], out)
    from PIL import Image
    assert Image.open(out).size == (256, 64)

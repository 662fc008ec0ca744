"""C++ native loader: bit-exact vs the PIL reference path, fallback
behavior, and integration through Dataset."""
import os

import numpy as np
import pytest
from PIL import Image

from edgegan_tpu.data import native_loader
from edgegan_tpu.utils import get_image


@pytest.fixture(scope='module')
def lib():
    lib = native_loader.get_lib()
    if lib is None:
        pytest.skip('native loader unavailable (no g++/libpng)')
    return lib


def make_png(path, h, w, seed, full_range=True):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    if full_range:
        arr.flat[0] = 0
        arr.flat[-1] = 255
    else:
        arr = (arr % 100 + 50).astype(np.uint8)  # narrow range
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)
    return arr


def test_matches_pil_path_bit_exact(tmp_path, lib):
    paths = [str(tmp_path / f'{i}.png') for i in range(6)]
    for i, p in enumerate(paths):
        make_png(p, 64, 128, seed=i, full_range=(i % 2 == 0))
    out, fail = native_loader.decode_batch(paths, 64, 128)
    assert not fail.any()
    for i, p in enumerate(paths):
        want = get_image(p, 64, 128, 64, 128, crop=False)
        np.testing.assert_allclose(out[i], want.astype(np.float32),
                                   atol=1e-6)


def test_wrong_size_flags_fallback(tmp_path, lib):
    good = str(tmp_path / 'good.png')
    small = str(tmp_path / 'small.png')
    make_png(good, 64, 128, 0)
    make_png(small, 32, 64, 1)
    out, fail = native_loader.decode_batch([good, small], 64, 128)
    assert not fail[0] and fail[1]


def test_missing_file_flags_fallback(tmp_path, lib):
    good = str(tmp_path / 'good.png')
    make_png(good, 64, 128, 0)
    out, fail = native_loader.decode_batch(
        [good, str(tmp_path / 'nope.png')], 64, 128)
    assert not fail[0] and fail[1]


def test_dataset_uses_native_and_matches_pil(tmp_path, lib):
    from edgegan_tpu.data import Dataset
    root = str(tmp_path)
    for i in range(4):
        make_png(os.path.join(root, 'ds', 'train', '0', f'{i}.png'),
                 64, 128, seed=i)
    cfg = {'input_height': 64, 'input_width': 128, 'output_height': 64,
           'output_width': 128, 'crop': False, 'grayscale': False,
           'z_dim': 4}
    ds = Dataset(root, 'ds', float('inf'), 4, cfg, 1, 'train')
    images, _, files = ds[0]
    for img, f in zip(images, files):
        want = get_image(f, 64, 128, 64, 128, crop=False)
        np.testing.assert_allclose(img, want.astype(np.float32), atol=1e-6)


def test_dataset_fallback_on_resize(tmp_path, lib):
    # source 32x64 but target 64x128 -> native flags it, PIL resizes
    from edgegan_tpu.data import Dataset
    root = str(tmp_path)
    for i in range(2):
        make_png(os.path.join(root, 'ds', 'train', '0', f'{i}.png'),
                 32, 64, seed=i)
    cfg = {'input_height': 64, 'input_width': 128, 'output_height': 64,
           'output_width': 128, 'crop': False, 'grayscale': False,
           'z_dim': 4}
    ds = Dataset(root, 'ds', float('inf'), 2, cfg, 1, 'train')
    images, _, _ = ds[0]
    assert images.shape == (2, 64, 128, 3)

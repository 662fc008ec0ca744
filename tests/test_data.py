"""Data pipeline tests: directory semantics, image transform parity
(scipy bytescale behavior), prefetch loader ordering."""
import os

import numpy as np
import pytest
from PIL import Image

from edgegan_tpu.data import Dataset, PrefetchLoader
from edgegan_tpu.utils import (bytescale, get_image, inverse_transform,
                               merge, save_images, transform)

CFG = {'input_height': 64, 'input_width': 128, 'output_height': 64,
       'output_width': 128, 'crop': False, 'grayscale': False, 'z_dim': 10}


def make_png(path, h=64, w=128, seed=0):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)
    return arr


@pytest.fixture
def dataroot(tmp_path):
    root = str(tmp_path)
    for cls in range(3):
        for i in range(5):
            make_png(os.path.join(root, 'ds', 'train', str(cls),
                                  f'img_{i}.png'), seed=cls * 10 + i)
    for cls in range(3):
        make_png(os.path.join(root, 'ds', 'test', str(cls), 'a.png'),
                 seed=cls)
    # invalid class dir for mask test
    make_png(os.path.join(root, 'ds', 'test', 'notaclass', 'b.png'), seed=99)
    return root


class TestTransform:
    def test_full_range_image_roundtrip(self, tmp_path):
        # an image spanning 0..255 passes through bytescale unchanged
        arr = np.zeros((64, 128, 3), np.uint8)
        arr[0, 0] = 0
        arr[-1, -1] = 255
        arr[10:20, 10:20] = 128
        p = str(tmp_path / 'x.png')
        Image.fromarray(arr).save(p)
        out = get_image(p, 64, 128, 64, 128, crop=False)
        expected = arr.astype(np.float64) / 127.5 - 1.0
        np.testing.assert_allclose(out, expected, atol=1e-6)
        assert out.min() >= -1.0 and out.max() <= 1.0

    def test_bytescale_contrast_stretch(self):
        # scipy.misc quirk: float arrays are min/max-stretched to 0..255
        data = np.array([[10.0, 20.0], [30.0, 40.0]])
        out = bytescale(data)
        assert out.min() == 0 and out.max() == 255

    def test_inverse_transform(self):
        x = np.array([-1.0, 0.0, 1.0])
        np.testing.assert_allclose(inverse_transform(x), [0.0, 0.5, 1.0])

    def test_merge_grid(self):
        imgs = np.arange(2 * 2 * 3 * 3, dtype=np.float64).reshape(2, 2, 3, 3)
        grid = merge(imgs, (1, 2))
        assert grid.shape == (2, 6, 3)
        np.testing.assert_allclose(grid[:, :3], imgs[0])
        np.testing.assert_allclose(grid[:, 3:], imgs[1])

    def test_save_images(self, tmp_path):
        img = np.random.RandomState(0).uniform(-1, 1, (1, 8, 8, 3))
        path = str(tmp_path / 'out' / 'img.png')
        save_images(img, [1, 1], path)
        assert os.path.exists(path)
        loaded = np.asarray(Image.open(path))
        assert loaded.shape == (8, 8, 3)


class TestDataset:
    def test_train_multiclass_glob(self, dataroot):
        ds = Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3, 'train')
        assert len(ds.data) == 15
        assert len(ds) == 3  # 15 // 4: last partial batch dropped (Q10)

    def test_batch_contents(self, dataroot):
        ds = Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3, 'train',
                     rng=np.random.RandomState(0))
        images, z, files = ds[0]
        assert images.shape == (4, 64, 128, 3)
        assert images.dtype == np.float32
        assert z.shape == (4, 11)  # z_dim + class column
        classes = z[:, -1]
        expected = [int(os.path.basename(os.path.dirname(f)))
                    for f in files]
        np.testing.assert_allclose(classes, expected)

    def test_test_phase_sorted_recursive(self, dataroot):
        ds = Dataset(dataroot, 'ds', float('inf'), 1, CFG, None, 'test')
        assert len(ds.data) == 4
        assert ds.data == sorted(ds.data)
        images, files = ds[0]
        assert images.shape == (1, 64, 128, 3)

    def test_empty_raises(self, tmp_path):
        with pytest.raises(Exception, match='No data'):
            Dataset(str(tmp_path), 'nope', float('inf'), 1, CFG, None,
                    'train')

    def test_pad_tail_keeps_every_file(self, dataroot):
        """Batched test mode must not Q10-drop the final partial batch:
        4 files at batch 3 -> 2 batches, the tail padded with PAD rows
        that repeat the last image."""
        ds = Dataset(dataroot, 'ds', float('inf'), 3, CFG, None, 'test',
                     pad_tail=True)
        assert len(ds) == 2
        imgs0, files0 = ds[0]
        imgs1, files1 = ds[1]
        assert imgs0.shape == imgs1.shape == (3, 64, 128, 3)
        real = files0 + [f for f in files1 if f != Dataset.PAD]
        assert real == ds.data  # every file exactly once, in order
        assert files1[1:] == [Dataset.PAD, Dataset.PAD]
        # padded rows decode the last real file (static shapes, masked
        # out by the caller before saving)
        np.testing.assert_array_equal(imgs1[1], imgs1[0])

    def test_pad_tail_allows_dataset_smaller_than_batch(self, dataroot):
        ds = Dataset(dataroot, 'ds', float('inf'), 64, CFG, None, 'test',
                     pad_tail=True)
        assert len(ds) == 1
        imgs, files = ds[0]
        assert imgs.shape[0] == 64
        assert files[:4] == ds.data and set(files[4:]) == {Dataset.PAD}


class TestPrefetchLoader:
    def test_order_preserved(self, dataroot):
        ds = Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3, 'train')
        direct = [ds[i][2] for i in range(len(ds))]
        loader = PrefetchLoader(ds, prefetch=2)
        loaded = [files for _, _, files in loader]
        assert direct == loaded
        loader.close()

    def test_image_dtype_cast(self, dataroot):
        """bf16 training transfers bf16 image batches: values must be
        identical to casting the f32 batch (the step casts anyway)."""
        import jax.numpy as jnp
        ds = Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3, 'train')
        ref = ds[0]
        loader = PrefetchLoader(ds, prefetch=2, image_dtype=jnp.bfloat16)
        images, z, files = next(iter(loader))
        loader.close()
        assert images.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(images, np.float32),
            np.asarray(ref[0].astype(jnp.bfloat16), np.float32))
        assert z.dtype == np.float32  # only element 0 is cast
        assert files == ref[2]


class TestZStreams:
    """Latent-z determinism contract (round 4): z is derived per
    (seed, process, shuffle-generation, batch-index), NOT drawn from a
    shared sequential stream — __getitem__ runs concurrently on the
    PrefetchLoader pool, where a shared RandomState made the z->batch
    assignment thread-order-dependent (and the whole run
    irreproducible; the round-4 stability ablation's baseline/rerun
    divergence-onset spread traced back to exactly this)."""

    def test_z_fetch_order_invariant(self, dataroot):
        ds = Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3, 'train',
                     seed=5)
        fwd = [np.array(ds[i][1]) for i in range(len(ds))]
        rev = [np.array(ds[i][1]) for i in reversed(range(len(ds)))][::-1]
        for a, b in zip(fwd, rev):
            np.testing.assert_array_equal(a, b)

    def test_z_reproducible_and_seed_sensitive(self, dataroot):
        za = np.array(Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3,
                              'train', seed=5)[0][1])
        zb = np.array(Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3,
                              'train', seed=5)[0][1])
        zc = np.array(Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3,
                              'train', seed=6)[0][1])
        np.testing.assert_array_equal(za, zb)
        assert not np.array_equal(za, zc)

    def test_z_advances_per_epoch_and_batch(self, dataroot):
        ds = Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3, 'train',
                     seed=5)
        z0, z1 = np.array(ds[0][1]), np.array(ds[1][1])
        assert not np.array_equal(z0[:, :-1], z1[:, :-1])  # per batch
        ds.shuffle()
        z0b = np.array(ds[0][1])
        assert not np.array_equal(z0[:, :-1], z0b[:, :-1])  # per epoch

    def test_z_differs_per_process_shard(self, dataroot):
        """DP shards must get independent latents for the same global
        batch index (multi-host training)."""
        z_p0 = np.array(Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3,
                                'train', seed=5, shard=(0, 2),
                                rng=np.random.RandomState(5))[0][1])
        z_p1 = np.array(Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3,
                                'train', seed=5, shard=(1, 2),
                                rng=np.random.RandomState(5))[0][1])
        assert not np.array_equal(z_p0[:, :-1], z_p1[:, :-1])

    def test_device_z_feed_is_class_column_only(self, dataroot):
        """host_z=False (the Config default, round 5): the step draws
        latents on device, so the dataset returns ONLY the class-id
        column (multiclass) or a width-0 array (single-class) — no host
        Gaussian draw or f32 latent transfer per step."""
        ds = Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3, 'train',
                     seed=5, host_z=False)
        _imgs, z, files = ds[0]
        assert z.shape == (4, 1)
        expected = [float(os.path.basename(os.path.dirname(f)))
                    for f in files]
        np.testing.assert_array_equal(np.asarray(z).ravel(), expected)

    def test_shuffle_seeded_single_process(self, dataroot):
        """Same --seed => same epoch file order (the reference's
        unseeded-global shuffle loses reproducibility; --seed wins)."""
        a = Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3, 'train',
                    seed=5)
        b = Dataset(dataroot, 'ds', float('inf'), 4, CFG, 3, 'train',
                    seed=5)
        a.shuffle(), b.shuffle()
        assert a.data == b.data

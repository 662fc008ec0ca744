"""File-glob dataset (reference /root/reference/edgegan/utils/data/dataset.py).

Directory semantics preserved exactly:
  train multiclass:  dataroot/<name>/train/<classid>/*.{png,jpg}
  train flat:        dataroot/<name>/train/*.png
  test:              recursive sorted glob of *.{png,jpg}
Last partial batch dropped (quirk Q10); class ids parsed from the parent
directory name.
"""
from __future__ import annotations

import os
from glob import glob
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils.images import get_image


def extension_match_recursive(root, exts):
    result = []
    for ext in exts:
        result.extend(str(p) for p in Path(root).rglob(ext))
    return result


class Dataset:
    #: filename sentinel marking a padded row of a tail batch (see
    #: `pad_tail`); callers mask these rows out before saving.
    PAD = '<pad>'

    def __init__(self, dataroot, name, size, batchsize, config,
                 num_classes: Optional[int] = None, phase: str = 'train',
                 rng: Optional[np.random.RandomState] = None,
                 cache: bool = False, shard=(0, 1),
                 seed: Optional[int] = None,
                 subdir: Optional[str] = None,
                 pad_tail: bool = False,
                 host_z: bool = True):
        """`cache=True` keeps every decoded+transformed image in RAM as
        float32 after first touch. The reference re-decodes and resizes
        every PNG on every epoch (dataset.py:58-67); at TPU step times
        (~2 ms) that host work dominates, and the whole SketchyCOCO
        train set is only ~350 MB decoded."""
        assert phase in ('train', 'test')
        self.batchsize = batchsize  # GLOBAL batch (step count parity)
        self.num_classes = num_classes
        self.config = config
        self.phase = phase
        self.rng = rng or np.random
        self.cache = cache
        self._cache: dict = {}
        # Multi-host DP: shard=(process_index, process_count). Each
        # process decodes only its batchsize/process_count rows of every
        # global batch; callers must pass a shared-seeded `rng` so all
        # processes shuffle the file list identically. z noise is drawn
        # from a per-process stream so shards get independent latents.
        self.process_index, self.process_count = shard
        assert batchsize % self.process_count == 0, (batchsize, shard)
        self.local_batchsize = batchsize // self.process_count
        # z latents are derived per (seed, process, shuffle-generation,
        # batch-index) in __getitem__, NOT drawn from a shared
        # sequential stream: __getitem__ runs concurrently on the
        # PrefetchLoader's thread pool, where a shared RandomState is
        # both thread-unsafe and order-dependent (the round-4 stability
        # ablation traced its run-to-run nondeterminism floor to exactly
        # this). Counter-derived streams make a --seed run bit-
        # reproducible while keeping shards' latents independent.
        self._z_base = (seed if seed is not None
                        else int(np.random.randint(2 ** 31)))
        self._shuffle_gen = 0
        # host_z=False (Config.host_z, round 5): the train step draws z
        # on device from the step rng; __getitem__ then returns only the
        # class-id column (multiclass) or an empty array — no per-step
        # host Gaussian draw or f32 latent transfer.
        self.host_z = host_z
        # single-process runs get a seeded shuffle stream too (the
        # reference shuffles via the unseeded numpy global,
        # reference train.py/dataset.py; reproducibility under --seed
        # wins over that quirk — multi-process callers already pass a
        # shared-seeded rng)
        if rng is None and seed is not None:
            self.rng = np.random.RandomState(seed)
        # `subdir` decouples the on-disk split directory from the phase
        # semantics, so train-style listing (class dirs, z latents) can
        # be pointed at any directory of paired images — e.g. a held-out
        # test split for out-of-sample evaluation (scripts/evaluate.py).
        subdir = subdir or phase
        if phase == 'train':
            if num_classes is not None:
                self.data = []
                for i in range(num_classes):
                    for ext in ('*.png', '*.jpg'):
                        self.data.extend(glob(os.path.join(
                            dataroot, name, subdir, str(i), ext)))
                data_path = os.path.join(dataroot, name, subdir)
            else:
                data_path = os.path.join(dataroot, name, subdir, '*.png')
                self.data = glob(data_path)
        else:
            data_path = os.path.join(dataroot, name, subdir)
            self.data = sorted(extension_match_recursive(
                data_path, ['*.png', '*.jpg']))

        # Batched throughput inference (`--test_batch_size`) must not
        # silently drop tail files the way train parity (Q10) does:
        # the final partial batch is padded to full size with repeats
        # of the last file, reported under the PAD sentinel so callers
        # skip the duplicate rows when saving.
        self.pad_tail = pad_tail
        if pad_tail:
            assert phase == 'test' and self.process_count == 1, \
                'pad_tail is a single-process test-mode feature'

        if len(self.data) == 0:
            raise Exception(f"[!] No data found in '{data_path}'")
        if len(self.data) < self.batchsize and not pad_tail:
            raise Exception('[!] Entire dataset size is less than the '
                            'configured batch_size')
        self.size = int(min(len(self.data), size))

    def shuffle(self):
        self.rng.shuffle(self.data)
        self._shuffle_gen += 1  # advances the per-epoch z streams

    def __len__(self):
        if self.pad_tail:  # ceil: tail batch padded, not dropped
            return -(-self.size // self.batchsize)
        return self.size // self.batchsize  # drops last partial batch (Q10)

    def _load_pil(self, f):
        return np.asarray(get_image(
            f,
            input_height=self.config['input_height'],
            input_width=self.config['input_width'],
            resize_height=self.config['output_height'],
            resize_width=self.config['output_width'],
            crop=self.config['crop'],
            grayscale=self.config['grayscale']), np.float32)

    def _native_eligible(self):
        """The C++ loader covers the no-crop, no-grayscale, PNG,
        source-already-at-target-size case bit-exactly; everything else
        falls back to the PIL path per image."""
        return not self.config['crop'] and not self.config['grayscale']

    def _load_batch(self, filenames):
        store = self._cache if self.cache else {}
        missing = [f for f in filenames if f not in store]
        if missing and self._native_eligible():
            from . import native_loader
            res = native_loader.decode_batch(
                missing, self.config['output_height'],
                self.config['output_width'])
            if res is not None:
                imgs, fail = res
                for f, img, bad in zip(missing, imgs, fail):
                    if not bad:
                        store[f] = img
        out = []
        for f in filenames:
            img = store.get(f)
            if img is None:
                img = self._load_pil(f)
                if self.cache:
                    store[f] = img
            out.append(img)
        return np.stack(out)

    def __getitem__(self, idx):
        filenames = self.data[idx * self.batchsize:(idx + 1) * self.batchsize]
        # this process's rows of the global batch
        lo = self.process_index * self.local_batchsize
        filenames = filenames[lo:lo + self.local_batchsize]
        n_pad = 0
        if self.pad_tail and len(filenames) < self.local_batchsize:
            n_pad = self.local_batchsize - len(filenames)
            batch_images = self._load_batch(
                filenames + [filenames[-1]] * n_pad)
            filenames = filenames + [self.PAD] * n_pad
        else:
            batch_images = self._load_batch(filenames)

        if self.phase == 'train':
            classes = None
            if self.num_classes is not None:
                def get_class(path):
                    return int(os.path.basename(os.path.dirname(path)))
                classes = np.array([get_class(f) for f in filenames],
                                   np.float32).reshape(
                                       self.local_batchsize, 1)
            if self.host_z:
                # counter-derived stream: thread-safe under the
                # concurrent prefetch pool and reproducible under --seed
                # (see __init__)
                zrng = np.random.default_rng(np.random.SeedSequence(
                    [self._z_base, self.process_index, self._shuffle_gen,
                     idx]))
                batch_z = zrng.normal(
                    size=(self.local_batchsize,
                          self.config['z_dim'])).astype(np.float32)
                if classes is not None:
                    batch_z = np.concatenate([batch_z, classes], axis=1)
            else:  # device z: only the class column crosses the wire
                batch_z = (classes if classes is not None else
                           np.zeros((self.local_batchsize, 0), np.float32))
            return batch_images, batch_z, filenames
        return batch_images, filenames

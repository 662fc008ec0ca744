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
    def __init__(self, dataroot, name, size, batchsize, config,
                 num_classes: Optional[int] = None, phase: str = 'train',
                 rng: Optional[np.random.RandomState] = None,
                 cache: bool = False):
        """`cache=True` keeps every decoded+transformed image in RAM as
        float32 after first touch. The reference re-decodes and resizes
        every PNG on every epoch (dataset.py:58-67); at TPU step times
        (~2 ms) that host work dominates, and the whole SketchyCOCO
        train set is only ~350 MB decoded."""
        assert phase in ('train', 'test')
        self.batchsize = batchsize
        self.num_classes = num_classes
        self.config = config
        self.phase = phase
        self.rng = rng or np.random
        self.cache = cache
        self._cache: dict = {}
        if phase == 'train':
            if num_classes is not None:
                self.data = []
                for i in range(num_classes):
                    for ext in ('*.png', '*.jpg'):
                        self.data.extend(glob(os.path.join(
                            dataroot, name, phase, str(i), ext)))
                data_path = os.path.join(dataroot, name, phase)
            else:
                data_path = os.path.join(dataroot, name, phase, '*.png')
                self.data = glob(data_path)
        else:
            data_path = os.path.join(dataroot, name, phase)
            self.data = sorted(extension_match_recursive(
                data_path, ['*.png', '*.jpg']))

        if len(self.data) == 0:
            raise Exception(f"[!] No data found in '{data_path}'")
        if len(self.data) < self.batchsize:
            raise Exception('[!] Entire dataset size is less than the '
                            'configured batch_size')
        self.size = int(min(len(self.data), size))

    def shuffle(self):
        self.rng.shuffle(self.data)

    def __len__(self):
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
        batch_images = self._load_batch(filenames)

        if self.phase == 'train':
            batch_z = self.rng.normal(
                size=(self.batchsize, self.config['z_dim'])).astype(
                    np.float32)
            if self.num_classes is not None:
                def get_class(path):
                    return int(os.path.basename(os.path.dirname(path)))
                classes = np.array([get_class(f) for f in filenames],
                                   np.float32).reshape(self.batchsize, 1)
                batch_z = np.concatenate([batch_z, classes], axis=1)
            return batch_images, batch_z, filenames
        return batch_images, filenames

"""Host-side image I/O, matching reference /root/reference/edgegan/utils/utils.py.

The reference reads with scipy.misc.imread (PIL under the hood, cast to
float) and resizes with scipy.misc.imresize. scipy.misc.imresize on a
FLOAT array first runs `bytescale`: it linearly stretches the array's
own [min, max] onto [0, 255] uint8 before the PIL bilinear resize
(utils.py:125-160). The same stretch happens again on save via
scipy.misc.imsave (utils.py:133-135). Both behaviors are reproduced
here because they are visible in the training data and the test
outputs (an image that doesn't span the full 0..255 range gets
contrast-stretched).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image


def bytescale(data: np.ndarray, cmin: Optional[float] = None,
              cmax: Optional[float] = None) -> np.ndarray:
    """scipy.misc.bytescale: linear stretch of [cmin, cmax] -> [0, 255]."""
    if data.dtype == np.uint8:
        return data
    cmin = float(data.min()) if cmin is None else cmin
    cmax = float(data.max()) if cmax is None else cmax
    cscale = cmax - cmin
    if cscale == 0:
        cscale = 1
    scale = 255.0 / cscale
    out = (data - cmin) * scale + 0.4999  # scipy rounds via +0.5 cast
    return np.clip(out, 0, 255).astype(np.uint8)


def imread(path: str, grayscale: bool = False) -> np.ndarray:
    """scipy.misc.imread equivalent (utils.py:126-130): float array."""
    img = Image.open(path)
    if grayscale:
        img = img.convert('F')
        return np.asarray(img, dtype=np.float64)
    img = img.convert('RGB')
    return np.asarray(img, dtype=np.float64)


def imresize(arr: np.ndarray, size: Tuple[int, int],
             interp: str = 'bilinear') -> np.ndarray:
    """scipy.misc.imresize equivalent: bytescale -> PIL resize -> uint8.

    `size` is (height, width) like scipy.
    """
    data = bytescale(arr)
    resample = {'nearest': Image.NEAREST, 'bilinear': Image.BILINEAR,
                'bicubic': Image.BICUBIC}[interp]
    img = Image.fromarray(data)
    img = img.resize((size[1], size[0]), resample=resample)
    return np.asarray(img)


def center_crop(x: np.ndarray, crop_h: int, crop_w: Optional[int],
                resize_h: int = 64, resize_w: int = 64) -> np.ndarray:
    """utils.py:138-145."""
    if crop_w is None:
        crop_w = crop_h
    h, w = x.shape[:2]
    j = int(round((h - crop_h) / 2.0))
    i = int(round((w - crop_w) / 2.0))
    return imresize(x[j:j + crop_h, i:i + crop_w], (resize_h, resize_w))


def transform(image: np.ndarray, input_height: int, input_width: int,
              resize_height: int = 64, resize_width: int = 64,
              crop: bool = True) -> np.ndarray:
    """utils.py:148-160: crop/resize then scale to [-1, 1]."""
    if crop:
        cropped = center_crop(image, input_height, input_width,
                              resize_height, resize_width)
    else:
        cropped = imresize(image, (resize_height, resize_width))
    return np.asarray(cropped, dtype=np.float64) / 127.5 - 1.0


def inverse_transform(images: np.ndarray) -> np.ndarray:
    """utils.py:163-164."""
    return (images + 1.0) / 2.0


def get_image(path: str, input_height: int, input_width: int,
              resize_height: int = 64, resize_width: int = 64,
              crop: bool = True, grayscale: bool = False) -> np.ndarray:
    """utils.py:41-50."""
    image = imread(path, grayscale)
    return transform(image, input_height, input_width,
                     resize_height, resize_width, crop)


def merge(images: np.ndarray, size) -> np.ndarray:
    """Grid compositor (utils.py:67-86)."""
    h, w = images.shape[1], images.shape[2]
    if images.shape[3] in (3, 4):
        c = images.shape[3]
        img = np.zeros((h * size[0], w * size[1], c))
        for idx, image in enumerate(images):
            i = idx % size[1]
            j = idx // size[1]
            img[j * h:j * h + h, i * w:i * w + w, :] = image
        return img
    if images.shape[3] == 1:
        img = np.zeros((h * size[0], w * size[1]))
        for idx, image in enumerate(images):
            i = idx % size[1]
            j = idx // size[1]
            img[j * h:j * h + h, i * w:i * w + w] = image[:, :, 0]
        return img
    raise ValueError('merge(images, size): images must be HxWx1/3/4')


def imsave(images: np.ndarray, size, path: str):
    """scipy.misc.imsave equivalent (utils.py:133-135): per-image
    min/max stretch to uint8 via bytescale, then save."""
    image = np.squeeze(merge(images, size))
    data = bytescale(image)
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    Image.fromarray(data).save(path)


def save_images(images: np.ndarray, size, image_path: str):
    """utils.py:53-54."""
    return imsave(inverse_transform(images), size, image_path)


def makedirs(path: str):
    os.makedirs(path, exist_ok=True)


def image_manifold_size(num_images: int):
    """utils.py:30-34: square-ish grid dims for a sample sheet."""
    import math
    manifold_h = int(np.floor(np.sqrt(num_images)))
    manifold_w = int(np.ceil(np.sqrt(num_images)))
    assert manifold_h * manifold_w == num_images
    return manifold_h, manifold_w


def merge_images(images, size):
    """utils.py:62-63 (size unused there too)."""
    return inverse_transform(images)


def make_gif(images, fname, duration: float = 2.0, true_image: bool = False):
    """utils.py:178-190 equivalent via PIL (no moviepy dependency):
    animated GIF from a list of [-1,1] or uint8 frames."""
    frames = []
    for x in images:
        if true_image:
            arr = np.asarray(x, np.uint8)
        else:
            arr = ((np.asarray(x, np.float64) + 1) / 2 * 255).astype(
                np.uint8)
        frames.append(Image.fromarray(arr))
    ms_per_frame = int(duration * 1000 / max(len(frames), 1))
    os.makedirs(os.path.dirname(fname) or '.', exist_ok=True)
    frames[0].save(fname, save_all=True, append_images=frames[1:],
                   duration=ms_per_frame, loop=0)


def show_all_variables(params_by_net):
    """Parameter table at build time, like the reference's
    slim.model_analyzer.analyze_vars (utils.py:36-38)."""
    total = 0
    print(f'{"network":<12} {"parameters":>14}')
    for name in sorted(params_by_net):
        import jax
        n = sum(int(np.prod(np.asarray(l.shape, dtype=np.int64)))
                for l in jax.tree.leaves(params_by_net[name]))
        total += n
        print(f'{name:<12} {n:>14,}')
    print(f'{"TOTAL":<12} {total:>14,}')
    return total

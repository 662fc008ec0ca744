"""Pooling ops (NHWC).

- `mean_pool`: the reference's strided-slice 2x2 average
  (/root/reference/edgegan/nn/modules/pooling.py:4-8), used by the
  classifier pyramid and MRU cells. Implemented with reshapes so XLA can
  fuse it (it is a pure bandwidth op).
- `tf_avg_pool`: tf.nn.avg_pool with SAME padding, where padded elements
  are EXCLUDED from the denominator (TF semantics). Used by the resnet
  encoder/discriminator paths (e.g. reference encoder.py:68,70).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def mean_pool(x):
    """2x2 average over non-overlapping windows; requires even H, W."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.mean(x, axis=(2, 4))


def tf_avg_pool(x, window: int, stride: int):
    """tf.nn.avg_pool(x, [1,w,w,1], [1,s,s,1], 'SAME') in NHWC.

    TF excludes SAME padding from the denominator; the per-position
    valid-element counts depend only on static shapes, so they are
    computed with numpy at trace time (a baked constant) instead of a
    second reduce_window that XLA would constant-fold slowly.
    """
    import numpy as np
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    summed = lax.reduce_window(x32, 0.0, lax.add, dims, strides, 'SAME')

    def axis_counts(in_size, out_size):
        # SAME padding: pad_total = max((out-1)*s + w - in, 0), split lo/hi
        pad_total = max((out_size - 1) * stride + window - in_size, 0)
        pad_lo = pad_total // 2
        starts = np.arange(out_size) * stride - pad_lo
        ends = starts + window
        return (np.minimum(ends, in_size)
                - np.maximum(starts, 0)).astype(np.float32)

    ch = axis_counts(x.shape[1], summed.shape[1])
    cw = axis_counts(x.shape[2], summed.shape[2])
    counts = jnp.asarray(np.outer(ch, cw)[None, :, :, None])
    return (summed / counts).astype(dtype)


def upsample_nearest(x):
    """2x nearest-neighbor upsample.

    Equivalent to the reference's channel-tile + depth_to_space trick
    (/root/reference/edgegan/nn/modules/upsampling.py:4-19): tiling a
    pixel 4x into channels and redistributing with block size 2 writes
    the same value into each 2x2 output cell.
    """
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x

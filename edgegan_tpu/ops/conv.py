"""Convolution primitives (NHWC, TPU-native).

The reference uses tf.nn.conv2d / tf.nn.conv2d_transpose
(/root/reference/edgegan/nn/modules/conv.py:13-58). Here both are thin
wrappers over `lax.conv_general_dilated`, which XLA lowers straight onto
the MXU. Layout is NHWC with HWIO kernels — the TPU-preferred layout
(channels on the lane dimension).

`deconv2d` reproduces tf.nn.conv2d_transpose exactly by construction: it
is the linear transpose of the corresponding strided SAME convolution
(which is the definition of conv2d_transpose). `jax.linear_transpose`
performs the transposition at trace time, so there is no runtime cost —
XLA sees a single input-dilated convolution.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ('NHWC', 'HWIO', 'NHWC')


def conv2d(x, w, stride: int = 2, pad: str = 'SAME'):
    """2-D convolution. `w`: [k, k, in, out].

    pad in {'SAME', 'VALID', 'REFLECT'}; REFLECT pads by (k-1)//2 with
    mirror padding then runs a VALID conv (reference conv.py:23-26).
    """
    if pad == 'REFLECT':
        k = w.shape[0]
        p = (k - 1) // 2
        x = jnp.pad(x, [(0, 0), (p, p), (p, p), (0, 0)], mode='reflect')
        padding = 'VALID'
    else:
        assert pad in ('SAME', 'VALID'), pad
        padding = pad
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=_DIMS)


def deconv2d(x, w, out_hw: Tuple[int, int], stride: int = 2):
    """Transposed convolution matching tf.nn.conv2d_transpose.

    `w`: [k, k, out_ch, in_ch] (the TF conv2d_transpose filter layout,
    reference conv.py:43-50). `out_hw`: static output spatial size.
    Defined as the linear transpose of the forward strided SAME conv
    y[B,H,W,out] -> x[B,h,w,in], which is exactly what TF computes.
    """
    out_ch = w.shape[2]
    y_shape = jax.ShapeDtypeStruct(
        (x.shape[0], out_hw[0], out_hw[1], out_ch), x.dtype)
    wx = w.astype(x.dtype)

    def fwd(y):
        return lax.conv_general_dilated(
            y, wx, (stride, stride), 'SAME', dimension_numbers=_DIMS)

    (out,) = jax.linear_transpose(fwd, y_shape)(x)
    return out

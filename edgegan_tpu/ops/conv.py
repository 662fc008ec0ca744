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

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ('NHWC', 'HWIO', 'NHWC')

_S2D: Optional[bool] = None


def _s2d_enabled() -> bool:
    """Space-to-depth lane packing for few-channel stride-2 convs, on by
    default on TPU (env override EDGEGAN_S2D=0/1). A 3-channel conv puts
    3 values on the MXU's 128-wide contraction lanes; packing 2x2 pixel
    blocks into channels quadruples lane occupancy for the same math."""
    global _S2D
    if _S2D is None:
        import os
        env = os.environ.get('EDGEGAN_S2D')
        if env is not None:
            _S2D = env not in ('0', 'false', '')
        else:
            _S2D = jax.default_backend() in ('tpu', 'axon')
    return _S2D


def conv2d_s2d(x, w):
    """Stride-2 SAME conv via space-to-depth repacking — exact math.

    x [B,H,W,C] (H, W even), w [k,k,C,O], k >= 2. Equivalent by
    construction to lax stride-2 SAME conv: pixels are packed 2x2 into
    4C channels and the kernel taps are scattered into a smaller
    stride-1 kernel over the packed layout (tap di lands at packed
    offset floor((di - pad_lo)/2), sub-position (di - pad_lo) mod 2).
    All ops are standard linear primitives, so autodiff — including the
    gradient penalty's second-order pass through the critics — works
    unchanged.
    """
    b, h, wd, c = x.shape
    k, _, _, o = w.shape
    pad_lo = (k - 2) // 2          # SAME for stride 2, even input
    rmin = -((pad_lo + 1) // 2)    # floor(-pad_lo / 2)
    rmax = (k - 1 - pad_lo) // 2
    R = rmax - rmin + 1
    w2 = jnp.zeros((R, R, 2, 2, c, o), w.dtype)
    for di in range(k):
        t = di - pad_lo
        r, u = t // 2 - rmin, t % 2
        for dj in range(k):
            t2 = dj - pad_lo
            s, v = t2 // 2 - rmin, t2 % 2
            w2 = w2.at[r, s, u, v].set(w[di, dj])
    w2 = w2.reshape(R, R, 4 * c, o)
    xp = x.reshape(b, h // 2, 2, wd // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * c)
    return lax.conv_general_dilated(
        xp, w2.astype(x.dtype), (1, 1),
        [(-rmin, rmax), (-rmin, rmax)], dimension_numbers=_DIMS)


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
    if (stride == 2 and padding == 'SAME' and w.shape[2] <= 4
            and w.shape[0] >= 3 and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0 and _s2d_enabled()):
        # few-input-channel stride-2 conv (the critics' and encoder's
        # first layers): repack for MXU lane occupancy
        return conv2d_s2d(x, w)
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

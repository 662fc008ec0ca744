"""Generator (reference /root/reference/edgegan/models/generator.py).

DCGAN-style decoder: z -> linear projection -> reshape to (h/16, w/16,
8*input_dim) -> 4 stride-2 5x5 transposed-conv blocks -> tanh. The
optional resnet variant mirrors generator.py:76-120.

Parity quirk: the first normalization is invoked as
`nn.norm(h0, self._norm)` in the reference (generator.py:51-52), which
binds the norm name to the `is_train` argument and leaves the norm kind
at its default 'batch' — so the projection output ALWAYS goes through
train-mode batch norm (with learnable gamma/beta), regardless of the
--G_norm flag. Reproduced here via `first_norm='batch'`.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops import activations
from ..ops.pool import upsample_nearest
from .layers import (DeconvBlock, Deresidual2, Linear, _norm_apply)


def _size_chain(h: int, w: int, steps: int = 4):
    sizes = [(h, w)]
    for _ in range(steps):
        h = int(math.ceil(h / 2))
        w = int(math.ceil(w / 2))
        sizes.append((h, w))
    return sizes  # [(h,w), (h/2,w/2), ..., (h/16,w/16)]


class Generator(nn.Module):
    output_height: int = 64
    output_width: int = 64
    input_dim: int = 64
    output_dim: int = 3
    norm: Optional[str] = 'instance'
    activation: str = 'relu'
    use_resnet: bool = False
    first_norm: Optional[str] = 'batch'  # parity quirk, see module docstring

    @nn.compact
    def __call__(self, z):
        if self.use_resnet:
            return self._resnet(z)
        return self._convnet(z)

    def _convnet(self, z):
        sizes = _size_chain(self.output_height, self.output_width)
        (s_h, s_w), (s_h2, s_w2), (s_h4, s_w4), (s_h8, s_w8), (s_h16, s_w16) \
            = sizes
        d = self.input_dim
        x = Linear(d * 8 * s_h16 * s_w16, name='g_lin_0')(z)
        x = x.reshape(-1, s_h16, s_w16, d * 8)
        x = _norm_apply(self, x, self.first_norm, 'g_norm_0')
        x = activations.activation_fn(x, self.activation)
        x = DeconvBlock(d * 4, (s_h8, s_w8), 5, 2, self.norm,
                        self.activation, name='g_dconv_1')(x)
        x = DeconvBlock(d * 2, (s_h4, s_w4), 5, 2, self.norm,
                        self.activation, name='g_dconv_2')(x)
        x = DeconvBlock(d, (s_h2, s_w2), 5, 2, self.norm,
                        self.activation, name='g_dconv_3')(x)
        x = DeconvBlock(self.output_dim, (s_h, s_w), 5, 2, None, None,
                        name='g_dconv_4')(x)
        return jnp.tanh(x)

    def _resnet(self, z):
        sizes = _size_chain(self.output_height, self.output_width)
        (s_h, s_w), (s_h2, s_w2), (s_h4, s_w4), (s_h8, s_w8), (s_h16, s_w16) \
            = sizes
        d = self.input_dim
        x = Linear(d * 8 * s_h16 * s_w16, name='g_lin_resnet_0')(z)
        x = _norm_apply(self, x, self.first_norm, 'g_norm_0')
        x = activations.activation_fn(x, self.activation)
        x = x.reshape(-1, s_h16, s_w16, d * 8)
        for i, feats in enumerate([d * 4, d * 2, d, self.output_dim], 1):
            last = (i == 4)
            hw = (x.shape[1], x.shape[2])  # stride-1 deresidual keeps size
            x = Deresidual2(feats, hw, 3, 1,
                            None if last else self.norm,
                            None if last else self.activation,
                            name=f'g_resnet_{i}')(x)
            x = upsample_nearest(x)
        return jnp.tanh(x)

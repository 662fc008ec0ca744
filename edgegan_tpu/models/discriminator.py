"""Discriminator (reference /root/reference/edgegan/models/discriminator.py).

Default convnet path (discriminator.py:58-81): 4 stride-2 4x4 conv
blocks (nf -> 8nf, lrelu, norm on blocks 1-3, bias-free) -> flatten ->
linear(1). Returns (sigmoid(D), D); all WGAN losses consume the logits,
the sigmoid exists only for summaries (quirk Q6).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops import activations
from ..ops.pool import tf_avg_pool
from .layers import ConvBlock, Linear, Residual2


class Discriminator(nn.Module):
    num_filters: int = 64
    norm: Optional[str] = 'instance'
    activation: str = 'lrelu'
    use_resnet: bool = False

    @nn.compact
    def __call__(self, x):
        if self.use_resnet:
            return self._resnet(x)
        return self._convnet(x)

    def _convnet(self, x):
        # allow_pallas=False: the critics sit on the WGAN-GP path, which
        # differentiates through them twice; the fused Pallas norm kernel
        # only defines a first-order VJP.
        nf = self.num_filters
        d = ConvBlock(nf, 4, 2, None, self.activation,
                      allow_pallas=False, name='d_conv_0')(x)
        d = ConvBlock(nf * 2, 4, 2, self.norm, self.activation,
                      allow_pallas=False, name='d_conv_1')(d)
        d = ConvBlock(nf * 4, 4, 2, self.norm, self.activation,
                      allow_pallas=False, name='d_conv_3')(d)
        d = ConvBlock(nf * 8, 4, 2, self.norm, self.activation,
                      allow_pallas=False, name='d_conv_4')(d)
        d = Linear(1, name='d_linear_5')(d.reshape(x.shape[0], -1))
        return 1.0 / (1.0 + jnp.exp(-d)), d

    def _resnet(self, x):
        nf = self.num_filters
        d = Residual2(nf, 3, 1, None, self.activation, name='d_resnet_0')(x)
        d = tf_avg_pool(d, 2, 2)
        d = Residual2(nf * 2, 3, 1, self.norm, self.activation,
                      name='d_resnet_1')(d)
        d = tf_avg_pool(d, 2, 2)
        d = Residual2(nf * 4, 3, 1, self.norm, self.activation,
                      name='d_resnet_3')(d)
        d = tf_avg_pool(d, 2, 2)
        d = Residual2(nf * 8, 3, 1, self.norm, self.activation,
                      name='d_resnet_4')(d)
        d = tf_avg_pool(d, 2, 2)
        d = activations.activation_fn(d, self.activation)
        d = tf_avg_pool(d, 8, 8)
        d = Linear(1, name='d_linear_resnet_5')(d.reshape(x.shape[0], -1))
        return 1.0 / (1.0 + jnp.exp(-d)), d

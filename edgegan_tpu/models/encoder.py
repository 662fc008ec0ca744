"""Encoder (reference /root/reference/edgegan/models/encoder.py).

Maps an edge image to the latent z with a VAE head (mu, log_sigma,
reparameterised sample). Default path is the resnet variant
(encoder.py:54-84; --if_resnet_e defaults True, train.py:49).

Parity quirk Q2 (SURVEY.md §8): the reference samples noise with
`tf.random_normal(shape=tf.shape(self._latent_dim))` where _latent_dim
is a Python int, so tf.shape of a scalar yields shape [] — a SINGLE
scalar epsilon broadcast over the entire batch and latent vector:
`z = mu + eps * exp(log_sigma)`, eps ~ N(0,1) scalar. Reproduced here;
the scalar is drawn from the 'noise' rng stream per call.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import activations
from ..ops.pool import tf_avg_pool
from .layers import ConvBlock, Mlp, Residual


class Encoder(nn.Module):
    latent_dim: int = 100
    image_size: int = 64
    norm: Optional[str] = 'instance'
    activation: str = 'relu'
    use_resnet: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_resnet:
            e = self._resnet_trunk(x)
        else:
            e = self._convnet_trunk(x)
        e = e.reshape(x.shape[0], -1)
        mu = Mlp(self.latent_dim, name='FC8_mu')(e)
        log_sigma = Mlp(self.latent_dim, name='FC8_sigma')(e)
        # Q2: a single scalar epsilon for the whole batch.
        eps = jax.random.normal(self.make_rng('noise'), (), jnp.float32)
        z = mu + eps.astype(mu.dtype) * jnp.exp(log_sigma)
        return z, mu, log_sigma

    def _resnet_trunk(self, x):
        num_filters = [128, 256, 512, 512]
        if self.image_size == 256:
            num_filters.append(512)
        e = ConvBlock(64, 4, 2, None, self.activation, use_bias=True,
                      name='e_resnet_64_0')(x)
        for i, n in enumerate(num_filters):
            e = Residual(n, self.norm, use_bias=True,
                         name=f'e_resnet_{n}_{i + 1}')(e)
            e = tf_avg_pool(e, 2, 2)
        e = activations.relu(e)
        e = tf_avg_pool(e, 8, 8)
        return e

    def _convnet_trunk(self, x):
        num_filters = [64, 128, 256, 512, 512, 512, 512]
        if self.image_size == 256:
            num_filters.append(512)
        e = x
        for i, n in enumerate(num_filters):
            e = ConvBlock(n, 4, 2, self.norm if i else None,
                          self.activation, name=f'e_convnet_{n}_{i}')(e)
        return e

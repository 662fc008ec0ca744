"""Inference path (reference models/edgegan.py:492-517 test graph).

encoder(sketch half) -> z -> [z ; one_hot(class)] -> G1, G2.

Parity quirk (add to SURVEY Q-list): the reference's test loop runs
`sess.run(edge_output)` and `sess.run(image_output)` as two SEPARATE
graph executions (models/edgegan.py:606-609), and the encoder's
reparameterisation noise is resampled per execution — so the edge and
image outputs of one test batch come from two DIFFERENT z samples.
`separate_z=True` reproduces this; False shares one z for both heads.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .core.config import Config
from .train.networks import Networks


def make_test_forward(nets: Networks, config: Config,
                      separate_z: bool = True, jit: bool = True):
    """`jit=False` returns the raw traceable function (for embedding in
    an outer jit/scan, e.g. the single-dispatch throughput bench)."""
    h = config.output_height
    half_w = int(config.output_width / 2)

    def forward(params, aux, inputs, classes, rng):
        input_left = inputs[:, :h, :half_w, :]

        def z_for(key):
            z, _, _ = nets.encode(params, aux, input_left, key)
            if config.multiclasses:
                onehot = jax.nn.one_hot(classes, config.num_classes,
                                        dtype=z.dtype)
                z = jnp.concatenate([z, onehot], axis=1)
            return z

        k1, k2 = jax.random.split(rng)
        z1 = z_for(k1)
        z2 = z_for(k2) if separate_z else z1
        edge_output = nets.edge_generator.apply(
            {'params': params['G1'], **aux['G1']}, z1)
        image_output = nets.image_generator.apply(
            {'params': params['G2'], **aux['G2']}, z2)
        return edge_output, image_output

    return jax.jit(forward) if jit else forward

"""Network bundle: builds every module from a Config and owns init/apply.

Mirrors reference build_networks (/root/reference/edgegan/models/
edgegan.py:132-177): two generators sharing the latent (each generating
one 64-wide half), a joint discriminator over the full 64x128 pair,
optional image/edge patch discriminators over bicubic-128 crops, an
AC-GAN classifier (multiclass only), and the edge encoder.

Parameter trees are keyed by the reference's variable-scope names
('G1', 'G2', 'D', 'D_patch2', 'D_patch3', 'D2', 'E') so the optimizer
grouping (models/edgegan.py:109-124) and the checkpoint converter map
1:1.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import Config
from ..models import Classifier, Discriminator, Encoder, Generator

PyTree = Any


class Networks:
    def __init__(self, config: Config, gf_dim: int = 64, df_dim: int = 64,
                 c_dim: int = 3):
        self.config = config
        self.z_dim = config.z_dim
        self.c_dim = c_dim
        half_w = int(config.output_width / 2)
        gen = dict(output_height=config.output_height, output_width=half_w,
                   input_dim=gf_dim, output_dim=c_dim, norm=config.G_norm,
                   use_resnet=config.if_resnet_g)
        self.edge_generator = Generator(**gen)
        self.image_generator = Generator(**gen)
        dis = dict(num_filters=df_dim, norm=config.D_norm,
                   use_resnet=config.if_resnet_d)
        self.joint_discriminator = Discriminator(**dis)
        self.image_discriminator = (Discriminator(**dis)
                                    if config.use_image_discriminator else None)
        self.edge_discriminator = (Discriminator(**dis)
                                   if config.use_edge_discriminator else None)
        self.classifier = (Classifier(num_classes=config.num_classes)
                           if config.multiclasses else None)
        self.encoder = Encoder(latent_dim=config.z_dim,
                               image_size=config.input_height,
                               norm=config.E_norm,
                               use_resnet=config.if_resnet_e)

    # ---------- init ----------

    def init(self, rng) -> Tuple[Dict[str, PyTree], Dict[str, PyTree]]:
        """Returns (params, aux) keyed by reference scope names.

        aux holds non-trainable collections ('spectral', 'batch_stats')
        per network.
        """
        cfg = self.config
        b = 2  # tiny batch for shape inference; params are batch-free
        h, w = cfg.output_height, cfg.output_width
        z_in_dim = self.gen_input_dim
        keys = jax.random.split(rng, 8)
        z = jnp.zeros((b, z_in_dim), jnp.float32)
        pair = jnp.zeros((b, h, w, self.c_dim), jnp.float32)
        half = jnp.zeros((b, h, w // 2, self.c_dim), jnp.float32)
        patch = jnp.zeros((b, cfg.image_dis_size, cfg.image_dis_size,
                           self.c_dim), jnp.float32)

        params, aux = {}, {}

        def add(name, module, *args, rngs_extra=None):
            rngs = {'params': keys[len(params)]}
            if rngs_extra:
                rngs.update(rngs_extra)
            variables = module.init(rngs, *args)
            params[name] = variables['params']
            aux[name] = {k: v for k, v in variables.items() if k != 'params'}

        add('G1', self.edge_generator, z)
        add('G2', self.image_generator, z)
        add('D', self.joint_discriminator, pair)
        if self.image_discriminator is not None:
            add('D_patch2', self.image_discriminator, patch)
        if self.edge_discriminator is not None:
            add('D_patch3', self.edge_discriminator, patch)
        if self.classifier is not None:
            add('D2', self.classifier, half)
        add('E', self.encoder, half,
            rngs_extra={'noise': jax.random.PRNGKey(0)})
        return params, aux

    # ---------- z plumbing ----------

    @property
    def gen_input_dim(self) -> int:
        if self.config.multiclasses:
            return self.z_dim + self.config.num_classes
        return self.z_dim

    def gen_input(self, z):
        """z [B, z_dim(+1)] -> generator input (models/edgegan.py:188-197).

        Multiclass: last column is the class id (float); replaced by its
        one-hot encoding -> [B, z_dim + num_classes].
        """
        if not self.config.multiclasses:
            return z
        onehot = jax.nn.one_hot(z[:, -1].astype(jnp.int32),
                                self.config.num_classes, dtype=z.dtype)
        return jnp.concatenate([z[:, :self.z_dim], onehot], axis=1)

    # ---------- apply helpers ----------

    @staticmethod
    def _vars(params, aux):
        v = {'params': params}
        v.update(aux or {})
        return v

    def generate(self, params, aux, z_in):
        """Both generators on the shared latent -> (edge, image) halves."""
        edge = self.edge_generator.apply(
            self._vars(params['G1'], aux['G1']), z_in)
        image = self.image_generator.apply(
            self._vars(params['G2'], aux['G2']), z_in)
        return edge, image

    def discriminate(self, name, params, aux, x):
        module = {'D': self.joint_discriminator,
                  'D_patch2': self.image_discriminator,
                  'D_patch3': self.edge_discriminator}[name]
        return module.apply(self._vars(params[name], aux[name]), x)

    def classify(self, params, aux, x):
        return self.classifier.apply(self._vars(params['D2'], aux['D2']), x)

    def encode(self, params, aux, x, noise_rng):
        return self.encoder.apply(self._vars(params['E'], aux['E']), x,
                                  rngs={'noise': noise_rng})

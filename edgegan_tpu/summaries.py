"""TensorBoard summaries (reference models/edgegan.py:344-411).

The reference writes per-step scalar summaries for all 8 losses,
histograms for z and every discriminator output, and image summaries
for the inputs, both generator outputs, and the bicubic-resized pairs —
via two EXTRA full graph executions per step (models/edgegan.py:427-433).

Here scalars come for free from the fused step's metrics dict; the
histogram/image summaries reuse one extra jitted forward, written every
`summary_frequency` steps (default 100 — the reference's every-step
image writing is reproducible with --summary_frequency 1).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax.metrics import tensorboard

from .ops.resize import resize
from .utils.images import inverse_transform

SCALARS = ['joint_dis_dloss', 'joint_dis_gloss',
           'image_dis_dloss', 'image_dis_gloss',
           'edge_dis_dloss', 'edge_dis_gloss',
           'loss_d_ac', 'edge_gloss', 'image_gloss', 'loss_g_ac', 'zl_loss']


class SummaryWriter:
    def __init__(self, logdir: str, nets, config):
        self.writer = tensorboard.SummaryWriter(logdir)
        self.nets = nets
        self.config = config
        self._sample = jax.jit(self._sample_fn)

    def _sample_fn(self, params, aux, z, images):
        """One forward producing the reference's full d_sum/g_sum content
        (models/edgegan.py:344-411): generator/resized image summaries,
        joint-D and both patch-D sigmoid histograms on real AND fake."""
        cfg = self.config
        half_w = int(cfg.output_width / 2)
        edge_real = images[:, :, :half_w, :]
        image_real = images[:, :, half_w:cfg.output_width, :]
        z_in = self.nets.gen_input(z)
        edge_out, image_out = self.nets.generate(params, aux, z_in)
        imgs = {'G1': edge_out, 'G2': image_out}
        hists = {}
        joint = jnp.concatenate([edge_out, image_out], axis=2)
        hists['d'], _ = self.nets.discriminate('D', params, aux, images)
        hists['d_'], _ = self.nets.discriminate('D', params, aux, joint)
        if cfg.use_image_discriminator:
            size = (cfg.image_dis_size,) * 2
            imgs['resized_inputs_image'] = resize(image_real, size)
            imgs['resized_G_image'] = resize(image_out, size)
            hists['imageD'], _ = self.nets.discriminate(
                'D_patch2', params, aux, imgs['resized_inputs_image'])
            hists['imageDfake'], _ = self.nets.discriminate(
                'D_patch2', params, aux, imgs['resized_G_image'])
        if cfg.use_edge_discriminator:
            size = (cfg.edge_dis_size,) * 2
            imgs['resized_inputs_p3_image'] = resize(edge_real, size)
            imgs['resized_G_p3_image'] = resize(edge_out, size)
            hists['edgeD'], _ = self.nets.discriminate(
                'D_patch3', params, aux, imgs['resized_inputs_p3_image'])
            hists['edgeDfake'], _ = self.nets.discriminate(
                'D_patch3', params, aux, imgs['resized_G_p3_image'])
        return imgs, hists

    def scalars(self, step: int, metrics: Dict[str, float]):
        for k in SCALARS:
            if k in metrics:
                self.writer.scalar(k, float(metrics[k]), step)

    def extras(self, step: int, state, images, z):
        """Histogram + image summaries (mirrors d_sum/g_sum content).

        Multi-process safe: this runs on process 0 only, so the global
        (non-fully-addressable) batch arrays and mesh-committed params
        must first be reduced to process-local values — a p0-only jit
        over multi-process arrays is invalid SPMD, and np.asarray on a
        non-fully-addressable jax.Array raises. The summaries then cover
        process 0's shard of the batch (plenty for TB images/histograms).
        """
        params, aux = state.params, state.aux
        if jax.process_count() > 1:
            local_leaf = (lambda x: x.addressable_data(0)
                          if isinstance(x, jax.Array)
                          and not x.is_fully_addressable else x)
            params = jax.tree.map(local_leaf, params)
            aux = jax.tree.map(local_leaf, aux)
            images = _local_batch(images)
            z = _local_batch(z)
        z = np.asarray(jax.device_get(z), np.float32)
        if z.shape[-1] < self.config.z_dim:
            # device-z mode (Config.host_z=False): the batch carries only
            # the class column; the step drew its latents on device from
            # the step rng. Draw an equivalent N(0,1) latent here (step-
            # seeded, so TB samples are reproducible) for the sample
            # forward and the z histogram.
            noise = np.random.default_rng(step).standard_normal(
                (z.shape[0], self.config.z_dim)).astype(np.float32)
            z = np.concatenate([noise, z], axis=1)
        imgs, hists = self._sample(
            params, aux, jnp.asarray(z), jnp.asarray(images))
        self.writer.histogram('z', np.asarray(z), step)
        for name, arr in hists.items():
            self.writer.histogram(name, np.asarray(arr), step)
        self.writer.image('inputs', _grid(np.asarray(images)), step)
        for name, arr in imgs.items():
            self.writer.image(name, _grid(np.asarray(arr)), step)
        self.writer.flush()

    def close(self):
        self.writer.close()


def _local_batch(x) -> np.ndarray:
    """This process's rows of a (possibly batch-sharded, multi-process)
    global array, as host numpy. Replicated arrays collapse to one shard;
    batch-sharded ones concatenate the local shards in batch order."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    shards = {s.index: np.asarray(s.data) for s in x.addressable_shards}
    if len(shards) == 1:
        return next(iter(shards.values()))
    items = sorted(shards.items(), key=lambda kv: kv[0][0].start or 0)
    return np.concatenate([v for _, v in items], axis=0)


def _grid(batch: np.ndarray, max_images: int = 8) -> np.ndarray:
    """[-1,1] NHWC batch -> one [0,1] image row for TB."""
    batch = np.asarray(batch[:max_images], np.float32)
    row = np.concatenate(list(batch), axis=1)
    return np.clip(inverse_transform(row), 0.0, 1.0)

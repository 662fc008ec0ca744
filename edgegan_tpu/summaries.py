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

SCALARS = ['joint_dis_dloss', 'image_dis_dloss', 'edge_dis_dloss',
           'loss_d_ac', 'edge_gloss', 'image_gloss', 'loss_g_ac', 'zl_loss']


class SummaryWriter:
    def __init__(self, logdir: str, nets, config):
        self.writer = tensorboard.SummaryWriter(logdir)
        self.nets = nets
        self.config = config
        self._sample = jax.jit(self._sample_fn)

    def _sample_fn(self, params, aux, z, images):
        z_in = self.nets.gen_input(z)
        edge_out, image_out = self.nets.generate(params, aux, z_in)
        outs = {'G1': edge_out, 'G2': image_out}
        if self.config.use_image_discriminator:
            outs['resized_G_image'] = resize(
                image_out, (self.config.image_dis_size,) * 2)
        if self.config.use_edge_discriminator:
            outs['resized_G_p3_image'] = resize(
                edge_out, (self.config.edge_dis_size,) * 2)
        joint = jnp.concatenate([edge_out, image_out], axis=2)
        sig_real, _ = self.nets.discriminate('D', params, aux, images)
        sig_fake, _ = self.nets.discriminate('D', params, aux, joint)
        return outs, sig_real, sig_fake

    def scalars(self, step: int, metrics: Dict[str, float]):
        for k in SCALARS:
            if k in metrics:
                self.writer.scalar(k, float(metrics[k]), step)

    def extras(self, step: int, state, images, z):
        """Histogram + image summaries (mirrors d_sum/g_sum content)."""
        outs, sig_real, sig_fake = self._sample(
            state.params, state.aux, jnp.asarray(z), jnp.asarray(images))
        self.writer.histogram('z', np.asarray(z), step)
        self.writer.histogram('d', np.asarray(sig_real), step)
        self.writer.histogram('d_', np.asarray(sig_fake), step)
        self.writer.image('inputs', _grid(np.asarray(images)), step)
        for name, arr in outs.items():
            self.writer.image(name, _grid(np.asarray(arr)), step)
        self.writer.flush()

    def close(self):
        self.writer.close()


def _grid(batch: np.ndarray, max_images: int = 8) -> np.ndarray:
    """[-1,1] NHWC batch -> one [0,1] image row for TB."""
    batch = np.asarray(batch[:max_images], np.float32)
    row = np.concatenate(list(batch), axis=1)
    return np.clip(inverse_transform(row), 0.0, 1.0)

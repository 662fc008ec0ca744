"""AC-GAN classifier (reference /root/reference/edgegan/models/classifier.py).

Builds a 6-level mean-pool pyramid over the input image, a 7x7
spectral-normed conv stem (8 channels, prelu), then 4 cascaded MRU units
at filter depths 128/256/512/768 — each consuming the matching pyramid
level and the previous hidden state, stride 2 (classifier.py:27-101).
Heads: a 1x1-conv patch-discriminator output (built but unused by the
losses) and a spatial-mean -> spectral-normed FC class head
(classifier.py:107-115).

The reference is NCHW-only (classifier.py:13); this rebuild is NHWC —
the TPU-native layout — with identical math.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pool import mean_pool
from .layers import MRUBlock, PReLU, SNConv2D, SNDense, normal_002


class Classifier(nn.Module):
    num_classes: int
    size: int = 64
    sn: bool = True

    @nn.compact
    def __call__(self, x, update_sn: bool = False, *,
                 return_features: bool = False):
        # 6-level pyramid; x_list[-1] is the full-res input
        # (classifier.py:27-35, list reversed).
        x_list = [x]
        cur = x
        for _ in range(5):
            cur = mean_pool(cur)
            x_list.append(cur)
        x_list = x_list[::-1]

        h0 = SNConv2D(8, 7, 1, sn=self.sn, kernel_init=normal_002,
                      activation='prelu', name='h0')(x_list[-1], update_sn)
        ht = h0
        depths = [self.size * 2, self.size * 4, self.size * 8, self.size * 12]
        for unit, depth in enumerate(depths, start=1):
            ht = MRUBlock(depth, stride=2, sn=self.sn,
                          kernel_init=normal_002,
                          name=f'mru_conv_unit_{unit}')(
                              x_list[-unit], ht, update_sn)
        # last_unit norm_activ = prelu (classifier.py:95-101, conv.py:353-355)
        ht = PReLU(name='mru_conv_unit_last_prelu')(ht)

        disc = SNConv2D(1, 1, 1, sn=self.sn, kernel_init=normal_002,
                        activation=None, name='disc_head')(ht, update_sn)
        feat = jnp.mean(ht, axis=(1, 2))
        logits = SNDense(self.num_classes, sn=self.sn,
                         name='class_head')(feat, update_sn)
        if return_features:
            # the 768-d penultimate features (input to the class head) —
            # the in-environment FID extractor (evaluation.py)
            return disc, 1.0 / (1.0 + jnp.exp(-logits)), logits, feat
        return disc, 1.0 / (1.0 + jnp.exp(-logits)), logits

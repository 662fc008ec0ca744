"""Functional op library for the TPU-native EdgeGAN rebuild.

Mirrors the semantics of /root/reference/edgegan/nn/ as pure JAX
functions (NHWC layout). Flax modules in edgegan_tpu.models compose
these with explicit parameters.
"""
from .activations import activation_fn, lrelu, miu_relu, prelu, relu
from .conv import conv2d, deconv2d
from .norms import batch_norm, instance_norm, spectral_normalize
from .pool import mean_pool, tf_avg_pool, upsample_nearest
from .resize import resize

__all__ = [
    'activation_fn', 'lrelu', 'miu_relu', 'prelu', 'relu',
    'conv2d', 'deconv2d',
    'batch_norm', 'instance_norm', 'spectral_normalize',
    'mean_pool', 'tf_avg_pool', 'upsample_nearest',
    'resize',
]

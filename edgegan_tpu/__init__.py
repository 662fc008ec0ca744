"""edgegan_tpu: a TPU-native (JAX/Flax/pjit) rebuild of EdgeGAN.

Reference: sysu-imsl/EdgeGAN (SketchyCOCO, CVPR 2020), a TF1.14
single-GPU sketch->image GAN. This package re-designs it TPU-first:
NHWC layout, one fused jitted train step (vs the reference's ~14 graph
executions per step), data parallelism via jax.sharding over an ICI
mesh, and an async double-buffered host input pipeline.
"""
__version__ = '0.1.0'

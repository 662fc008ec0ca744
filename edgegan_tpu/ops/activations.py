"""Activation functions.

Semantics mirror the reference nn library
(/root/reference/edgegan/nn/modules/activation.py:4-32), rebuilt as pure
JAX functions. All of these are cheap VPU element-wise ops that XLA fuses
into the preceding conv/matmul epilogue on TPU.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def relu(x):
    return jnp.maximum(x, 0.0)


def lrelu(x, leak: float = 0.2):
    """Leaky ReLU, `max(x, leak*x)` (reference activation.py:9,30-32)."""
    return jnp.maximum(x, leak * x)


def miu_relu(x, miu: float = 0.7):
    """(x + sqrt((1-miu)^2 + x^2)) / 2 (reference activation.py:18-20)."""
    return (x + jnp.sqrt((1.0 - miu) ** 2 + x * x)) / 2.0


def prelu(x, leak):
    """PReLU with a learnable scalar leak, `max(leak*x, x)`.

    (reference activation.py:23-27; `leak` is a scalar parameter init 0.2.)
    """
    return jnp.maximum(leak * x, x)


def activation_fn(x, name: Optional[str]):
    """Dispatch by name (reference activation.py:4-15)."""
    if name is None:
        return x
    if name == 'relu':
        return relu(x)
    if name == 'lrelu':
        return lrelu(x)
    if name == 'tanh':
        return jnp.tanh(x)
    if name == 'sigmoid':
        return jnp.asarray(1.0 / (1.0 + jnp.exp(-x)))
    raise ValueError(f'unknown activation: {name!r}')

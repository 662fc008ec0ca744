"""Normalization primitives.

Reference semantics (/root/reference/edgegan/nn/modules/normalization.py):

- instance_norm: `(x - mean) / (sqrt(var) + eps)` with eps *outside* the
  sqrt and NO learnable scale/shift (normalization.py:14-17). Stats over
  the spatial axes.
- batch_norm: always uses batch statistics (the reference hard-codes
  `is_training=True`, normalization.py:19-25), learnable gamma/beta,
  eps=1e-5 *inside* the sqrt. Moving averages are tracked (decay 0.9) but
  never consumed.
- spectral norm: one power-iteration step from a persistent `u` vector
  (normalization.py:38-76). The reference never runs the u-update ops
  (they go to a collection that the train loop never fetches), so the
  default here is `update=False` which keeps `u` frozen at init.

All stats are computed in float32 regardless of input dtype so that bf16
compute stays numerically stable on TPU.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def nan_guards_enabled() -> bool:
    """EDGEGAN_NAN_GUARDS=0 disables the rebuild's zero-variance /
    zero-gradient `where` guards (SURVEY Q16) everywhere, making the
    numerics reference-exact INCLUDING the reference's latent NaN
    hazards. Read at trace time. Exists for the stability ablation
    (scripts/stability_ablation.py): if divergence onset moved with the
    guards, they would not be the value-identical safeguards they claim
    to be."""
    return os.environ.get('EDGEGAN_NAN_GUARDS', '1') != '0'


def instance_norm(x, eps: float = 1e-5):
    """Instance norm over spatial axes, NHWC. No learnable params.

    Matches reference normalization.py:14-17: population variance over
    axes (1, 2), eps added OUTSIDE the sqrt.

    Degenerate-case guard: at var == 0 (spatially constant channel,
    e.g. a saturated generator) the reference's sqrt backward is
    inf*0 = NaN and poisons training. The where-guard returns the same
    forward value (0/eps = 0) and a zero gradient instead; numerics in
    every non-degenerate case are bit-identical.

    f32 inputs take the exact reference path. bf16 inputs keep the
    STATISTICS in f32 (accumulated reductions; tiny tensors) but do the
    per-element normalize in bf16 — otherwise the f32 elementwise chain
    drags the whole backward (and the WGAN-GP double backward through
    the critics) into f32, doubling HBM traffic on the largest
    activations. Plain ops only, so any-order autodiff works.
    """
    guard = nan_guards_enabled()
    if x.dtype == jnp.float32:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        if guard:
            nondegenerate = var > 0
            safe_var = jnp.where(nondegenerate, var, 1.0)
            denom = jnp.where(nondegenerate, jnp.sqrt(safe_var) + eps, eps)
        else:  # reference-exact (normalization.py:14-17)
            denom = jnp.sqrt(var) + eps
        return (x - mean) / denom
    mean32 = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    diff = x - mean32.astype(x.dtype)
    var = jnp.mean(jnp.square(diff), axis=(1, 2), keepdims=True,
                   dtype=jnp.float32)
    if guard:
        nondegenerate = var > 0
        safe_var = jnp.where(nondegenerate, var, 1.0)
        denom = jnp.where(nondegenerate, jnp.sqrt(safe_var) + eps, eps)
    else:
        denom = jnp.sqrt(var) + eps
    return diff * (1.0 / denom).astype(x.dtype)


def batch_norm(x, gamma, beta, eps: float = 1e-5):
    """Batch norm with batch statistics (train-mode), NHWC.

    Matches tf.contrib.layers.batch_norm(..., is_training=True,
    epsilon=1e-5, center=True, scale=True) as invoked from reference
    normalization.py:19-25. Stats over all axes but the channel axis.
    """
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(x.dtype), mean.reshape(-1), var.reshape(-1)


def _l2normalize(v, eps: float = 1e-12):
    # reference normalization.py:35-36: v / (sum(v^2)^0.5 + eps)
    return v / (jnp.sum(v * v) ** 0.5 + eps)


def spectral_normalize(w, u, num_iters: int = 1):
    """One (or more) power-iteration steps; returns (w_bar, u_new).

    `w` has any shape; it is reshaped to [-1, out_dim] like the reference
    (normalization.py:39-40). `u` has shape [1, out_dim].
    The caller decides whether to persist `u_new` (the reference never
    does -- quirk Q3 in SURVEY.md §8).
    """
    w_shape = w.shape
    w_mat = w.reshape(-1, w_shape[-1]).astype(jnp.float32)
    u_i = u.astype(jnp.float32)
    v_i = jnp.zeros((1, w_mat.shape[0]), jnp.float32)
    for _ in range(num_iters):
        v_i = _l2normalize(u_i @ w_mat.T)
        u_i = _l2normalize(v_i @ w_mat)
    sigma = (v_i @ w_mat @ u_i.T)[0, 0]
    w_bar = (w_mat / sigma).reshape(w_shape).astype(w.dtype)
    return w_bar, u_i.astype(u.dtype)

"""Pallas TPU kernels.

Fused instance-norm(+activation) — the bandwidth-bound elementwise
chain between convolutions. The reference computes it as separate
moment/normalize ops (normalization.py:14-17); here one VMEM-resident
kernel per (batch, ) row computes the spatial moments, normalizes, and
applies the activation in a single HBM round-trip, with a matching
fused backward kernel (custom VJP).

Math (must match ops.norms.instance_norm, quirk Q1 — eps OUTSIDE sqrt):
  y = act((x - mean) / (sqrt(var) + eps))
Backward (derived for d = sqrt(v) + eps, N = H*W, per channel):
  dx = (g' - mean(g')) / d - y_pre * mean(g' * y_pre) / sqrt(v)
where g' is the cotangent after the activation backward and
y_pre = (x - mean)/d the pre-activation output.

Falls back to plain jnp on non-TPU backends (pallas interpret mode is
used in tests).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5

_ENABLED: Optional[bool] = None


def should_use() -> bool:
    """Use the Pallas kernels iff running on TPU (env override:
    EDGEGAN_PALLAS=0/1). Numerics are identical to the jnp path
    (tested), so this is purely a scheduling choice."""
    global _ENABLED
    if _ENABLED is None:
        import os
        env = os.environ.get('EDGEGAN_PALLAS')
        if env is not None:
            _ENABLED = env not in ('0', 'false', '')
        else:
            backend = jax.default_backend()
            _ENABLED = backend in ('tpu', 'axon')
    return _ENABLED


def _act_fwd(y, activation):
    if activation is None:
        return y
    if activation == 'relu':
        return jnp.maximum(y, 0.0)
    if activation == 'lrelu':
        return jnp.maximum(y, 0.2 * y)
    raise ValueError(activation)


def _act_bwd(g, y_pre, activation):
    """d act(y)/dy evaluated at y_pre, times g."""
    if activation is None:
        return g
    if activation == 'relu':
        return jnp.where(y_pre > 0, g, 0.0)
    if activation == 'lrelu':
        return jnp.where(y_pre > 0, g, 0.2 * g)
    raise ValueError(activation)


def _fwd_kernel(x_ref, out_ref, activation: Optional[str]):
    x = x_ref[0].astype(jnp.float32)          # [H*W, C]
    n = x.shape[0]
    mean = jnp.sum(x, axis=0, keepdims=True) / n
    xc = x - mean
    var = jnp.sum(xc * xc, axis=0, keepdims=True) / n
    denom = jnp.where(var > 0, jnp.sqrt(jnp.where(var > 0, var, 1.0)) + EPS,
                      EPS)
    y = xc / denom
    out_ref[0] = _act_fwd(y, activation).astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dx_ref, activation: Optional[str]):
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    n = x.shape[0]
    mean = jnp.sum(x, axis=0, keepdims=True) / n
    xc = x - mean
    var = jnp.sum(xc * xc, axis=0, keepdims=True) / n
    nondeg = var > 0
    s = jnp.sqrt(jnp.where(nondeg, var, 1.0))
    d = jnp.where(nondeg, s + EPS, EPS)
    y_pre = xc / d
    gp = _act_bwd(g, y_pre, activation)
    gp_mean = jnp.sum(gp, axis=0, keepdims=True) / n
    gy_mean = jnp.sum(gp * y_pre, axis=0, keepdims=True) / n
    # degenerate channels (var == 0): y_pre == 0 so the var term drops
    # and this reduces to (gp - gp_mean)/EPS — identical to the
    # where-guarded jnp path's gradient
    dx = (gp - gp_mean) / d - y_pre * gy_mean / s
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _call(kernel, n_in, x_flat, *rest, interpret):
    b, hw, c = x_flat.shape
    spec = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec] * n_in,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x_flat.shape, x_flat.dtype),
        interpret=interpret,
    )(x_flat, *rest)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_act(x, activation: Optional[str] = None,
                      interpret: bool = False):
    """Fused instance norm + activation over NHWC, Pallas kernel."""
    b, h, w, c = x.shape
    x_flat = x.reshape(b, h * w, c)
    kernel = functools.partial(_fwd_kernel, activation=activation)
    out = _call(kernel, 1, x_flat, interpret=interpret)
    return out.reshape(b, h, w, c)


def _in_fwd(x, activation, interpret):
    return instance_norm_act(x, activation, interpret), x


def _in_bwd(activation, interpret, x, g):
    b, h, w, c = x.shape
    kernel = functools.partial(_bwd_kernel, activation=activation)
    dx = _call(kernel, 2, x.reshape(b, h * w, c),
               g.reshape(b, h * w, c), interpret=interpret)
    return (dx.reshape(b, h, w, c),)


instance_norm_act.defvjp(_in_fwd, _in_bwd)

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
    (tested), so this is purely a scheduling choice.

    EDGEGAN_NAN_GUARDS=0 (the reference-exact stability-ablation mode,
    ops/norms.py) also disables them: the kernels implement the
    GUARDED semantics, so the unguarded mode must take the plain XLA
    path everywhere."""
    global _ENABLED
    if _ENABLED is None:
        import os
        from .norms import nan_guards_enabled
        env = os.environ.get('EDGEGAN_PALLAS')
        if not nan_guards_enabled():
            _ENABLED = False
        elif env is not None:
            _ENABLED = env not in ('0', 'false', '')
        else:
            backend = jax.default_backend()
            _ENABLED = backend in ('tpu', 'axon')
    return _ENABLED


def _flag(name: str, default: bool) -> bool:
    import os
    env = os.environ.get(name)
    if env is None:
        return default
    return env not in ('0', 'false', '')


@functools.lru_cache(None)
def prelu_enabled() -> bool:
    """Fused prelu backward (EDGEGAN_PALLAS_PRELU=0/1). A custom_vjp is
    a fusion barrier — whether the saved reduction pass beats the lost
    fusion is an empirical question; default set by the BASELINE.md
    round-3 ablation."""
    return should_use() and _flag('EDGEGAN_PALLAS_PRELU', False)


@functools.lru_cache(None)
def gate_enabled() -> bool:
    """Fused MRU gate chain (EDGEGAN_PALLAS_GATE=0/1) — same
    fusion-barrier trade-off as prelu_enabled(); default set by the
    BASELINE.md round-3 ablation."""
    return should_use() and _flag('EDGEGAN_PALLAS_GATE', False)


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


# ---------------------------------------------------------------------------
# Fused PReLU backward (classifier path).
#
# The reference's prelu (activation.py:23-27) has a SCALAR learnable
# leak; its gradient is a full-tensor reduction. XLA schedules that as
# a separate scalar-output fusion re-reading the activation and
# cotangent (~13 prelus x 3 classifier invocations = the dominant part
# of the 12 ms/step of scalar fusions profiled in BASELINE.md). This
# custom VJP computes dx AND the dleak partial sums in ONE pass over
# (x, g) — halving the backward HBM traffic for every prelu.
#
# FIRST-ORDER ONLY (custom_vjp): legal precisely because prelu appears
# only in the classifier (reference uses it nowhere else) and the
# gradient penalty double-differentiates only the three critics
# (models/edgegan.py:38-42) — never the classifier.
# ---------------------------------------------------------------------------


def _prelu_bwd_kernel(x_ref, g_ref, leak_ref, dx_ref, da_ref):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    leak = leak_ref[0]
    u = leak * x
    # jnp.maximum vjp convention: ties split 0.5/0.5
    s_u = jnp.where(u > x, 1.0, jnp.where(u == x, 0.5, 0.0))
    s_v = 1.0 - s_u
    dx_ref[...] = (g * (s_u * leak + s_v)).astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        da_ref[0, 0] = 0.0
    da_ref[0, 0] += jnp.sum(g * s_u * x)


def _row_chunk(m: int, cap: int = 2048) -> int:
    """Largest power-of-two divisor of m, capped."""
    r = 1
    while m % 2 == 0 and r < cap:
        m //= 2
        r *= 2
    return r


def prelu_eligible(shape, dtype) -> bool:
    """The fused backward streams the tensor as (rows, 128) lane-packed
    blocks — element count must factor into full 128-lane rows with a
    sublane-aligned chunk (otherwise Mosaic pads lanes up to 16x, the
    VMEM blowup that OOMed the 64x128 config's 8-channel stem)."""
    n = 1
    for d in shape:
        n *= int(d)
    return n % 128 == 0 and _row_chunk(n // 128) >= 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def prelu(x, leak, interpret: bool = False):
    """max(leak*x, x) with a Pallas one-pass fused backward.

    Forward is plain jnp (XLA fuses it into the producing conv);
    backward is the fused kernel. `leak` is the f32 scalar parameter.
    Caller must check prelu_eligible(x.shape, x.dtype) first.
    """
    return jnp.maximum(leak.astype(x.dtype) * x, x)


def _prelu_fwd(x, leak, interpret):
    return prelu(x, leak, interpret), (x, leak)


def _prelu_bwd(interpret, res, g):
    x, leak = res
    shape = x.shape
    n = x.size
    # lane-packed layout: prelu is elementwise and the leak grad is a
    # global sum, so channel structure is irrelevant — stream (R, 128)
    # blocks at full lane occupancy regardless of the channel count
    m = n // 128
    rows = _row_chunk(m)
    x2 = x.reshape(m, 128)
    g2 = g.reshape(m, 128)
    spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    da_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pl.ANY if interpret else pltpu.SMEM)
    leak_arr = jnp.asarray(leak, jnp.float32).reshape(1)
    dx, da = pl.pallas_call(
        _prelu_bwd_kernel,
        grid=(m // rows,),
        in_specs=[spec, spec,
                  pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.SMEM)],
        out_specs=(spec, da_spec),
        out_shape=(jax.ShapeDtypeStruct((m, 128), x.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        interpret=interpret,
    )(x2, g2, leak_arr)
    return dx.reshape(shape), da[0, 0].astype(jnp.asarray(leak).dtype)


prelu.defvjp(_prelu_fwd, _prelu_bwd)


# ---------------------------------------------------------------------------
# Fused MRU gate chain (classifier path).
#
# mru_conv_block_v3's update gate (reference conv.py:190-210) min-max
# normalizes the gate over space per (batch, channel) and blends the
# input conv into the hidden state:
#     rgn = (rg - min) / (max - min);  out = ht + rgn * img
# XLA schedules the min/max reductions, the equality-mask argmin/argmax
# gradients, and the blend as separate reduction-heavy fusions — part of
# the 128-config's profiled scheduling slack (BASELINE.md). This custom
# VJP runs the whole chain (and its backward, including the tie-split
# min/max gradients) as one VMEM-resident kernel per batch row.
#
# FIRST-ORDER ONLY (custom_vjp): legal because the MRU stack exists only
# in the classifier, which the gradient penalty never touches
# (models/edgegan.py:38-42 differentiates D/D_patch2/D_patch3 only).
# ---------------------------------------------------------------------------


def _gate_stats(rg):
    mn = jnp.min(rg, axis=0, keepdims=True)
    mx = jnp.max(rg, axis=0, keepdims=True)
    r = mx - mn
    pos = r > 0
    den = jnp.where(pos, r, 1.0)
    return mn, mx, r, pos, den


def _gate_fwd_kernel(rg_ref, ht_ref, img_ref, out_ref):
    rg = rg_ref[0].astype(jnp.float32)
    mn, mx, r, pos, den = _gate_stats(rg)
    rgn = (rg - mn) / den
    out = ht_ref[0].astype(jnp.float32) + rgn * img_ref[0].astype(
        jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _gate_bwd_kernel(rg_ref, img_ref, g_ref, drg_ref, dimg_ref):
    rg = rg_ref[0].astype(jnp.float32)
    img = img_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    mn, mx, r, pos, den = _gate_stats(rg)
    rgn = (rg - mn) / den
    dimg_ref[0] = (g * rgn).astype(dimg_ref.dtype)
    drgn = g * img
    # through the normalize: d/dmin and d/dmax totals per channel, then
    # distributed over ties exactly like jax's reduce_min/max VJP
    # (cotangent split evenly among tied extrema)
    r2 = jnp.where(pos, r * r, 1.0)
    dmn_tot = jnp.where(
        pos,
        jnp.sum(drgn * (rg - mx), axis=0, keepdims=True) / r2,
        -jnp.sum(drgn, axis=0, keepdims=True))
    dmx_tot = jnp.where(
        pos,
        -jnp.sum(drgn * rgn, axis=0, keepdims=True) / den,
        0.0)
    ismin = (rg == mn).astype(jnp.float32)
    ismax = (rg == mx).astype(jnp.float32)
    nmin = jnp.sum(ismin, axis=0, keepdims=True)
    nmax = jnp.sum(ismax, axis=0, keepdims=True)
    drg = (drgn / den + ismin * (dmn_tot / nmin)
           + ismax * (dmx_tot / nmax))
    drg_ref[0] = drg.astype(drg_ref.dtype)


def _gate_specs(shape, interpret):
    b, hw, c = shape
    return pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)


def gate_eligible(shape, dtype) -> bool:
    """Use the fused gate only where its per-batch-row (hw, c) blocks
    are lane-aligned and fit scoped VMEM. Channels off the 128-lane
    grid pad up to 16x (the VMEM OOM that killed the 64x128-config
    compile at the classifier's 8-channel first unit); the backward
    keeps 5 tensors x 2 pipeline buffers resident."""
    b, h, w, c = shape
    if c % 128 != 0:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    sub = 8 if itemsize >= 4 else 16
    hw_pad = -(-(h * w) // sub) * sub
    return 10 * hw_pad * c * itemsize <= 14 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mru_gate_blend(rg, ht, img, interpret: bool = False):
    """ht + minmax_normalize(rg) * img, fused (NHWC, Pallas)."""
    b, h, w, c = rg.shape
    shape = (b, h * w, c)
    spec = _gate_specs(shape, interpret)
    out = pl.pallas_call(
        _gate_fwd_kernel,
        grid=(b,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(shape, rg.dtype),
        interpret=interpret,
    )(rg.reshape(shape), ht.reshape(shape), img.reshape(shape))
    return out.reshape(rg.shape)


def _gate_fwd(rg, ht, img, interpret):
    return mru_gate_blend(rg, ht, img, interpret), (rg, img)


def _gate_bwd(interpret, res, g):
    rg, img = res
    b, h, w, c = rg.shape
    shape = (b, h * w, c)
    spec = _gate_specs(shape, interpret)
    drg, dimg = pl.pallas_call(
        _gate_bwd_kernel,
        grid=(b,),
        in_specs=[spec] * 3,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct(shape, rg.dtype),
                   jax.ShapeDtypeStruct(shape, img.dtype)),
        interpret=interpret,
    )(rg.reshape(shape), img.reshape(shape), g.reshape(shape))
    # dht == g exactly (out = ht + ...): no kernel needed
    return drg.reshape(rg.shape), g, dimg.reshape(img.shape)


mru_gate_blend.defvjp(_gate_fwd, _gate_bwd)

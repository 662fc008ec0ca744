"""Pallas fused instance-norm kernel vs the jnp reference, forward and
backward (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgegan_tpu.ops import instance_norm
from edgegan_tpu.ops.activations import activation_fn
from edgegan_tpu.ops.pallas_kernels import instance_norm_act


@pytest.mark.parametrize('activation', [None, 'relu', 'lrelu'])
def test_forward_matches_reference(activation):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16),
                    jnp.float32)
    got = instance_norm_act(x, activation, True)
    want = activation_fn(instance_norm(x), activation)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize('activation', [None, 'relu', 'lrelu'])
def test_backward_matches_autodiff(activation):
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 8),
                    jnp.float32)

    def ref_loss(x):
        return jnp.sum(jnp.sin(activation_fn(instance_norm(x), activation)))

    def pallas_loss(x):
        return jnp.sum(jnp.sin(instance_norm_act(x, activation, True)))

    g_ref = jax.grad(ref_loss)(x)
    g_pal = jax.grad(pallas_loss)(x)
    np.testing.assert_allclose(g_pal, g_ref, atol=1e-4, rtol=1e-4)


def test_kernel_eligibility_guards():
    """VMEM-safety guards: off-lane-grid channels and oversized blocks
    must fall back to jnp (regression: the 8-channel MRU unit's padded
    blocks OOMed scoped VMEM at the full config)."""
    from edgegan_tpu.ops.pallas_kernels import gate_eligible, prelu_eligible

    # gate: channel dim must sit on the 128-lane grid
    assert not gate_eligible((64, 128, 128, 8), jnp.float32)
    assert gate_eligible((64, 32, 32, 128), jnp.float32)
    # gate: f32 128-config unit-2 blocks (4096x128x4B x10) exceed VMEM
    assert not gate_eligible((64, 64, 64, 128), jnp.float32)
    assert gate_eligible((64, 64, 64, 128), jnp.bfloat16)
    # prelu: element count must pack into full 128-lane rows
    assert not prelu_eligible((3, 5, 5, 3), jnp.float32)
    assert prelu_eligible((64, 128, 128, 8), jnp.float32)


def _gate_ref(rg, ht, img):
    """The jnp MRU gate chain (models/layers.py fallback path)."""
    rg_min = jnp.min(rg, axis=(1, 2), keepdims=True)
    rg_max = jnp.max(rg, axis=(1, 2), keepdims=True)
    rg_range = rg_max - rg_min
    rgn = (rg - rg_min) / jnp.where(rg_range > 0, rg_range, 1.0)
    return ht + rgn * img


@pytest.mark.parametrize('degenerate', [False, True])
def test_mru_gate_blend_matches_autodiff(degenerate):
    """pallas_kernels.mru_gate_blend == jnp chain: forward and all three
    input grads, including the min/max tie-split convention and the
    spatially-constant (degenerate) gate branch."""
    from edgegan_tpu.ops.pallas_kernels import mru_gate_blend

    rng = np.random.RandomState(4)
    shape = (2, 4, 6, 8)
    rg = jnp.asarray(rng.randn(*shape), jnp.float32)
    if degenerate:
        rg = rg.at[0, :, :, 0].set(1.5)       # flat channel
        rg = rg.at[1, 0, 0, 1].set(rg[1, 1, 1, 1])  # a tie
    ht = jnp.asarray(rng.randn(*shape), jnp.float32)
    img = jnp.asarray(rng.randn(*shape), jnp.float32)

    got = mru_gate_blend(rg, ht, img, True)
    want = _gate_ref(rg, ht, img)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)

    def loss(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a)))

    g_pal = jax.grad(loss(lambda a, b, c: mru_gate_blend(a, b, c, True)),
                     argnums=(0, 1, 2))(rg, ht, img)
    g_ref = jax.grad(loss(_gate_ref), argnums=(0, 1, 2))(rg, ht, img)
    for gp, gr, name in zip(g_pal, g_ref, 'rg ht img'.split()):
        np.testing.assert_allclose(gp, gr, atol=1e-5, rtol=1e-5,
                                   err_msg=name)


@pytest.mark.parametrize('k', [3, 4, 5])
def test_space_to_depth_conv_exact(k):
    """ops.conv.conv2d_s2d == direct stride-2 SAME conv: forward,
    gradient, and SECOND-order gradient (the GP double-backward path
    runs through the critics' first convs)."""
    from jax import lax

    from edgegan_tpu.ops.conv import conv2d_s2d

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 12, 3), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, 3, 5) * 0.1, jnp.float32)

    def direct(x, w):
        return lax.conv_general_dilated(
            x, w, (2, 2), 'SAME', dimension_numbers=('NHWC', 'HWIO',
                                                     'NHWC'))

    np.testing.assert_allclose(conv2d_s2d(x, w), direct(x, w),
                               atol=1e-5, rtol=1e-5)

    def loss(f):
        def inner(x, w):
            return jnp.sum(jnp.tanh(f(x, w)))
        return inner

    gx_a, gw_a = jax.grad(loss(conv2d_s2d), argnums=(0, 1))(x, w)
    gx_b, gw_b = jax.grad(loss(direct), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx_a, gx_b, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(gw_a, gw_b, atol=1e-5, rtol=1e-5)

    # second order: grad of the gradient norm (the GP structure)
    def gnorm(f):
        def inner(x, w):
            g = jax.grad(lambda xx: jnp.sum(jnp.tanh(f(xx, w))))(x)
            return jnp.sum(g * g)
        return inner

    gg_a = jax.grad(gnorm(conv2d_s2d), argnums=1)(x, w)
    gg_b = jax.grad(gnorm(direct), argnums=1)(x, w)
    np.testing.assert_allclose(gg_a, gg_b, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize('ndim', [2, 4])
def test_prelu_fused_backward_matches_autodiff(ndim):
    """pallas_kernels.prelu: fused one-pass backward == jnp autodiff
    (dx elementwise AND the scalar dleak reduction), incl. x == 0 ties."""
    from edgegan_tpu.ops import activations
    from edgegan_tpu.ops.pallas_kernels import prelu as pallas_prelu

    rng = np.random.RandomState(2)
    shape = (2, 4, 4, 8) if ndim == 4 else (8, 16)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    x = x.at[(0,) * ndim].set(0.0)  # exercise the tie-split convention
    leak = jnp.float32(0.2)

    def ref_loss(x, leak):
        return jnp.sum(jnp.sin(activations.prelu(x, leak)))

    def pal_loss(x, leak):
        return jnp.sum(jnp.sin(pallas_prelu(x, leak, True)))

    # forward identical
    np.testing.assert_allclose(pallas_prelu(x, leak, True),
                               activations.prelu(x, leak), atol=0)
    gx_ref, ga_ref = jax.grad(ref_loss, argnums=(0, 1))(x, leak)
    gx_pal, ga_pal = jax.grad(pal_loss, argnums=(0, 1))(x, leak)
    np.testing.assert_allclose(gx_pal, gx_ref, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(ga_pal, ga_ref, atol=1e-5, rtol=1e-5)

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

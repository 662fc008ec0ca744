"""Loss-function unit tests vs golden values from the math definitions
(reference functional.py + models/edgegan.py:32-42)."""
import jax
import jax.numpy as jnp
import numpy as np

from edgegan_tpu import losses as L


def test_discriminator_ganloss():
    fake = jnp.array([[1.0], [3.0]])
    real = jnp.array([[2.0], [2.0]])
    np.testing.assert_allclose(L.discriminator_ganloss(fake, real), 0.0)


def test_generator_ganloss():
    fake = jnp.array([[1.0], [3.0]])
    np.testing.assert_allclose(L.generator_ganloss(fake), -2.0)


def test_l1loss():
    a = jnp.array([1.0, 2.0])
    b = jnp.array([0.0, 4.0])
    np.testing.assert_allclose(L.l1loss(a, b, 10.0), 15.0)


def test_acgan_focal_golden():
    logits_real = jnp.array([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    labels = jnp.array([0, 1])
    logits_fake = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    g, d = L.get_acgan_loss_focal(logits_real, labels, logits_fake, labels, 3)
    p = np.exp(2.0) / (np.exp(2.0) + 2.0)
    ce = -np.log(p)
    np.testing.assert_allclose(d, (1 - p) ** 2 * ce, rtol=1e-5)
    np.testing.assert_allclose(g, 0.5 * -np.log(1.0 / 3.0), rtol=1e-5)


def test_flatten():
    x = jnp.zeros((3, 4, 5, 2))
    assert L.flatten(x).shape == (3, 40)


def test_random_blend_range():
    key = jax.random.PRNGKey(0)
    a = jnp.ones((16, 2, 2, 1))
    b = -jnp.ones((16, 2, 2, 1))
    out = np.array(L.random_blend(a, b, key))
    assert out.min() >= -1.0 and out.max() <= 1.0
    # per-sample alpha: constant within each sample
    flat = out.reshape(16, -1)
    assert np.allclose(flat.std(axis=1), 0.0)
    assert flat[:, 0].std() > 0.01  # varies across samples


def test_gradient_penalty_linear_net():
    # D(x) = sum(w * x) with w such that ||grad|| is known analytically.
    # f = sigmoid(D) + D (quirk Q4); grad = (sigmoid'(D) + 1) * w.
    w = np.full((1, 2, 2, 1), 0.25, np.float32)

    def d_apply(x):
        logit = jnp.sum(x * w, axis=(1, 2, 3), keepdims=False)[:, None]
        return 1.0 / (1.0 + jnp.exp(-logit)), logit

    key = jax.random.PRNGKey(1)
    real = jnp.zeros((4, 2, 2, 1))
    fake = jnp.zeros((4, 2, 2, 1))
    gp = L.gradient_penalty(d_apply, fake, real, key, weight=10.0)
    # at x=0: D=0, sigmoid'(0)=0.25 -> grad = 1.25 * 0.25 each of 4 elems
    gnorm = np.sqrt(4 * (1.25 * 0.25) ** 2)
    np.testing.assert_allclose(gp, 10.0 * (gnorm - 1.0) ** 2, rtol=1e-5)


def test_gradient_penalty_tuple_quirk_differs_from_logits_only():
    # The tuple quirk must give a different penalty than logits-only GP.
    w = np.full((1, 2, 2, 1), 0.25, np.float32)

    def d_apply(x):
        logit = jnp.sum(x * w, axis=(1, 2, 3))[:, None]
        return 1.0 / (1.0 + jnp.exp(-logit)), logit

    key = jax.random.PRNGKey(1)
    x = jnp.zeros((4, 2, 2, 1))
    gp_tuple = L.gradient_penalty(d_apply, x, x, key, 1.0)
    gnorm_logits_only = np.sqrt(4 * 0.25 ** 2)
    gp_logits = (gnorm_logits_only - 1.0) ** 2
    assert not np.isclose(float(gp_tuple), gp_logits)

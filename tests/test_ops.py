"""Unit tests for edgegan_tpu.ops against golden values computed from the
mathematical definitions in the reference (SURVEY.md §4 strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edgegan_tpu import ops
from edgegan_tpu.ops.resize import _resize_matrix


class TestActivations:
    def test_lrelu(self):
        x = jnp.array([-1.0, 0.0, 2.0])
        np.testing.assert_allclose(ops.lrelu(x), [-0.2, 0.0, 2.0])

    def test_prelu(self):
        x = jnp.array([-2.0, 3.0])
        np.testing.assert_allclose(ops.prelu(x, 0.5), [-1.0, 3.0])

    def test_miu_relu(self):
        x = np.array([-1.0, 0.5])
        expected = (x + np.sqrt((1 - 0.7) ** 2 + x ** 2)) / 2.0
        np.testing.assert_allclose(ops.miu_relu(jnp.array(x)), expected,
                                   rtol=1e-6)

    def test_dispatch(self):
        x = jnp.array([-1.0, 1.0])
        np.testing.assert_allclose(ops.activation_fn(x, None), x)
        np.testing.assert_allclose(ops.activation_fn(x, 'relu'), [0.0, 1.0])
        np.testing.assert_allclose(ops.activation_fn(x, 'tanh'), np.tanh(x),
                                   rtol=1e-5)
        np.testing.assert_allclose(ops.activation_fn(x, 'sigmoid'),
                                   1 / (1 + np.exp(-np.array(x))), rtol=1e-6)


class TestInstanceNorm:
    def test_matches_reference_formula(self):
        # (x - mean) / (sqrt(var) + eps), eps OUTSIDE sqrt, no gamma/beta
        # (reference normalization.py:14-17, quirk Q1).
        rng = np.random.RandomState(0)
        x = rng.randn(2, 4, 6, 3).astype(np.float32)
        out = ops.instance_norm(jnp.array(x))
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        expected = (x - mean) / (np.sqrt(var) + 1e-5)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_not_unit_variance(self):
        # eps outside sqrt means output std is slightly below 1.
        x = jnp.array(np.random.RandomState(1).randn(1, 8, 8, 2) * 1e-4,
                      dtype=jnp.float32)
        out = np.array(ops.instance_norm(x))
        assert out.std() < 1.0  # heavily shrunk for tiny-variance input


class TestBatchNorm:
    def test_train_mode_stats(self):
        rng = np.random.RandomState(0)
        x = rng.randn(4, 3, 3, 2).astype(np.float32)
        gamma = np.array([2.0, 1.0], np.float32)
        beta = np.array([0.5, -0.5], np.float32)
        out, mean, var = ops.batch_norm(jnp.array(x), jnp.array(gamma),
                                        jnp.array(beta))
        m = x.mean(axis=(0, 1, 2))
        v = x.var(axis=(0, 1, 2))
        expected = (x - m) / np.sqrt(v + 1e-5) * gamma + beta
        np.testing.assert_allclose(out, expected, atol=1e-4)
        np.testing.assert_allclose(mean, m, atol=1e-5)


class TestSpectralNorm:
    def test_power_iteration(self):
        rng = np.random.RandomState(0)
        w = rng.randn(12, 5).astype(np.float32)
        u = rng.randn(1, 5).astype(np.float32)
        w_bar, u_new = ops.spectral_normalize(jnp.array(w), jnp.array(u))
        # golden: one TF-style power iteration
        def l2n(v):
            return v / (np.sum(v ** 2) ** 0.5 + 1e-12)
        v1 = l2n(u @ w.T)
        u1 = l2n(v1 @ w)
        sigma = (v1 @ w @ u1.T)[0, 0]
        np.testing.assert_allclose(w_bar, w / sigma, rtol=1e-5)
        np.testing.assert_allclose(u_new, u1, rtol=1e-5)

    def test_converges_to_spectral_norm(self):
        rng = np.random.RandomState(1)
        w = rng.randn(20, 8).astype(np.float32)
        u = rng.randn(1, 8).astype(np.float32)
        w_bar, _ = ops.spectral_normalize(jnp.array(w), jnp.array(u),
                                          num_iters=50)
        top_sv = np.linalg.svd(np.array(w_bar), compute_uv=False)[0]
        np.testing.assert_allclose(top_sv, 1.0, rtol=1e-4)


class TestConv:
    def test_conv_same_identity(self):
        # 1x1 identity kernel stride 1 SAME = identity
        x = jnp.array(np.random.RandomState(0).randn(1, 5, 5, 2),
                      dtype=jnp.float32)
        w = jnp.eye(2).reshape(1, 1, 2, 2).astype(jnp.float32)
        np.testing.assert_allclose(ops.conv2d(x, w, stride=1), x, rtol=1e-6)

    def test_reflect_pad_shape(self):
        x = jnp.zeros((2, 8, 8, 3))
        w = jnp.zeros((3, 3, 3, 4))
        out = ops.conv2d(x, w, stride=1, pad='REFLECT')
        assert out.shape == (2, 8, 8, 4)

    def test_deconv_is_conv_transpose(self):
        # deconv2d must equal the vjp of the forward strided SAME conv.
        rng = np.random.RandomState(0)
        x = jnp.array(rng.randn(2, 4, 4, 3), dtype=jnp.float32)  # input
        w = jnp.array(rng.randn(5, 5, 6, 3), dtype=jnp.float32)  # [k,k,out,in]
        out = ops.deconv2d(x, w, (8, 8), stride=2)
        assert out.shape == (2, 8, 8, 6)

        def fwd(y):
            return jax.lax.conv_general_dilated(
                y, w, (2, 2), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        _, vjp = jax.vjp(fwd, jnp.zeros((2, 8, 8, 6)))
        expected = vjp(x)[0]
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_deconv_gradient_flows(self):
        w = jnp.ones((5, 5, 2, 3)) * 0.1
        x = jnp.ones((1, 4, 4, 3))
        g = jax.grad(lambda w_: jnp.sum(ops.deconv2d(x, w_, (8, 8), 2)))(w)
        assert g.shape == w.shape
        assert np.all(np.isfinite(np.array(g)))


class TestPool:
    def test_mean_pool(self):
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        out = ops.mean_pool(x)
        xn = np.arange(16, dtype=np.float32).reshape(4, 4)
        expected = (xn[::2, ::2] + xn[1::2, ::2] + xn[::2, 1::2]
                    + xn[1::2, 1::2]) / 4.0
        np.testing.assert_allclose(out[0, :, :, 0], expected)

    def test_tf_avg_pool_excludes_padding(self):
        # 8x8 window stride 8 SAME over a 2x2 input: mean of 4 elements,
        # padding excluded from the denominator (TF semantics).
        x = jnp.array([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
        out = ops.tf_avg_pool(x, 8, 8)
        assert out.shape == (1, 1, 1, 1)
        np.testing.assert_allclose(out[0, 0, 0, 0], 2.5)

    def test_upsample_nearest(self):
        x = jnp.array([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
        out = np.array(ops.upsample_nearest(x))[0, :, :, 0]
        expected = np.array([[1, 1, 2, 2], [1, 1, 2, 2],
                             [3, 3, 4, 4], [3, 3, 4, 4]], np.float32)
        np.testing.assert_allclose(out, expected)


class TestResize:
    def test_matrix_rows_sum_to_one(self):
        for method in ['bicubic', 'bilinear', 'nearest']:
            m = _resize_matrix(64, 128, method)
            np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)

    def test_identity(self):
        x = jnp.array(np.random.RandomState(0).randn(1, 8, 8, 3),
                      dtype=jnp.float32)
        np.testing.assert_allclose(ops.resize(x, (8, 8)), x)

    def test_upsample_2x_constant(self):
        x = jnp.ones((1, 4, 4, 2))
        out = ops.resize(x, (8, 8), 'bicubic')
        np.testing.assert_allclose(out, 1.0, atol=1e-5)

    def test_legacy_mapping_nearest(self):
        # TF1 legacy (align_corners=False): src = dst * in/out. For 2x
        # nearest upsample each source pixel appears exactly twice.
        x = jnp.array([[1.0, 2.0, 3.0, 4.0]]).reshape(1, 1, 4, 1)
        out = np.array(ops.resize(x, (1, 8), 'nearest'))[0, 0, :, 0]
        np.testing.assert_allclose(out, [1, 1, 2, 2, 3, 3, 4, 4])

    def test_bilinear_downsample(self):
        # 4 -> 2, legacy mapping: out[j] = in[2j] (t = 0 exactly)
        x = jnp.array([[1.0, 2.0, 3.0, 4.0]]).reshape(1, 1, 4, 1)
        out = np.array(ops.resize(x, (1, 2), 'bilinear'))[0, 0, :, 0]
        np.testing.assert_allclose(out, [1.0, 3.0])


class TestNanGuardSwitch:
    """EDGEGAN_NAN_GUARDS=0 restores the reference-exact hazards
    (SURVEY Q16) for the stability ablation; default guards must be
    value-identical wherever the reference is finite."""

    def test_instance_norm_guard_vs_reference_exact(self, monkeypatch):
        const = jnp.ones((1, 4, 4, 2), jnp.float32)  # zero variance

        def loss(x):
            return jnp.sum(ops.instance_norm(x))

        monkeypatch.delenv('EDGEGAN_NAN_GUARDS', raising=False)
        assert np.isfinite(jax.grad(loss)(const)).all()
        monkeypatch.setenv('EDGEGAN_NAN_GUARDS', '0')
        assert np.isnan(jax.grad(loss)(const)).any()

        # non-degenerate input: both modes bit-identical, fwd and grad
        x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3),
                        jnp.float32)
        unguarded_f = ops.instance_norm(x)
        unguarded_g = jax.grad(loss)(x)
        monkeypatch.delenv('EDGEGAN_NAN_GUARDS', raising=False)
        np.testing.assert_array_equal(ops.instance_norm(x), unguarded_f)
        np.testing.assert_array_equal(jax.grad(loss)(x), unguarded_g)

    def test_gradient_penalty_guard_vs_reference_exact(self, monkeypatch):
        from edgegan_tpu import losses

        def critic(x):
            # input-gradient is x: VALUE zero at x=0 but not
            # structurally zero, so the sqrt-at-0 backward hazard is
            # live (a dead critic's constant output gets zero-pruned)
            v = 0.5 * jnp.sum(jnp.square(x), axis=(1, 2, 3))
            return v, jnp.zeros(x.shape[0])

        rng = jax.random.PRNGKey(0)
        real = jnp.zeros((2, 4, 4, 3))
        fake = jnp.zeros((2, 4, 4, 3))  # blend = 0 -> critic grad = 0
        monkeypatch.delenv('EDGEGAN_NAN_GUARDS', raising=False)
        gp = losses.gradient_penalty(critic, fake, real, rng, 10.0)
        assert np.isfinite(gp)  # guarded: ||g||=0 -> (0-1)^2 penalty

        def gp_loss(x):
            return losses.gradient_penalty(critic, x, real, rng, 10.0)

        assert np.isfinite(jax.grad(gp_loss)(fake)).all()  # guarded bwd
        monkeypatch.setenv('EDGEGAN_NAN_GUARDS', '0')
        # reference-exact: sqrt(0) backward is inf -> NaN in the grad
        assert np.isnan(jax.grad(gp_loss)(fake)).any()

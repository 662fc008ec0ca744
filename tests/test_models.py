"""Shape and parameter-count tests for the four networks, vs counts
implied by SURVEY.md §2.2 (hand-computed from the reference layer specs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgegan_tpu.models import Classifier, Discriminator, Encoder, Generator


def n_params(tree):
    return int(sum(np.prod(np.asarray(p.shape, dtype=np.int64))
                   for p in jax.tree.leaves(tree)))


KEY = jax.random.PRNGKey(0)


class TestGenerator:
    def test_convnet_shapes_and_count(self):
        g = Generator(output_height=64, output_width=64)
        v = g.init({'params': KEY}, jnp.zeros((2, 114)))
        out = g.apply(v, jnp.zeros((2, 114)))
        assert out.shape == (2, 64, 64, 3)
        assert np.abs(np.array(out)).max() <= 1.0  # tanh output
        # linear(114->8192)+b, BN gamma/beta(512*2), 4 deconvs+biases:
        # 942080 + 1024 + 3277056 + 819328 + 204864 + 4803
        assert n_params(v['params']) == 5_249_155
        # quirk: first norm is train-mode batch norm -> moving stats exist
        assert 'batch_stats' in v

    def test_batch_independent_of_batch_size(self):
        g = Generator(output_height=64, output_width=64)
        v = g.init({'params': KEY}, jnp.zeros((2, 114)))
        out = g.apply(v, jnp.zeros((5, 114)))
        assert out.shape == (5, 64, 64, 3)

    def test_resnet_variant_runs(self):
        g = Generator(output_height=64, output_width=64, use_resnet=True)
        v = g.init({'params': KEY}, jnp.zeros((2, 114)))
        out = g.apply(v, jnp.zeros((2, 114)))
        assert out.shape == (2, 64, 64, 3)


class TestDiscriminator:
    def test_convnet_joint_input(self):
        d = Discriminator()
        v = d.init({'params': KEY}, jnp.zeros((2, 64, 128, 3)))
        sig, logit = d.apply(v, jnp.zeros((2, 64, 128, 3)))
        assert sig.shape == logit.shape == (2, 1)
        # 3072 + 131072 + 524288 + 2097152 + (4*8*512)*1+1
        assert n_params(v['params']) == 2_771_969

    def test_sigmoid_of_logits(self):
        d = Discriminator()
        x = jax.random.normal(KEY, (2, 64, 128, 3))
        v = d.init({'params': KEY}, x)
        sig, logit = d.apply(v, x)
        np.testing.assert_allclose(sig, 1 / (1 + np.exp(-np.array(logit))),
                                   rtol=1e-5)

    def test_patch_input_128(self):
        d = Discriminator()
        v = d.init({'params': KEY}, jnp.zeros((2, 128, 128, 3)))
        sig, logit = d.apply(v, jnp.zeros((2, 128, 128, 3)))
        assert logit.shape == (2, 1)

    def test_resnet_variant_runs(self):
        d = Discriminator(use_resnet=True)
        v = d.init({'params': KEY}, jnp.zeros((2, 64, 128, 3)))
        sig, logit = d.apply(v, jnp.zeros((2, 64, 128, 3)))
        assert logit.shape == (2, 1)


class TestEncoder:
    def test_resnet_shapes(self):
        e = Encoder(latent_dim=100)
        x = jnp.zeros((2, 64, 64, 3))
        v = e.init({'params': KEY, 'noise': KEY}, x)
        z, mu, log_sigma = e.apply(v, x, rngs={'noise': KEY})
        assert z.shape == mu.shape == log_sigma.shape == (2, 100)

    def test_scalar_noise_quirk(self):
        # Q2: epsilon is a SINGLE scalar broadcast over batch and dims:
        # (z - mu) / exp(log_sigma) must be constant everywhere.
        e = Encoder(latent_dim=100)
        x = jax.random.normal(KEY, (4, 64, 64, 3))
        v = e.init({'params': KEY, 'noise': KEY}, x)
        z, mu, log_sigma = e.apply(v, x, rngs={'noise': jax.random.PRNGKey(7)})
        eps = np.array((z - mu) / jnp.exp(log_sigma))
        assert np.allclose(eps, eps.flat[0], atol=1e-4)
        assert abs(eps.flat[0]) > 1e-6  # actually stochastic

    def test_convnet_variant_runs(self):
        e = Encoder(latent_dim=100, use_resnet=False)
        x = jnp.zeros((2, 64, 64, 3))
        v = e.init({'params': KEY, 'noise': KEY}, x)
        z, mu, log_sigma = e.apply(v, x, rngs={'noise': KEY})
        assert z.shape == (2, 100)


class TestClassifier:
    def test_shapes(self):
        c = Classifier(num_classes=14)
        x = jnp.zeros((2, 64, 64, 3))
        v = c.init({'params': KEY}, x)
        disc, sig, logits = c.apply(v, x)
        # 4 stride-2 MRU units: 64 -> 4; patch head 1 channel
        assert disc.shape == (2, 4, 4, 1)
        assert sig.shape == logits.shape == (2, 14)
        assert 'spectral' in v

    def test_spectral_u_frozen_by_default(self):
        # Quirk Q3: u must NOT change across applies by default.
        c = Classifier(num_classes=14)
        x = jax.random.normal(KEY, (2, 64, 64, 3))
        v = c.init({'params': KEY}, x)
        _ = c.apply(v, x)
        # apply without mutable: variables untouched by construction.
        # With update_sn=True and mutable, u must change:
        _, updated = c.apply(v, x, True, mutable=['spectral'])
        leaves_before = jax.tree.leaves(v['spectral'])
        leaves_after = jax.tree.leaves(updated['spectral'])
        changed = any(not np.allclose(a, b)
                      for a, b in zip(leaves_before, leaves_after))
        assert changed

    def test_gate_bias_init(self):
        c = Classifier(num_classes=14)
        v = c.init({'params': KEY}, jnp.zeros((2, 64, 64, 3)))
        gate_bias = v['params']['mru_conv_unit_1']['update_gate']['biases']
        np.testing.assert_allclose(gate_bias, 0.5)

    def test_prelu_init(self):
        c = Classifier(num_classes=14)
        v = c.init({'params': KEY}, jnp.zeros((2, 64, 64, 3)))
        leak = v['params']['h0']['prelu']['param']
        np.testing.assert_allclose(leak, 0.2)

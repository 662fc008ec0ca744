"""Layer-level tests: MRU cell/stack semantics, residual blocks, SN state."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgegan_tpu.models.layers import (MRUBlock, MRUStack, PReLU,
                                       Residual, Residual2, SNConv2D,
                                       SNDense)

KEY = jax.random.PRNGKey(0)


class TestMRU:
    def test_block_stride2_shapes(self):
        m = MRUBlock(32, stride=2)
        inp = jnp.zeros((2, 16, 16, 3))
        ht = jnp.zeros((2, 16, 16, 8))
        v = m.init({'params': KEY}, inp, ht)
        out = m.apply(v, inp, ht)
        assert out.shape == (2, 8, 8, 32)

    def test_block_deconv_upsamples(self):
        m = MRUBlock(16, stride=2, deconv=True)
        inp = jnp.zeros((2, 8, 8, 3))
        ht = jnp.zeros((2, 4, 4, 8))
        v = m.init({'params': KEY}, inp, ht)
        out = m.apply(v, inp, ht)
        assert out.shape == (2, 8, 8, 16)

    def test_gate_is_minmax_normalized(self):
        # With gate in [0,1], ht_plus stays between ht and ht+img_new;
        # indirectly check output finiteness with extreme inputs.
        m = MRUBlock(8, stride=1)
        inp = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3) * 100,
                          jnp.float32)
        ht = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 8) * 100,
                         jnp.float32)
        v = m.init({'params': KEY}, inp, ht)
        out = m.apply(v, inp, ht)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_stack_multiblock(self):
        m = MRUStack(32, num_blocks=3, stride=2, last_unit=True)
        x = jnp.zeros((2, 16, 16, 3))
        hts = [jnp.zeros((2, 16, 16, 8))] * 3
        v = m.init({'params': KEY}, x, hts)
        outs = m.apply(v, x, hts)
        assert len(outs) == 3
        assert outs[0].shape == (2, 8, 8, 32)
        assert outs[1].shape == (2, 8, 8, 32)
        assert outs[2].shape == (2, 8, 8, 32)
        assert 'last_norm_prelu' in v['params']

    def test_stack_single_equals_block(self):
        """num_blocks=1 stack == one stride-2 MRU block (same math)."""
        x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 3),
                        jnp.float32)
        ht = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 4),
                         jnp.float32)
        stack = MRUStack(16, num_blocks=1, stride=2)
        vs = stack.init({'params': KEY}, x, [ht])
        block = MRUBlock(16, stride=2)
        vb = {'params': vs['params']['layer_0'],
              'spectral': vs['spectral']['layer_0']}
        out_s = stack.apply(vs, x, [ht])[0]
        out_b = block.apply(vb, x, ht)
        np.testing.assert_allclose(out_s, out_b, atol=1e-6)


class TestSN:
    def test_snconv_normalizes_weight(self):
        m = SNConv2D(8, 3, sn=True)
        x = jnp.zeros((1, 8, 8, 4))
        v = m.init({'params': KEY}, x)
        w = np.asarray(v['params']['weights']).reshape(-1, 8)
        u = np.asarray(v['spectral']['u'])
        # applying with a scaled weight gives a scaled-invariant output
        v2 = jax.tree.map(lambda a: a, v)
        v2 = {'params': {**v['params'],
                         'weights': v['params']['weights'] * 3.0},
              'spectral': v['spectral']}
        x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4),
                        jnp.float32)
        out1 = m.apply(v, x)
        out2 = m.apply(v2, x)
        np.testing.assert_allclose(out1, out2, atol=1e-4)

    def test_sndense_bias_not_normalized(self):
        m = SNDense(4, sn=True)
        x = jnp.ones((2, 8))
        v = m.init({'params': KEY}, x)
        v2 = {'params': {**v['params'],
                         'biases': v['params']['biases'] + 1.0},
              'spectral': v['spectral']}
        out1 = m.apply(v, x)
        out2 = m.apply(v2, x)
        np.testing.assert_allclose(np.asarray(out2 - out1), 1.0, atol=1e-6)


class TestResiduals:
    def test_residual_reflect(self):
        m = Residual(16)
        x = jnp.zeros((2, 8, 8, 4))
        v = m.init({'params': KEY}, x)
        out = m.apply(v, x)
        assert out.shape == (2, 8, 8, 16)
        assert np.all(np.asarray(out) >= 0)  # final relu

    def test_residual2_lrelu(self):
        m = Residual2(16, 3, 1)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4),
                        jnp.float32)
        v = m.init({'params': KEY}, x)
        out = m.apply(v, x)
        assert out.shape == (2, 8, 8, 16)

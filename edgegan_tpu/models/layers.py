"""Flax linen building blocks.

Each block mirrors a reference nn-module (cited per class) but is built
NHWC/TPU-first on top of edgegan_tpu.ops. Parameter initializers follow
the reference exactly:
  - conv kernels: truncated normal sigma=0.02 (reference conv.py:20-22)
  - deconv kernels / dense matrices: normal sigma=0.02 (conv.py:46-48,
    linear.py:15-18)
  - spectral-norm layers: normal(0, 0.02) where the classifier overrides
    the xavier default (classifier.py:43), xavier elsewhere
  - spectral-norm `u`: truncated normal sigma=1 (normalization.py:42-44)

Spectral-norm state lives in the 'spectral' variable collection. By
default it is never written back, matching the reference quirk (Q3 in
SURVEY.md §8) that the u-update ops are never run; pass
`update_sn=True` (with 'spectral' mutable) to enable real updates.

Batch-norm moving averages live in the 'batch_stats' collection. They
are tracked (decay 0.9) when the collection is mutable but never
consumed — the reference hard-codes train-mode batch norm
(normalization.py:19-25).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import activations, conv as conv_ops, norms, pool

Dtype = Any

trunc_normal_002 = nn.initializers.truncated_normal(stddev=0.02)
normal_002 = nn.initializers.normal(stddev=0.02)
xavier_uniform = nn.initializers.glorot_uniform()
trunc_normal_1 = nn.initializers.truncated_normal(stddev=1.0)
zeros = nn.initializers.zeros
ones = nn.initializers.ones


def _norm_act(module: nn.Module, x, norm: Optional[str],
              activation: Optional[str], name: str,
              allow_pallas: bool = True):
    """norm -> activation, fused into one Pallas kernel on TPU when the
    pair is instance-norm + {None, relu, lrelu}. Callers on the
    gradient-penalty path (the critics) must pass allow_pallas=False:
    the fused kernel's custom VJP supports only first-order autodiff,
    and WGAN-GP differentiates through the critic twice."""
    from ..ops import pallas_kernels as pk
    if (allow_pallas and norm == 'instance'
            and activation in (None, 'relu', 'lrelu') and pk.should_use()):
        return pk.instance_norm_act(x, activation)
    x = _norm_apply(module, x, norm, name)
    return activations.activation_fn(x, activation)


def _norm_apply(module: nn.Module, x, norm: Optional[str], name: str):
    """Dispatch like reference normalization.py:10-29 inside a module."""
    if norm is None:
        return x
    if norm == 'instance':
        return norms.instance_norm(x)
    if norm == 'batch':
        c = x.shape[-1]
        gamma = module.param(f'{name}_gamma', ones, (c,))
        beta = module.param(f'{name}_beta', zeros, (c,))
        out, mean, var = norms.batch_norm(x, gamma, beta)
        mov_mean = module.variable('batch_stats', f'{name}_mean',
                                   lambda: jnp.zeros((c,), jnp.float32))
        mov_var = module.variable('batch_stats', f'{name}_var',
                                  lambda: jnp.ones((c,), jnp.float32))
        # Moving stats are intentionally FROZEN during training: the
        # reference updates them in-place on every forward
        # (updates_collections=None) but never consumes them — contrib
        # batch_norm runs with is_training=True even in the test graph
        # (normalization.py:25, quirk Q14) — so only the checkpointed
        # values would differ, never an activation. The train step keeps
        # 'batch_stats' immutable; the TF importer (convert.py) restores
        # the reference's accumulated values verbatim for parity.
        if module.is_mutable_collection('batch_stats'):
            mov_mean.value = 0.9 * mov_mean.value + 0.1 * mean
            mov_var.value = 0.9 * mov_var.value + 0.1 * var
        return out
    raise ValueError(f'unknown norm: {norm!r}')


class Conv2D(nn.Module):
    """conv2d (reference conv.py:13-36). Kernel [k,k,in,out]."""
    features: int
    kernel_size: int = 5
    stride: int = 2
    pad: str = 'SAME'
    use_bias: bool = True
    kernel_init: Callable = trunc_normal_002

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param('w', self.kernel_init,
                       (k, k, x.shape[-1], self.features))
        out = conv_ops.conv2d(x, w, self.stride, self.pad)
        if self.use_bias:
            b = self.param('b', zeros, (self.features,))
            out = out + b.astype(out.dtype)
        return out


class Deconv2D(nn.Module):
    """deconv2d (reference conv.py:39-58). Kernel [k,k,out,in] (TF layout)."""
    features: int
    out_hw: Tuple[int, int]
    kernel_size: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param('w', normal_002, (k, k, self.features, x.shape[-1]))
        b = self.param('b', zeros, (self.features,))
        out = conv_ops.deconv2d(x, w, self.out_hw, self.stride)
        return out + b.astype(out.dtype)


class Linear(nn.Module):
    """linear (reference linear.py:10-31): matmul + bias, normal 0.02."""
    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param('Matrix', normal_002, (x.shape[-1], self.features))
        b = self.param('bias', zeros, (self.features,))
        return x @ w.astype(x.dtype) + b.astype(x.dtype)


class Mlp(nn.Module):
    """mlp (reference linear.py:79-92): matmul+bias -> act -> norm."""
    features: int
    activation: Optional[str] = None
    norm: Optional[str] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param('w', normal_002, (x.shape[-1], self.features))
        out = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param('b', zeros, (self.features,))
            out = out + b.astype(out.dtype)
        out = activations.activation_fn(out, self.activation)
        out = _norm_apply(self, out, self.norm, 'norm')
        return out


class ConvBlock(nn.Module):
    """conv_block (reference conv.py:61-67): conv -> norm -> act."""
    features: int
    kernel_size: int
    stride: int
    norm: Optional[str] = None
    activation: Optional[str] = None
    pad: str = 'SAME'
    use_bias: bool = False
    allow_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        out = Conv2D(self.features, self.kernel_size, self.stride,
                     self.pad, self.use_bias, name='conv2d')(x)
        return _norm_act(self, out, self.norm, self.activation, 'norm',
                         self.allow_pallas)


class DeconvBlock(nn.Module):
    """deconv_block (reference conv.py:124-130): deconv -> norm -> act."""
    features: int
    out_hw: Tuple[int, int]
    kernel_size: int
    stride: int
    norm: Optional[str] = None
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        out = Deconv2D(self.features, self.out_hw, self.kernel_size,
                       self.stride, name='deconv2d')(x)
        return _norm_act(self, out, self.norm, self.activation, 'norm')


class Residual(nn.Module):
    """residual (reference conv.py:70-85): two 3x3 REFLECT convs + 1x1
    shortcut, relu on the sum."""
    features: int
    norm: Optional[str] = 'instance'
    pad: str = 'REFLECT'
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        out = Conv2D(self.features, 3, 1, self.pad, self.use_bias,
                     name='res1')(x)
        out = _norm_apply(self, out, self.norm, 'norm1')
        out = activations.relu(out)
        out = Conv2D(self.features, 3, 1, self.pad, self.use_bias,
                     name='res2')(out)
        out = _norm_apply(self, out, self.norm, 'norm2')
        shortcut = Conv2D(self.features, 1, 1, self.pad, self.use_bias,
                          name='shortcut')(x)
        return activations.relu(shortcut + out)


class Residual2(nn.Module):
    """residual2 (reference conv.py:88-103): lrelu-activated variant."""
    features: int
    kernel_size: int
    stride: int
    norm: Optional[str] = None
    activation: Optional[str] = 'lrelu'
    pad: str = 'SAME'
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        out = Conv2D(self.features, self.kernel_size, self.stride,
                     self.pad, self.use_bias, name='res1')(x)
        out = _norm_apply(self, out, self.norm, 'norm1')
        out = activations.activation_fn(out, 'lrelu')
        out = Conv2D(self.features, self.kernel_size, self.stride,
                     self.pad, self.use_bias, name='res2')(out)
        out = _norm_apply(self, out, self.norm, 'norm2')
        shortcut = Conv2D(self.features, 1, 1, self.pad, self.use_bias,
                          name='shortcut')(x)
        return activations.activation_fn(shortcut + out, self.activation)


class Deresidual2(nn.Module):
    """deresidual2 (reference conv.py:106-121): transposed-conv residual."""
    features: int
    out_hw: Tuple[int, int]
    kernel_size: int
    stride: int
    norm: Optional[str] = None
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        out = Deconv2D(self.features, self.out_hw, self.kernel_size,
                       self.stride, name='res1')(x)
        out = _norm_apply(self, out, self.norm, 'norm1')
        out = activations.activation_fn(out, self.activation)
        out = Deconv2D(self.features, self.out_hw, self.kernel_size,
                       self.stride, name='res2')(out)
        out = _norm_apply(self, out, self.norm, 'norm2')
        shortcut = Deconv2D(self.features, self.out_hw, 1, 1,
                            name='shortcut')(x)
        return activations.activation_fn(shortcut + out, self.activation)


class PReLU(nn.Module):
    """prelu (reference activation.py:23-27): learnable scalar leak."""

    @nn.compact
    def __call__(self, x):
        # explicit dtype: a weak-typed init would flip to strong after the
        # first optimizer update and force a jit recompile
        leak = self.param('param',
                          lambda key, shape: jnp.full(shape, 0.2,
                                                      dtype=jnp.float32), ())
        # Fused one-pass backward on TPU (first-order custom VJP — legal
        # here: prelu exists only in the classifier, which the gradient
        # penalty never double-differentiates; see pallas_kernels.prelu).
        from ..ops import pallas_kernels
        if (pallas_kernels.prelu_enabled()
                and pallas_kernels.prelu_eligible(x.shape, x.dtype)):
            return pallas_kernels.prelu(x, leak)
        return activations.prelu(x, leak.astype(x.dtype))


class SNConv2D(nn.Module):
    """conv2d2 (reference conv.py:246-295): NHWC SAME conv with optional
    spectral norm, bias, and activation. Reference layout is NCHW; only
    the data layout differs here, the math is identical."""
    features: int
    kernel_size: int
    stride: int = 1
    sn: bool = True
    use_bias: bool = True
    bias_init: Callable = zeros
    kernel_init: Callable = xavier_uniform
    activation: Optional[str] = None  # None | 'relu' | 'lrelu' | 'prelu'

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        k = self.kernel_size
        w = self.param('weights', self.kernel_init,
                       (k, k, x.shape[-1], self.features))
        if self.sn:
            u = self.variable('spectral', 'u',
                              lambda: trunc_normal_1(
                                  self.make_rng('params')
                                  if self.is_initializing() else
                                  jax.random.PRNGKey(0),
                                  (1, self.features)))
            w_bar, u_new = norms.spectral_normalize(w, u.value)
            if update_sn and self.is_mutable_collection('spectral') \
                    and not self.is_initializing():
                u.value = u_new
            w = w_bar
        out = conv_ops.conv2d(x, w, self.stride, 'SAME')
        if self.use_bias:
            b = self.param('biases', self.bias_init, (self.features,))
            out = out + b.astype(out.dtype)
        if self.activation == 'prelu':
            out = PReLU(name='prelu')(out)
        else:
            out = activations.activation_fn(out, self.activation)
        return out


class SNDense(nn.Module):
    """fully_connected (reference linear.py:34-77): spectral-normed FC."""
    features: int
    sn: bool = True
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        w = self.param('weights', self.kernel_init,
                       (x.shape[-1], self.features))
        if self.sn:
            u = self.variable('spectral', 'u',
                              lambda: trunc_normal_1(
                                  self.make_rng('params')
                                  if self.is_initializing() else
                                  jax.random.PRNGKey(0),
                                  (1, self.features)))
            w_bar, u_new = norms.spectral_normalize(w, u.value)
            if update_sn and self.is_mutable_collection('spectral') \
                    and not self.is_initializing():
                u.value = u_new
            w = w_bar
        out = x @ w.astype(x.dtype)
        b = self.param('biases', zeros, (self.features,))
        return out + b.astype(out.dtype)


class MRUBlock(nn.Module):
    """mru_conv_block_v3 (reference conv.py:133-243), NHWC.

    Gated "masked residual unit": a min-max-normalized update gate blends
    an input conv into the hidden state; two 3x3 convs produce the new
    hidden state which is added to a (1x1-projected) residual; stride 2
    is realised as a trailing 2x2 mean-pool.
    """
    filter_depth: int
    stride: int = 1
    sn: bool = True
    kernel_init: Callable = normal_002
    deconv: bool = False  # reference conv.py:174-178 (dead path there:
    #                       mru_conv hardwires deconv=False, conv.py:322)

    @nn.compact
    def __call__(self, inp, ht, update_sn: bool = False):
        if self.deconv and self.stride == 2:
            ht = pool.upsample_nearest(ht)
        elif self.deconv and self.stride != 1:
            raise NotImplementedError(self.stride)
        hidden_depth = ht.shape[-1]
        ht_orig = ht
        # norm_activ on hidden state (normalizer None, activation prelu):
        # reference conv.py:148-157,183-187
        full_inp = jnp.concatenate(
            [PReLU(name='norm_activation_in_prelu')(ht), inp], axis=-1)
        # update gate with lrelu activation and bias init 0.5
        # (reference conv.py:190-198)
        rg = SNConv2D(hidden_depth, 3, 1, sn=self.sn,
                      bias_init=lambda key, shape: jnp.full(
                          shape, 0.5, dtype=jnp.float32),
                      kernel_init=self.kernel_init, activation='lrelu',
                      name='update_gate')(full_inp, update_sn)
        # input image conv (reference conv.py:201-206)
        img_new = SNConv2D(hidden_depth, 3, 1, sn=self.sn,
                           kernel_init=self.kernel_init, activation=None,
                           name='img_conv')(inp, update_sn)
        from ..ops import pallas_kernels
        if (pallas_kernels.gate_enabled()
                and pallas_kernels.gate_eligible(rg.shape, rg.dtype)):
            # fused min-max-normalize + blend (one VMEM-resident kernel,
            # first-order custom VJP — classifier is never on the GP
            # double-backward path; see pallas_kernels.mru_gate_blend)
            ht_plus = pallas_kernels.mru_gate_blend(rg, ht, img_new)
        else:
            rg_min = jnp.min(rg, axis=(1, 2), keepdims=True)
            rg_max = jnp.max(rg, axis=(1, 2), keepdims=True)
            # spatially-constant gate -> 0/0 NaN in the reference; guard
            # to a zero gate (identical everywhere the reference is
            # finite). EDGEGAN_NAN_GUARDS=0 restores the reference-exact
            # hazard (stability ablation switch, ops/norms.py).
            rg_range = rg_max - rg_min
            from ..ops.norms import nan_guards_enabled
            if nan_guards_enabled():
                rg = (rg - rg_min) / jnp.where(rg_range > 0, rg_range, 1.0)
            else:  # reference conv.py:197-198
                rg = (rg - rg_min) / rg_range
            ht_plus = ht + rg * img_new
        ht_new_in = PReLU(name='norm_activation_merge_1_prelu')(ht_plus)
        # two 3x3 convs (reference conv.py:213-224)
        h_new = SNConv2D(self.filter_depth, 3, 1, sn=self.sn,
                         kernel_init=self.kernel_init, activation='prelu',
                         name='h_conv1')(ht_new_in, update_sn)
        h_new = SNConv2D(self.filter_depth, 3, 1, sn=self.sn,
                         kernel_init=self.kernel_init, activation=None,
                         name='h_conv2')(h_new, update_sn)
        # channel-matching 1x1 shortcut (reference conv.py:228-234)
        if hidden_depth != self.filter_depth:
            ht_orig = SNConv2D(self.filter_depth, 1, 1, sn=self.sn,
                               kernel_init=self.kernel_init, activation=None,
                               name='shortcut')(ht_orig, update_sn)
        ht_new = ht_orig + h_new
        if not self.deconv:
            if self.stride == 2:
                ht_new = pool.mean_pool(ht_new)
            elif self.stride != 1:
                raise NotImplementedError(self.stride)
        return ht_new


class MRUStack(nn.Module):
    """mru_conv (reference conv.py:298-357): a cascade of `num_blocks`
    MRU cells sharing one input image; block 0 takes the requested
    stride, later blocks run at stride 1 with their incoming hidden
    state pre-pooled; `last_unit` applies the trailing prelu
    (conv.py:353-355). The classifier's units are the num_blocks=1
    special case (classifier.py:57-63)."""
    filter_depth: int
    num_blocks: int = 1
    stride: int = 2
    sn: bool = True
    last_unit: bool = False
    kernel_init: Callable = normal_002

    @nn.compact
    def __call__(self, x, hts, update_sn: bool = False):
        assert len(hts) == self.num_blocks
        hts_new = []
        inp = x
        for i in range(self.num_blocks):
            ht = hts[i]
            if i > 0 and self.stride == 2:
                ht = pool.mean_pool(ht)
            ht_new = MRUBlock(self.filter_depth,
                              stride=self.stride if i == 0 else 1,
                              sn=self.sn, kernel_init=self.kernel_init,
                              name=f'layer_{i}')(inp, ht, update_sn)
            hts_new.append(ht_new)
            inp = ht_new
        if self.last_unit:
            hts_new[-1] = PReLU(name='last_norm_prelu')(hts_new[-1])
        return hts_new

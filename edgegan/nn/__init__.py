"""`edgegan.nn` import shim -> edgegan_tpu.ops / models.layers / losses.

Maps every reference nn symbol (/root/reference/edgegan/nn/modules/
__init__.py:1-6, nn/__init__.py:4-15) to its rebuild counterpart.
Pure-function ops keep their functional names; TF variable-creating
ops (conv blocks, residuals, MRU, linear/mlp, spectral-norm wrappers)
map to the Flax module classes that replace them — same math,
params-in call signatures instead of graph-building side effects.
TF summary aliases map to the rebuild's SummaryWriter.
"""
# pure functional ops (1:1 semantics)
from edgegan_tpu.ops import (activation_fn, conv2d, deconv2d, instance_norm,
                             batch_norm, lrelu, mean_pool, miu_relu, prelu,
                             relu, spectral_normalize, upsample_nearest)

# the reference's `norm(x, 'instance'|'batch')` dispatch
# (/root/reference/edgegan/nn/modules/normalization.py:10-25)
def norm(x, norm_type='batch', **kwargs):
    if norm_type == 'instance':
        return instance_norm(x)
    if norm_type == 'batch':
        raise NotImplementedError(
            'stateful batch norm needs parameters; use '
            'edgegan.nn.ConvBlock / the Flax modules instead')
    return x


# variable-creating reference ops -> Flax modules (same architecture
# math; construct with hyperparams, call with (params, x) via flax)
from edgegan_tpu.models.layers import (Conv2D, ConvBlock, Deconv2D,
                                       DeconvBlock, Deresidual2, Linear,
                                       Mlp, MRUBlock, MRUStack, PReLU,
                                       Residual, Residual2, SNConv2D,
                                       SNDense)

# reference-name aliases for the module equivalents
conv_block = ConvBlock
deconv_block = DeconvBlock
residual = Residual
residual2 = Residual2
deresidual2 = Deresidual2
mru_conv = MRUStack
conv2d2 = SNConv2D
linear = Linear
mlp = Mlp
fully_connected = SNDense
spectral_normed_weight = spectral_normalize
upsample = upsample_nearest
upsample2 = upsample_nearest

# losses (/root/reference/edgegan/nn/functional.py)
from edgegan_tpu import losses as functional  # noqa: E402
from edgegan_tpu.losses import (discriminator_ganloss, flatten,  # noqa: E402
                                generator_ganloss, get_acgan_loss_focal,
                                get_class_loss, gradient_penalty, l1loss)

# TF summary aliases (/root/reference/edgegan/nn/__init__.py:4-15)
from edgegan_tpu.summaries import SummaryWriter  # noqa: E402

__all__ = [
    'activation_fn', 'conv2d', 'deconv2d', 'instance_norm', 'batch_norm',
    'lrelu', 'mean_pool', 'miu_relu', 'prelu', 'relu', 'norm',
    'spectral_normalize', 'spectral_normed_weight', 'upsample_nearest',
    'upsample', 'upsample2',
    'Conv2D', 'ConvBlock', 'Deconv2D', 'DeconvBlock', 'Deresidual2',
    'Linear', 'Mlp', 'MRUBlock', 'MRUStack', 'PReLU', 'Residual',
    'Residual2', 'SNConv2D', 'SNDense',
    'conv_block', 'deconv_block', 'residual', 'residual2', 'deresidual2',
    'mru_conv', 'conv2d2', 'linear', 'mlp', 'fully_connected',
    'functional', 'discriminator_ganloss', 'flatten', 'generator_ganloss',
    'get_acgan_loss_focal', 'get_class_loss', 'gradient_penalty', 'l1loss',
    'SummaryWriter',
]

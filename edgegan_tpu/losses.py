"""Loss functions (reference /root/reference/edgegan/nn/functional.py).

All reductions are global means, matching the reference. Under
data-parallel jit the batch axis is sharded and XLA turns these means
into the appropriate cross-device reductions automatically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _f32_cast(x):
    return x.astype(jnp.float32)


def _f32_cast_fwd(x):
    return x.astype(jnp.float32), None


def _f32_cast_bwd(_, g):
    return (g.astype(jnp.bfloat16),)


_f32_cast.defvjp(_f32_cast_fwd, _f32_cast_bwd)


def _to_f32(x):
    """Mixed-precision loss boundary: loss reductions run in f32, but
    the cotangent re-enters the network in the network's own dtype.

    Without this, a plain `.astype(f32)` on a bf16 network output makes
    the f32 cotangent PROMOTE every backward matmul/conv all the way
    down to f32 (measured: ~34 ms/step of f32 big-tensor traffic at the
    128 config). Values are unchanged — the bf16 cast would otherwise
    happen at each layer's weight-cast boundary anyway.

    custom_vjp is first-order: use ONLY in losses that are
    differentiated once (NOT inside gradient_penalty's inner grad).
    """
    x = jnp.asarray(x)
    if x.dtype == jnp.float32:
        return x
    return _f32_cast(x)


def discriminator_ganloss(fake_out, real_out):
    """WGAN critic loss `mean(fake - real)` (functional.py:32-33).
    Reductions in f32 so bf16 compute keeps stable loss values."""
    return jnp.mean(_to_f32(fake_out) - _to_f32(real_out))


def generator_ganloss(fake_out):
    """`mean(-fake)` (functional.py:36-37)."""
    return jnp.mean(-_to_f32(fake_out))


def l1loss(output, target, weight):
    """`weight * mean(|output - target|)` (functional.py:40-41)."""
    return weight * jnp.mean(jnp.abs(_to_f32(output) - _to_f32(target)))


def _sparse_ce(logits, labels):
    logp = jax.nn.log_softmax(_to_f32(logits), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def get_acgan_loss_focal(real_logits, real_label, fake_logits, condition,
                         num_classes, ld1=1.0, ld2=0.5, ld_focal=2.0):
    """Focal AC-GAN losses (functional.py:5-16).

    loss_ac_d = ld1 * mean((1 - p_true)^gamma * CE(real_logits, label))
    loss_ac_g = ld2 * mean(CE(fake_logits, condition))
    Returns (loss_ac_g, loss_ac_d) in the reference's order.
    """
    p = jax.nn.softmax(_to_f32(real_logits), axis=-1)
    onehot = jax.nn.one_hot(real_label, num_classes, dtype=p.dtype)
    pt = jnp.sum(p * onehot, axis=-1)
    loss_ac_d = ld1 * jnp.mean(
        (1.0 - pt) ** ld_focal * _sparse_ce(real_logits, real_label))
    loss_ac_g = ld2 * jnp.mean(_sparse_ce(fake_logits, condition))
    return loss_ac_g, loss_ac_d


def get_class_loss(logits, label, num_classes, ld_focal=2.0):
    """Focal CE (functional.py:19-24; unused by the model, kept for parity)."""
    p = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(label, num_classes, dtype=p.dtype)
    pt = jnp.sum(p * onehot, axis=-1)
    return jnp.mean((1.0 - pt) ** ld_focal * _sparse_ce(logits, label))


def flatten(x):
    """Reshape to [batch, -1] (reference functional.py:44-45)."""
    return x.reshape(x.shape[0], -1)


def random_blend(a, b, rng):
    """`b + alpha * (a - b)`, alpha ~ U[0,1) per sample
    (models/edgegan.py:32-35)."""
    alpha = jax.random.uniform(rng, (a.shape[0], 1, 1, 1), a.dtype)
    return b + alpha * (a - b)


def gradient_penalty(d_apply, synthesized, real, rng, weight):
    """WGAN-GP on a random blend (models/edgegan.py:38-42,
    functional.py:26-29).

    Parity quirk Q4: the reference passes the discriminator's
    (sigmoid(D), D) TUPLE into tf.gradients, so the penalty
    differentiates sum(sigmoid(D)) + sum(D) w.r.t. the blend — not the
    logits alone. Reproduced exactly.
    """
    interpolated = random_blend(synthesized, real, rng)

    def f(x):
        sig, logit = d_apply(x)
        return jnp.sum(sig) + jnp.sum(logit)

    grads = jax.grad(f)(interpolated).astype(jnp.float32)
    sumsq = jnp.sum(jnp.square(grads), axis=(1, 2, 3))
    # sqrt backward is inf at 0; a sample with identically-zero critic
    # gradient would NaN the whole step (same hazard in the reference).
    from .ops.norms import nan_guards_enabled
    if nan_guards_enabled():
        grad_l2 = jnp.sqrt(jnp.where(sumsq > 0, sumsq, 1.0))
        grad_l2 = jnp.where(sumsq > 0, grad_l2, 0.0)
    else:  # reference-exact (functional.py:26-29)
        grad_l2 = jnp.sqrt(sumsq)
    return weight * jnp.mean((grad_l2 - 1.0) ** 2)

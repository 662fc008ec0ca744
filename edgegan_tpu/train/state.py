"""Train state: parameters, non-trainable state, 7 optimizer groups.

The reference registers 7 sequential RMSProp groups
(/root/reference/edgegan/models/edgegan.py:109-124):
  d (joint D), d_patch2 (image D), d_patch3 (edge D), d2 (classifier),
  g_u (both generators), e (encoder), g_b (both generators AGAIN —
  reusing the SAME optimizer slots, so one state per generator here).

TF1 RMSProp semantics (decay 0.9, momentum 0, epsilon 1e-10, mean-square
slot initialised to ONES) map exactly onto
optax.rmsprop(decay=0.9, eps=1e-10, initial_scale=1.0, eps_in_sqrt=True).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.struct
import optax

PyTree = Any

GROUP_KEYS = ('d', 'd_patch2', 'd_patch3', 'd2', 'g1', 'g2', 'e')


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    return optax.rmsprop(learning_rate, decay=0.9, eps=1e-10,
                         initial_scale=1.0, eps_in_sqrt=True)


class TrainState(flax.struct.PyTreeNode):
    step: int
    params: Dict[str, PyTree]
    aux: Dict[str, PyTree]           # 'spectral' / 'batch_stats' per net
    opt_states: Dict[str, PyTree]    # keyed by GROUP_KEYS subset


def create_train_state(networks, rng, learning_rate: float,
                       jit_init: bool = True) -> TrainState:
    import jax
    import jax.numpy as jnp

    def build(rng) -> TrainState:
        params, aux = networks.init(rng)
        tx = make_optimizer(learning_rate)
        opt_states = {}
        mapping = {'d': 'D', 'd_patch2': 'D_patch2', 'd_patch3': 'D_patch3',
                   'd2': 'D2', 'g1': 'G1', 'g2': 'G2', 'e': 'E'}
        for group, net in mapping.items():
            if net in params:
                opt_states[group] = tx.init(params[net])
        # step as a strong-typed device scalar: a Python int would change
        # aval weak_type after the first update and force a recompile.
        return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                          aux=aux, opt_states=opt_states)

    # One jitted program instead of eager per-op dispatch: on the remote
    # TPU backend the eager init is ~470 s of tunnel round trips (one per
    # op across 7 networks + optimizer slots), measured round 5; the
    # compiled program is ~48 s once and ~0 s from the persistent
    # compilation cache in every later process. Values differ from the
    # eager path only at fusion rounding (<2e-6 max abs, tested); pass
    # jit_init=False for the pre-round-5 eager bits.
    if jit_init:
        return jax.jit(build)(rng)
    return build(rng)

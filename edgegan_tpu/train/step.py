"""The fused training step.

The reference runs ~14 separate graph executions per step: 7 sequential
optimizer sess.runs (models/edgegan.py:126-130), 2 summary runs and 5
loss evals (models/edgegan.py:427-481). This rebuild collapses the whole
thing into ONE jitted function.

`update_mode='faithful'` preserves the reference's subtle sequential
semantics: each optimizer group sees parameters already updated by
earlier groups in the same step (SURVEY.md §7 "hard parts"), and the
generators are updated twice with the encoder update in between
(quirk Q5). `update_mode='fast'` computes every group's gradient from
the step-start snapshot and updates the generators once — cheaper, not
dynamics-identical.

Data parallelism: the step is pure; shard the batch on the 'data' mesh
axis and jit under the mesh — all losses are global means, so XLA
inserts the gradient all-reduces over ICI automatically.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .. import losses as L
from ..core.config import Config
from ..ops.resize import resize
from .networks import Networks
from .state import TrainState, make_optimizer

PyTree = Any


def make_train_step(nets: Networks, config: Config):
    tx = make_optimizer(config.learning_rate)
    z_dim = config.z_dim
    half_w = int(config.output_width / 2)
    bf16 = config.dtype == 'bfloat16'
    # Mixed precision: every layer casts its weights to the input dtype
    # (w.astype(x.dtype)), so casting the batch to bf16 puts the whole
    # forward/backward on the MXU in bf16 while master params, optimizer
    # state, and loss reductions stay f32 (grads flow back through the
    # casts as f32 automatically).
    compute_dtype = jnp.bfloat16 if bf16 else jnp.float32

    def split_pair(inputs):
        # left half = edge/sketch, right half = photo
        # (models/edgegan.py:203-209)
        return (inputs[:, :, :half_w, :],
                inputs[:, :, half_w:config.output_width, :])

    def update(group, grads, opt_states, params_net):
        updates, new_opt = tx.update(grads, opt_states[group], params_net)
        return optax.apply_updates(params_net, updates), \
            {**opt_states, group: new_opt}

    def g_losses(g1g2, params, aux, z_in, images, labels):
        """edge_gloss(G1) + image_gloss(G2) (models/edgegan.py:314-332)
        arranged so ONE backward pass yields exactly the reference's
        per-generator gradients: the joint critic is applied twice, once
        with G2's branch stop-gradiented (edge side) and once with G1's
        (image side). d(edge_gloss)/dG1 and d(image_gloss)/dG2 match the
        reference's two separate minimize() calls; the summed loss has
        no cross terms because each generator is frozen in the other's
        branch."""
        p = {**params, 'G1': g1g2[0], 'G2': g1g2[1]}
        edge_f, image_f = nets.generate(p, aux, z_in)
        sg = jax.lax.stop_gradient
        joint_edge = jnp.concatenate([edge_f, sg(image_f)], axis=2)
        joint_image = jnp.concatenate([sg(edge_f), image_f], axis=2)
        _, fake_joint_e = nets.discriminate('D', p, aux, joint_edge)
        _, fake_joint_i = nets.discriminate('D', p, aux, joint_image)
        # per-critic g-losses are standalone reference tensors
        # (joint/image/edge_dis_gloss, models/edgegan.py:286,295,309) —
        # reported unweighted; the stop-gradient doesn't change values,
        # so fake_joint_e == the reference's fakejoint_dis_output.
        sub = {'joint_dis_gloss': L.generator_ganloss(fake_joint_e)}
        edge_gloss = config.joint_dweight * sub['joint_dis_gloss']
        image_gloss = config.joint_dweight * L.generator_ganloss(fake_joint_i)
        if config.use_edge_discriminator:
            _, fake_edge = nets.discriminate(
                'D_patch3', p, aux,
                resize(edge_f, (config.edge_dis_size,) * 2))
            sub['edge_dis_gloss'] = L.generator_ganloss(fake_edge)
            edge_gloss += config.edge_dweight * sub['edge_dis_gloss']
        if config.use_image_discriminator:
            _, fake_image = nets.discriminate(
                'D_patch2', p, aux,
                resize(image_f, (config.image_dis_size,) * 2))
            sub['image_dis_gloss'] = L.generator_ganloss(fake_image)
            image_gloss += config.image_dweight * sub['image_dis_gloss']
        loss_g_ac = 0.0
        if config.multiclasses:
            _, _, fake_logits = nets.classify(p, aux, image_f)
            loss_g_ac = 0.5 * jnp.mean(L._sparse_ce(fake_logits, labels))
            image_gloss += loss_g_ac
        return edge_gloss + image_gloss, (edge_gloss, image_gloss, loss_g_ac,
                                          sub)

    def update_generators(params, aux, opt_states, z_in, images, labels):
        """One g_optim run (both generators, models/edgegan.py:117-124):
        one shared forward, one backward."""
        (_, ls), grads = jax.value_and_grad(g_losses, has_aux=True)(
            (params['G1'], params['G2']), params, aux, z_in, images, labels)
        new_g1, opt_states = update('g1', grads[0], opt_states, params['G1'])
        new_g2, opt_states = update('g2', grads[1], opt_states, params['G2'])
        params = {**params, 'G1': new_g1, 'G2': new_g2}
        return params, opt_states, ls

    def record_g(metrics, ls):
        eg, ig, gac, sub = ls
        metrics['edge_gloss'], metrics['image_gloss'] = eg, ig
        metrics['loss_g_ac'] = gac
        metrics.update(sub)

    def train_step(state: TrainState, images, z, rng) -> Tuple[TrainState,
                                                               Dict]:
        """images: [B, H, W, 3] in [-1, 1]; z: [B, z_dim(+1)]."""
        params, aux, opt_states = state.params, state.aux, state.opt_states
        metrics = {}
        rngs = {name: jax.random.fold_in(rng, i) for i, name in enumerate(
            ['gp_joint', 'gp_image', 'gp_edge', 'noise_e'])}

        if not config.host_z:
            # z latents on device (round 5): ONE global N(0,1) draw from
            # the step rng — no per-step host draw or f32 transfer (the
            # round-3 realdata bench attributed the last 8% of input-
            # pipeline cost to exactly that, BASELINE.md). The incoming
            # `z` carries only the class-id column ([B,1] multiclass,
            # [B,0] single-class); concatenation reproduces the
            # reference's z||class layout (models/edgegan.py:188-197;
            # reference draws z on host, dataset.py:72-73). Under DP the
            # draw is sharding-invariant, so every process computes the
            # same global latents and uses its own batch rows.
            z_noise = jax.random.normal(jax.random.fold_in(rng, 8),
                                        (z.shape[0], z_dim), jnp.float32)
            z = jnp.concatenate([z_noise, z.astype(jnp.float32)], axis=1)

        labels = (z[:, -1].astype(jnp.int32) if config.multiclasses else None)
        z_target32 = z[:, :z_dim] if config.multiclasses else z
        images = images.astype(compute_dtype)
        z = z.astype(compute_dtype)
        edge_real, image_real = split_pair(images)
        z_in = nets.gen_input(z)

        # One generator forward shared by all D-side groups — G params do
        # not change until group 5, so this equals the reference's
        # per-sess.run recomputation.
        edge_fake, image_fake = nets.generate(params, aux, z_in)
        joint_fake = jnp.concatenate([edge_fake, image_fake], axis=2)
        if config.use_image_discriminator:
            resized_image_real = resize(image_real,
                                        (config.image_dis_size,) * 2)
            resized_image_fake = resize(image_fake,
                                        (config.image_dis_size,) * 2)
        if config.use_edge_discriminator:
            resized_edge_real = resize(edge_real, (config.edge_dis_size,) * 2)
            resized_edge_fake = resize(edge_fake, (config.edge_dis_size,) * 2)

        # ---- groups 1-3: the three critics (WGAN + GP) ----
        def critic_loss(d_params, name, fake, real, gp_rng):
            p = {**params, name: d_params}
            _, real_logit = nets.discriminate(name, p, aux, real)
            _, fake_logit = nets.discriminate(name, p, aux, fake)
            loss = L.discriminator_ganloss(fake_logit, real_logit)
            gp = L.gradient_penalty(
                lambda x: nets.discriminate(name, p, aux, x),
                fake, real, gp_rng, config.lambda_gp)
            return loss + gp

        loss_d, grads = jax.value_and_grad(critic_loss)(
            params['D'], 'D', joint_fake, images, rngs['gp_joint'])
        new_d, opt_states = update('d', grads, opt_states, params['D'])
        params = {**params, 'D': new_d}
        metrics['joint_dis_dloss'] = loss_d

        if config.use_image_discriminator:
            loss_d, grads = jax.value_and_grad(critic_loss)(
                params['D_patch2'], 'D_patch2', resized_image_fake,
                resized_image_real, rngs['gp_image'])
            new_d, opt_states = update('d_patch2', grads, opt_states,
                                       params['D_patch2'])
            params = {**params, 'D_patch2': new_d}
            metrics['image_dis_dloss'] = loss_d

        if config.use_edge_discriminator:
            loss_d, grads = jax.value_and_grad(critic_loss)(
                params['D_patch3'], 'D_patch3', resized_edge_fake,
                resized_edge_real, rngs['gp_edge'])
            new_d, opt_states = update('d_patch3', grads, opt_states,
                                       params['D_patch3'])
            params = {**params, 'D_patch3': new_d}
            metrics['edge_dis_dloss'] = loss_d

        # ---- group 4: classifier on the real photo half (focal CE) ----
        if config.multiclasses:
            def c_loss(c_params):
                p = {**params, 'D2': c_params}
                _, _, real_logits = nets.classify(p, aux, image_real)
                _, loss_d_ac = L.get_acgan_loss_focal(
                    real_logits, labels, real_logits, labels,
                    config.num_classes)
                return loss_d_ac

            loss_d_ac, grads = jax.value_and_grad(c_loss)(params['D2'])
            new_c, opt_states = update('d2', grads, opt_states, params['D2'])
            params = {**params, 'D2': new_c}
            metrics['loss_d_ac'] = loss_d_ac

            if config.update_sn:
                # "fixed" mode (vs the reference's frozen-u quirk Q3):
                # advance every spectral-norm u by one power iteration
                # per step and thread the new state through.
                _, new_vars = nets.classifier.apply(
                    {'params': params['D2'], **aux['D2']}, image_real,
                    True, mutable=['spectral'])
                aux = {**aux, 'D2': {**aux['D2'],
                                     'spectral': new_vars['spectral']}}

        if config.update_mode == 'faithful':
            # ---- group 5: generators (first update, quirk Q5) ----
            params, opt_states, ls = update_generators(
                params, aux, opt_states, z_in, images, labels)
            record_g(metrics, ls)

            # ---- group 6: encoder (z-reconstruction L1) ----
            edge_fake2, _ = nets.generate(params, aux, z_in)  # new G1

            def e_loss(e_params):
                p = {**params, 'E': e_params}
                z_recon, _, _ = nets.encode(p, aux, edge_fake2,
                                            rngs['noise_e'])
                return L.l1loss(z_target32, z_recon, config.stage1_zl_loss)

            zl_loss, grads = jax.value_and_grad(e_loss)(params['E'])
            new_e, opt_states = update('e', grads, opt_states, params['E'])
            params = {**params, 'E': new_e}
            metrics['zl_loss'] = zl_loss

            # ---- group 7: generators again (same optimizer slots) ----
            params, opt_states, ls = update_generators(
                params, aux, opt_states, z_in, images, labels)
            record_g(metrics, ls)
        else:  # 'fast': one snapshot, single generator/encoder update
            params, opt_states, ls = update_generators(
                params, aux, opt_states, z_in, images, labels)
            record_g(metrics, ls)

            def e_loss(e_params):
                p = {**params, 'E': e_params}
                z_recon, _, _ = nets.encode(p, aux, edge_fake,
                                            rngs['noise_e'])
                return L.l1loss(z_target32, z_recon, config.stage1_zl_loss)

            zl_loss, grads = jax.value_and_grad(e_loss)(params['E'])
            new_e, opt_states = update('e', grads, opt_states, params['E'])
            params = {**params, 'E': new_e}
            metrics['zl_loss'] = zl_loss

        if config.reference_metrics:
            # Reference logging protocol: every reported loss is
            # re-evaluated AFTER all optimizer groups have applied
            # (models/edgegan.py:464-486, five separate .eval() calls on
            # the post-update graph), with the GP blend's alpha freshly
            # resampled per eval. critic_loss/g_losses close over
            # `params`, which now holds the post-step values.
            ev = {n: jax.random.fold_in(rng, 16 + i) for i, n in enumerate(
                ['gp_joint', 'gp_image', 'gp_edge'])}
            edge_f, image_f = nets.generate(params, aux, z_in)
            joint_f = jnp.concatenate([edge_f, image_f], axis=2)
            metrics['joint_dis_dloss'] = critic_loss(
                params['D'], 'D', joint_f, images, ev['gp_joint'])
            if config.use_image_discriminator:
                metrics['image_dis_dloss'] = critic_loss(
                    params['D_patch2'], 'D_patch2',
                    resize(image_f, (config.image_dis_size,) * 2),
                    resized_image_real, ev['gp_image'])
            if config.use_edge_discriminator:
                metrics['edge_dis_dloss'] = critic_loss(
                    params['D_patch3'], 'D_patch3',
                    resize(edge_f, (config.edge_dis_size,) * 2),
                    resized_edge_real, ev['gp_edge'])
            _, ls = g_losses(
                (params['G1'], params['G2']), params, aux, z_in, images,
                labels)
            record_g(metrics, ls)

        new_state = state.replace(step=state.step + 1, params=params,
                                  aux=aux, opt_states=opt_states)
        return new_state, metrics

    return train_step

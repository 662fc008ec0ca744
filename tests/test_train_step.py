"""Fixed-seed single-step training tests: loss finiteness and parameter
movement per optimizer group (SURVEY.md §4 strategy, §2.3 grouping)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgegan_tpu.core.config import Config
from edgegan_tpu.train import Networks, create_train_state, make_train_step


def tiny_cfg(**kw):
    base = dict(batch_size=4, num_classes=3, z_dim=8,
                output_height=32, output_width=64,
                input_height=32, input_width=64,
                image_dis_size=32, edge_dis_size=32)
    base.update(kw)
    return Config(**base).derive('train')


def make_batch(cfg):
    b = cfg.batch_size
    images = jnp.asarray(np.random.RandomState(0).randn(
        b, cfg.output_height, cfg.output_width, 3).astype(np.float32)
        .clip(-1, 1))
    zdim = cfg.z_feed_width()  # full z (host_z) or class column (device z)
    z = np.random.RandomState(1).randn(b, zdim).astype(np.float32)
    if cfg.multiclasses:
        z[:, -1] = np.random.RandomState(2).randint(0, cfg.num_classes, b)
    return images, jnp.asarray(z)


@pytest.fixture(scope='module')
def multiclass_run():
    cfg = tiny_cfg()
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    step = jax.jit(make_train_step(nets, cfg))
    images, z = make_batch(cfg)
    new_state, metrics = step(state, images, z, jax.random.PRNGKey(3))
    jax.block_until_ready(metrics)
    return cfg, state, new_state, metrics


def test_all_losses_finite(multiclass_run):
    _, _, _, metrics = multiclass_run
    expected = {'joint_dis_dloss', 'joint_dis_gloss',
                'image_dis_dloss', 'image_dis_gloss',
                'edge_dis_dloss', 'edge_dis_gloss',
                'loss_d_ac', 'edge_gloss', 'image_gloss', 'loss_g_ac',
                'zl_loss'}
    assert expected == set(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_every_group_moves(multiclass_run):
    _, state, new_state, _ = multiclass_run
    for name in ['G1', 'G2', 'D', 'D_patch2', 'D_patch3', 'D2', 'E']:
        before = jax.tree.leaves(state.params[name])
        after = jax.tree.leaves(new_state.params[name])
        moved = max(float(jnp.max(jnp.abs(a - b)))
                    for a, b in zip(before, after))
        assert moved > 0, f'{name} did not move'


def test_step_counter(multiclass_run):
    _, state, new_state, _ = multiclass_run
    assert int(state.step) == 0 and int(new_state.step) == 1


def test_deterministic(multiclass_run):
    cfg, state, new_state, metrics = multiclass_run
    nets = Networks(cfg)
    step = jax.jit(make_train_step(nets, cfg))
    images, z = make_batch(cfg)
    _, metrics2 = step(state, images, z, jax.random.PRNGKey(3))
    for k in metrics:
        np.testing.assert_allclose(float(metrics[k]), float(metrics2[k]),
                                   rtol=1e-6)


def test_singleclass_no_classifier():
    cfg = tiny_cfg(multiclasses=False)
    assert cfg.num_classes is None
    nets = Networks(cfg)
    assert nets.classifier is None
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    assert 'D2' not in state.params
    step = jax.jit(make_train_step(nets, cfg))
    images, z = make_batch(cfg)
    _, metrics = step(state, images, z, jax.random.PRNGKey(3))
    assert 'loss_d_ac' not in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v))


def test_fast_mode_runs():
    cfg = tiny_cfg(update_mode='fast')
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    step = jax.jit(make_train_step(nets, cfg))
    images, z = make_batch(cfg)
    new_state, metrics = step(state, images, z, jax.random.PRNGKey(3))
    for k, v in metrics.items():
        assert np.isfinite(float(v))
    for name in new_state.params:
        before = jax.tree.leaves(state.params[name])
        after = jax.tree.leaves(new_state.params[name])
        assert any(not np.allclose(a, b) for a, b in zip(before, after)), name


def test_reference_metrics_protocol():
    """--reference_metrics re-evaluates reported losses AFTER all
    optimizer groups (reference models/edgegan.py:464-486), so they must
    differ from the inline per-group values while staying finite."""
    cfg_in = tiny_cfg()
    cfg_ref = tiny_cfg(reference_metrics=True)
    images, z = make_batch(cfg_in)
    out = {}
    for key, cfg in [('inline', cfg_in), ('ref', cfg_ref)]:
        nets = Networks(cfg)
        state = create_train_state(nets, jax.random.PRNGKey(0),
                                   cfg.learning_rate)
        step = jax.jit(make_train_step(nets, cfg))
        new_state, metrics = step(state, images, z, jax.random.PRNGKey(3))
        out[key] = (new_state, {k: float(v) for k, v in metrics.items()})
    assert set(out['inline'][1]) == set(out['ref'][1])
    for k, v in out['ref'][1].items():
        assert np.isfinite(v), (k, v)
    # identical parameter trajectory (logging-only difference) ...
    for a, b in zip(jax.tree.leaves(out['inline'][0].params),
                    jax.tree.leaves(out['ref'][0].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ... but post-apply loss evaluations differ from inline ones
    assert any(abs(out['inline'][1][k] - out['ref'][1][k]) > 1e-9
               for k in ('joint_dis_dloss', 'edge_gloss', 'image_gloss'))


def test_host_z_mode_consumes_fed_latents():
    """--host_z true (the reference's dataset.py:72-73 semantics): the
    step consumes the fed z verbatim, so changing the fed latents moves
    the losses. Under the device-z default the latents come from the
    step rng instead, so the class column alone doesn't pin them."""
    cfg = tiny_cfg(host_z=True)
    assert cfg.z_feed_width() == cfg.z_dim + 1
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    step = jax.jit(make_train_step(nets, cfg))
    images, z = make_batch(cfg)
    _, m1 = step(state, images, z, jax.random.PRNGKey(3))
    # same feed, same rng -> identical
    _, m1b = step(state, images, z, jax.random.PRNGKey(3))
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m1b[k]), rtol=1e-6)
    # different latents (same class column) -> losses move
    z2 = np.array(z)
    z2[:, :-1] = z2[:, :-1] + 0.5
    _, m2 = step(state, images, jnp.asarray(z2), jax.random.PRNGKey(3))
    assert any(abs(float(m1[k]) - float(m2[k])) > 1e-7 for k in m1)


def test_device_z_latents_come_from_rng():
    """Device-z default: with identical feeds, changing only the step
    rng changes the drawn latents (zl_loss depends on them directly)."""
    cfg = tiny_cfg()
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    step = jax.jit(make_train_step(nets, cfg))
    images, z = make_batch(cfg)
    _, m1 = step(state, images, z, jax.random.PRNGKey(3))
    _, m2 = step(state, images, z, jax.random.PRNGKey(4))
    assert abs(float(m1['zl_loss']) - float(m2['zl_loss'])) > 1e-7


def test_rmsprop_matches_tf_semantics():
    # TF1 RMSProp: ms init 1.0, decay 0.9, eps 1e-10 inside sqrt.
    from edgegan_tpu.train.state import make_optimizer
    tx = make_optimizer(0.1)
    params = {'w': jnp.array([1.0, 2.0])}
    grads = {'w': jnp.array([0.5, -1.0])}
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    g = np.array([0.5, -1.0])
    ms = 0.9 * 1.0 + 0.1 * g ** 2
    expected = -0.1 * g / np.sqrt(ms + 1e-10)
    np.testing.assert_allclose(updates['w'], expected, rtol=1e-5)


def test_update_sn_advances_u():
    """--update_sn true must advance the classifier's spectral-norm u
    vectors each step; default (quirk Q3) keeps them frozen."""
    for flag, should_move in [(False, False), (True, True)]:
        cfg = tiny_cfg(update_sn=flag)
        nets = Networks(cfg)
        state = create_train_state(nets, jax.random.PRNGKey(0),
                                   cfg.learning_rate)
        step = jax.jit(make_train_step(nets, cfg))
        images, z = make_batch(cfg)
        new_state, _ = step(state, images, z, jax.random.PRNGKey(3))
        before = jax.tree.leaves(state.aux['D2']['spectral'])
        after = jax.tree.leaves(new_state.aux['D2']['spectral'])
        moved = any(not np.allclose(a, b) for a, b in zip(before, after))
        assert moved == should_move, (flag, moved)


def test_jit_init_matches_eager_init():
    """create_train_state's jitted build (round 5: one compiled program
    instead of ~470 s of eager per-op dispatch on the remote TPU
    backend) must produce the same tree structure/shapes/dtypes as the
    eager path and the same values up to fusion rounding (measured
    <2e-6 max abs on the full-size config)."""
    cfg = tiny_cfg()
    nets = Networks(cfg)
    rng = jax.random.PRNGKey(0)
    jitted = create_train_state(nets, rng, cfg.learning_rate)
    eager = create_train_state(nets, rng, cfg.learning_rate,
                               jit_init=False)
    jleaves, jdef = jax.tree_util.tree_flatten_with_path(
        jax.device_get(jitted))
    eleaves, edef = jax.tree_util.tree_flatten_with_path(
        jax.device_get(eager))
    assert jdef == edef
    assert [p for p, _ in jleaves] == [p for p, _ in eleaves]
    for (path, a), (_, b) in zip(jleaves, eleaves):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape and a.dtype == b.dtype, path
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(
                a, b, atol=1e-5, rtol=1e-5,
                err_msg=jax.tree_util.keystr(path))
        else:
            np.testing.assert_array_equal(a, b, err_msg=str(path))

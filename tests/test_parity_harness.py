"""End-to-end exercise of the parity harness (scripts/parity_check.py)
on an exported-then-imported tree (VERDICT r2 #5): the import half must
accept a real TF-named npz of the full 14-class architecture, feed the
test CLI, and the compare half must verdict on real image files.

Without TF/network access the golden outputs are our own outputs — the
point is that every moving part of the harness (npz -> Orbax checkpoint
-> test-CLI restore -> image comparison) runs for real, so the only
remaining unknown against the released checkpoint is the TF variable
VALUES, not the machinery.
"""
import glob
import os
import shutil
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), 'scripts'))

REF_TEST = '/root/reference/images/dataset_example/test'


@pytest.mark.slow
def test_parity_harness_end_to_end(tmp_path, capsys):
    import parity_check

    from edgegan_tpu import convert
    from edgegan_tpu.cli import test as cli_test
    from edgegan_tpu.core.config import Config
    from edgegan_tpu.train.networks import Networks

    config = Config().derive('train')  # released-checkpoint architecture
    nets = Networks(config)
    params, aux = nets.init(jax.random.PRNGKey(0))
    npz = str(tmp_path / 'export.npz')
    convert.export_tf_npz(params, aux, config, npz)

    outputs = str(tmp_path / 'outputs' / 'edgegan')
    parity_check.main(['import', '--npz', npz, '--outputs', outputs])
    assert os.path.isdir(os.path.join(outputs, 'checkpoints',
                                      'EdgeGAN-Model-100002'))

    # the reference's own 4 test pairs through the real test CLI
    dataroot = str(tmp_path / 'data')
    srcs = sorted(glob.glob(os.path.join(REF_TEST, '*.png')))
    assert srcs
    for i, s in enumerate(srcs):
        d = os.path.join(dataroot, 'class14', 'test', str(i % 3))
        os.makedirs(d, exist_ok=True)
        shutil.copy(s, d)
    cli_test.main(['--dataroot', dataroot,
                   '--name', 'edgegan',
                   '--outputsroot', str(tmp_path / 'outputs')])
    out_dir = os.path.join(outputs, 'test_output', 'class14')
    pngs = glob.glob(os.path.join(out_dir, '*', '*.png'))
    assert len(pngs) == len(srcs), pngs

    # compare against itself: machinery must report exact parity
    capsys.readouterr()
    parity_check.main(['compare', '--ours', out_dir, '--golden', out_dir])
    out = capsys.readouterr().out
    assert 'PARITY PASS' in out, out[-2000:]
    assert 'WORST max abs diff: 0.0' in out, out[-2000:]

"""End-to-end CLI test: train -> checkpoint -> resume artifacts -> test.

Covers the reference call stacks `python -m edgegan.train` main
(/root/reference/edgegan/train.py:109-134) and `python -m edgegan.test`
main (test.py:115-126) through the rebuilt entry points, in-process on
the virtual 8-device CPU mesh (conftest). This is the regression net
for the training-loop glue (resume counter, save cadence quirk Q9,
prefetch loader, summary writer) that unit tests can't see.
"""
import glob
import json
import os

import numpy as np
import pytest
from PIL import Image

from edgegan_tpu.cli import test as cli_test
from edgegan_tpu.cli import train as cli_train

NUM_CLASSES = 3
H, W = 32, 64  # side-by-side sketch|photo pairs, edge = left half


def synth_dataset(root, n_train=8, n_test=2):
    rng = np.random.RandomState(7)
    for phase, n in [('train', n_train), ('test', n_test)]:
        for cls in range(NUM_CLASSES):
            d = os.path.join(root, 'ds', phase, str(cls))
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(d, f'{i:03d}.png'))


def common_flags(dataroot, outputs):
    return [
        '--dataroot', dataroot, '--dataset', 'ds',
        '--num_classes', str(NUM_CLASSES), '--z_dim', '8',
        '--output_height', str(H), '--output_width', str(W),
        '--input_height', str(H), '--input_width', str(W),
        '--image_dis_size', '32', '--edge_dis_size', '32',
        '--name', 'e2e', '--outputsroot', outputs,
    ]


@pytest.mark.slow
def test_train_then_test_cli(tmp_path, capsys):
    dataroot = str(tmp_path / 'data')
    outputs = str(tmp_path / 'outputs')
    synth_dataset(dataroot)

    # 8 train images x 3 classes / batch 8 = 3 steps/epoch x 2 epochs.
    # Counter starts at 1 and increments after the step (quirk Q9), so
    # 6 steps visit counters 2..7 and save at counter % 3 == 2.
    cli_train.main(common_flags(dataroot, outputs) + [
        '--batch_size', '8', '--epoch', '2',
        '--save_checkpoint_frequency', '3'])

    # flags.json dump (reference train.py:100-107)
    flags = json.load(open(os.path.join(outputs, 'e2e', 'flags.json')))
    assert flags['dataset'] == 'ds' and flags['batch_size'] == 8

    # checkpoints land at the Q9 cadence with the reference layout
    ckpt_dir = os.path.join(outputs, 'e2e', 'checkpoints')
    names = sorted(os.listdir(ckpt_dir))
    assert names == ['EdgeGAN-Model-2', 'EdgeGAN-Model-5'], names

    # metrics.jsonl: one line per step, all losses finite
    lines = [json.loads(line) for line in
             open(os.path.join(outputs, 'e2e', 'logs', 'metrics.jsonl'))]
    assert len(lines) == 6
    assert [m['step'] for m in lines] == list(range(2, 8))
    for m in lines:
        for k, v in m.items():
            assert np.isfinite(v), (k, m)
    assert {'joint_dis_dloss', 'image_dis_dloss', 'edge_dis_dloss',
            'loss_d_ac', 'edge_gloss', 'image_gloss', 'loss_g_ac',
            'zl_loss'} <= set(lines[0])

    # TensorBoard event files written
    assert glob.glob(os.path.join(outputs, 'e2e', 'logs', 'events.*'))

    # quirk Q11: stdout prints 2x the summed critic losses
    # (reference models/edgegan.py:484-486)
    import re
    epoch_lines = [line for line in capsys.readouterr().out.splitlines()
                   if line.startswith('Epoch:')]
    assert len(epoch_lines) == 6
    printed = float(re.search(r'joint_dis_dloss: (-?[\d.]+)',
                              epoch_lines[-1]).group(1))
    last = lines[-1]
    expected = 2 * (last['joint_dis_dloss'] + last['image_dis_dloss']
                    + last['edge_dis_dloss'])
    assert abs(printed - expected) < 1e-4, (printed, expected)

    # ---- test CLI: restores E/G1/G2 from the latest checkpoint ----
    cli_test.main(common_flags(dataroot, outputs))

    out_root = os.path.join(outputs, 'e2e', 'test_output', 'ds')
    for cls in range(NUM_CLASSES):
        pngs = sorted(glob.glob(os.path.join(out_root, str(cls), '*.png')))
        assert len(pngs) == 2, (cls, pngs)
        for p in pngs:
            img = Image.open(p)
            # 'full' combination: input(W) | outputL(W/2) | outputR(W/2)
            assert img.size == (2 * W, H), (p, img.size)

    # ---- batched pipelined mode (--test_batch_size): same file set,
    # written through the dispatch-ahead + threaded-save path ----
    import shutil
    shutil.rmtree(out_root)
    cli_test.main(common_flags(dataroot, outputs)
                  + ['--test_batch_size', '4'])
    for cls in range(NUM_CLASSES):
        pngs = sorted(glob.glob(os.path.join(out_root, str(cls), '*.png')))
        assert len(pngs) == 2, (cls, pngs)
        for p in pngs:
            assert Image.open(p).size == (2 * W, H), p


@pytest.mark.slow
def test_nan_policy_halt(tmp_path, monkeypatch):
    """--nan_policy halt: first non-finite metric saves a checkpoint
    and exits 1 (the reference silently trains on NaN forever)."""
    import jax.numpy as jnp
    from edgegan_tpu.cli import train as cli_train

    real_make = cli_train.make_train_step

    def nan_make(nets, config):
        real = real_make(nets, config)

        def stepfn(state, images, z, rng):
            new_state, metrics = real(state, images, z, rng)
            return new_state, {k: v * jnp.nan for k, v in metrics.items()}
        return stepfn

    monkeypatch.setattr(cli_train, 'make_train_step', nan_make)
    dataroot = str(tmp_path / 'data')
    outputs = str(tmp_path / 'outputs')
    synth_dataset(dataroot, n_train=8, n_test=1)
    flags = common_flags(dataroot, outputs) + [
        '--batch_size', '8', '--epoch', '1',
        '--save_checkpoint_frequency', '1000000',
        '--nan_policy', 'halt']
    with pytest.raises(SystemExit) as exc:
        cli_train.main(flags)
    assert exc.value.code == 1
    # the metrics pull runs one step behind the dispatch (pipelined
    # loop), so the NaN at step 2 is detected after step 3 was already
    # dispatched; the halt checkpoint is labeled with the counter the
    # STATE is actually at (3), not the NaN step — and lives in the
    # -halt namespace, invisible to resume (round-4 VERDICT weak #2).
    # The PLAIN ladder holds only the finite counter-2 cadence save
    # (quirk Q9 fires at counter 2 for any frequency).
    from edgegan_tpu import checkpoint as ckpt_mod
    d = os.path.join(outputs, 'e2e', 'checkpoints')
    assert ckpt_mod.latest_step(d) == 2, os.listdir(d)
    assert ckpt_mod.halt_steps(d) == [3], os.listdir(d)

    # bare relaunch: resumes from the FINITE counter-2 checkpoint (not
    # the halt state), halts again, and replaces the halt entry without
    # ever GC'ing the finite ladder
    with pytest.raises(SystemExit) as exc:
        cli_train.main(flags)
    assert exc.value.code == 1
    assert ckpt_mod.latest_step(d) == 2, os.listdir(d)
    assert ckpt_mod.halt_steps(d) == [4], os.listdir(d)


@pytest.mark.slow
def test_sigterm_saves_checkpoint(tmp_path):
    """Preemption safety: SIGTERM mid-run saves a checkpoint at the
    CURRENT counter and exits 0 (the reference can lose up to
    save_checkpoint_frequency steps on a kill)."""
    import signal
    import subprocess
    import sys
    import time

    dataroot = str(tmp_path / 'data')
    outputs = str(tmp_path / 'outputs')
    synth_dataset(dataroot, n_train=8, n_test=1)
    script = (
        "import os, sys\n"
        "sys.path.insert(0, %r)\n"
        "os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + "
        "' --xla_force_host_platform_device_count=8'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from edgegan_tpu.cli.train import main\n"
        "main(%r)\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         common_flags(dataroot, outputs) + [
             '--batch_size', '8', '--epoch', '1000',
             '--save_checkpoint_frequency', '1000000'])
    env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
    proc = subprocess.Popen([sys.executable, '-c', script], env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    metrics_path = os.path.join(outputs, 'e2e', 'logs', 'metrics.jsonl')
    deadline = time.time() + 840
    try:
        # wait until at least 2 steps are logged, then request stop
        while time.time() < deadline:
            if (os.path.exists(metrics_path)
                    and len(open(metrics_path).readlines()) >= 2):
                break
            if proc.poll() is not None:
                raise AssertionError(proc.communicate()[0][-3000:])
            time.sleep(2)
        else:
            raise AssertionError('training never started stepping')
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out[-3000:]
    assert 'Caught signal' in out
    # counter % freq == 2 fires at counter 2 for ANY freq (quirk Q9), so
    # a cadence checkpoint exists too; the signal save must land at the
    # exact counter of the last completed step.
    last_step = json.loads(open(metrics_path).readlines()[-1])['step']
    from edgegan_tpu import checkpoint as ckpt_mod
    d = os.path.join(outputs, 'e2e', 'checkpoints')
    assert ckpt_mod.latest_step(d) == last_step > 2, (
        os.listdir(d), last_step)


def _spawn_mp_workers(dataroot, outputs, extra=()):
    """Launch the real train CLI as 2 jax.distributed processes."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), '_mp_train_worker.py')
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
        env.update(JAX_COORDINATOR_ADDRESS=f'localhost:{port}',
                   JAX_NUM_PROCESSES='2', JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, worker, dataroot, outputs, *extra], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    return procs


@pytest.mark.slow
def test_two_process_train_cli(tmp_path):
    """The REAL train CLI under 2 jax.distributed processes: sharded
    dataset decode, put_global batches, process-0 writes (incl. the TB
    extras forward over the global batch), collective Orbax saves
    (SURVEY §2.4 multi-host component, end to end)."""
    dataroot = str(tmp_path / 'data')
    outputs = str(tmp_path / 'outputs')
    synth_dataset(dataroot, n_train=8, n_test=1)
    procs = _spawn_mp_workers(dataroot, outputs)
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    # process 0 logs; process 1 must stay silent on host artifacts
    assert 'Epoch:' in outs[0]
    assert 'Epoch:' not in outs[1]
    lines = [json.loads(line) for line in
             open(os.path.join(outputs, 'mp', 'logs', 'metrics.jsonl'))]
    # 24 files / global batch 8 = 3 steps, logged once (not twice)
    assert [m['step'] for m in lines] == [2, 3, 4]
    for m in lines:
        for k, v in m.items():
            assert np.isfinite(v), (k, m)
    ckpts = sorted(os.listdir(os.path.join(outputs, 'mp', 'checkpoints')))
    assert ckpts == ['EdgeGAN-Model-2'], ckpts


@pytest.mark.slow
def test_two_process_resume(tmp_path):
    """Restart-from-checkpoint under jax.distributed: collective Orbax
    restore + counter continuation across 2 processes (the multi-host
    analogue of test_train_resumes_from_checkpoint)."""
    dataroot = str(tmp_path / 'data')
    outputs = str(tmp_path / 'outputs')
    synth_dataset(dataroot, n_train=8, n_test=1)
    for launch in range(2):
        procs = _spawn_mp_workers(dataroot, outputs)
        outs = [p.communicate(timeout=1200)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, (launch, out[-4000:])
    assert 'Load SUCCESS' in outs[0]
    metrics_path = os.path.join(outputs, 'mp', 'logs', 'metrics.jsonl')
    lines = [json.loads(line) for line in open(metrics_path)]
    # first launch logs steps 2,3,4 (save at 2); resumed_at marker;
    # resume continues 3,4,5 (the resume contract, utils/metrics_io.py)
    assert [m.get('step') for m in lines] == [2, 3, 4, None, 3, 4, 5]
    for m in lines:
        for k, v in m.items():
            assert np.isfinite(v), (k, m)
    from edgegan_tpu.utils import read_metrics, read_resume_markers
    assert read_resume_markers(metrics_path) == [2]
    assert [m['step'] for m in read_metrics(metrics_path)] == [2, 3, 4, 5]


@pytest.mark.slow
def test_two_process_nan_halt(tmp_path, monkeypatch):
    """nan_policy=halt under jax.distributed: metrics are replicated, so
    every process takes the same halt decision, enters the COLLECTIVE
    checkpoint save, and exits 1 (round 2 left halt silently inert in
    multi-process runs — ADVICE r2)."""
    monkeypatch.setenv('MP_TEST_NAN', '1')
    dataroot = str(tmp_path / 'data')
    outputs = str(tmp_path / 'outputs')
    synth_dataset(dataroot, n_train=8, n_test=1)
    procs = _spawn_mp_workers(
        dataroot, outputs,
        extra=('--nan_policy', 'halt',
               '--save_checkpoint_frequency', '1000000'))
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 1, out[-4000:]
    assert 'nan_policy=halt' in outs[0]
    assert 'nan_policy=halt' not in outs[1]  # p0-only print
    from edgegan_tpu import checkpoint as ckpt_mod
    d = os.path.join(outputs, 'mp', 'checkpoints')
    # one step behind the dispatch: NaN at step 2 halts with the state
    # (and halt-namespace label) at counter 3 — see test_nan_policy_halt.
    # The plain ladder holds the finite counter-2 cadence save only.
    assert ckpt_mod.latest_step(d) == 2, os.listdir(d)
    assert ckpt_mod.halt_steps(d) == [3], os.listdir(d)


@pytest.mark.slow
def test_two_process_sigterm_saves_checkpoint(tmp_path):
    """Preemption under jax.distributed: SIGTERM to ONE process must
    propagate through the coordination service's preemption sync point
    so BOTH processes stop at the same step and enter the collective
    checkpoint save (no one-sided deadlock)."""
    import signal
    import time

    dataroot = str(tmp_path / 'data')
    outputs = str(tmp_path / 'outputs')
    synth_dataset(dataroot, n_train=8, n_test=1)
    procs = _spawn_mp_workers(
        dataroot, outputs,
        extra=('--epoch', '100000', '--save_checkpoint_frequency',
               '1000000', '--summary_frequency', '1000000'))
    metrics_path = os.path.join(outputs, 'mp', 'logs', 'metrics.jsonl')
    deadline = time.time() + 900
    try:
        while time.time() < deadline:
            if (os.path.exists(metrics_path)
                    and len(open(metrics_path).readlines()) >= 2):
                break
            for p in procs:
                if p.poll() is not None:
                    raise AssertionError(p.communicate()[0][-4000:])
            time.sleep(2)
        else:
            raise AssertionError('mp training never started stepping')
        # signal the NON-zero process: only the sync protocol can tell
        # process 0 to stop
        procs[1].send_signal(signal.SIGTERM)
        outs = [p.communicate(timeout=600)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    assert 'Caught signal' in outs[0]
    from edgegan_tpu import checkpoint as ckpt_mod
    last_step = json.loads(open(metrics_path).readlines()[-1])['step']
    d = os.path.join(outputs, 'mp', 'checkpoints')
    assert ckpt_mod.latest_step(d) == last_step, (os.listdir(d), last_step)


@pytest.mark.slow
def test_train_resumes_from_checkpoint(tmp_path):
    """Second train invocation must pick up the saved counter
    (reference models/edgegan.py:447-453)."""
    dataroot = str(tmp_path / 'data')
    outputs = str(tmp_path / 'outputs')
    synth_dataset(dataroot, n_train=8, n_test=1)
    flags = common_flags(dataroot, outputs) + [
        '--batch_size', '8', '--epoch', '1',
        '--save_checkpoint_frequency', '3']
    cli_train.main(flags)  # counters 2,3,4 -> saves at 2
    cli_train.main(flags)  # resumes at 2, runs 3 more steps
    metrics_path = os.path.join(outputs, 'e2e', 'logs', 'metrics.jsonl')
    lines = [json.loads(line) for line in open(metrics_path)]
    # raw file: first run logs steps 2,3,4; a resumed_at marker; the
    # resumed run continues 3,4,5 (appended — the resume CONTRACT,
    # utils/metrics_io.py)
    assert [m.get('step') for m in lines] == [2, 3, 4, None, 3, 4, 5]
    from edgegan_tpu.utils import read_metrics, read_resume_markers
    assert read_resume_markers(metrics_path) == [2]
    rows = read_metrics(metrics_path)
    # contract reader: unique steps, resumed run's values win
    assert [m['step'] for m in rows] == [2, 3, 4, 5]
    resumed_3 = [m for m in lines if m.get('step') == 3][-1]
    assert rows[1] == resumed_3


def test_rng_salt_selects_step_stream(tmp_path):
    """--rng_salt (round-5 divergence rescue) re-derives the per-step
    rng stream (GP alpha, encoder noise, device-z draws) without
    touching param init or data order: two fresh runs that differ only
    in salt must produce different step metrics, and the salt must land
    in flags.json so a rescued run's provenance is on disk."""
    from edgegan_tpu.cli import train as cli_train

    dataroot = str(tmp_path / 'data')
    synth_dataset(dataroot, n_train=8, n_test=1)

    def run(salt, tag):
        outputs = str(tmp_path / f'out_{tag}')
        cli_train.main(common_flags(dataroot, outputs) + [
            '--batch_size', '8', '--epoch', '1',
            '--save_checkpoint_frequency', '1000000',
            '--summary_frequency', '1000000',
            '--rng_salt', str(salt)])
        flags = json.load(open(os.path.join(outputs, 'e2e',
                                            'flags.json')))
        rows = [json.loads(l) for l in
                open(os.path.join(outputs, 'e2e', 'logs',
                                  'metrics.jsonl'))]
        rows = [r for r in rows if 'step' in r]
        return flags, rows

    flags0, rows0 = run(0, 'salt0')
    flags7, rows7 = run(7, 'salt7')
    assert flags0['rng_salt'] == 0 and flags7['rng_salt'] == 7
    assert [r['step'] for r in rows0] == [r['step'] for r in rows7]
    key = next(k for k in rows0[0] if k not in ('step', 'epoch'))
    vals0 = [r[key] for r in rows0]
    vals7 = [r[key] for r in rows7]
    assert vals0 != vals7, 'salt did not change the step-rng stream'

"""Full-size architecture under nproc=2 (VERDICT r4 #5).

Every 2-process test runs a toy config; this script runs the REAL train
CLI on the FULL-SIZE 64x128 14-class architecture as 2 jax.distributed
CPU processes (4 virtual devices each — the same 8-device 'data' mesh
the tests use), proving at full state size:

  - the AOT-compile + barrier + warm_collectives startup path
    (cli/train.py nproc>1 block) at real compile times,
  - collective ASYNC cadence saves (checkpoint.save_async) of the full
    ~40M-param state,
  - cross-process preemption: SIGTERM to the NON-zero process must
    propagate through the coordination service so both processes save
    collectively at the same step and exit 0,
  - collective resume: a relaunch restores the preemption checkpoint on
    both processes and continues.

CPU steps at this size are slow (the point is the multi-process
protocol, not throughput), so the run is sized in steps, not epochs,
and the default batch is 16 (8/process): the protocol under test —
AOT+barrier startup, collective async saves, preemption sync, resume —
depends on the ARCHITECTURE and STATE size, which are batch-free; a
full-size batch-64 CPU step measured ~1,160 s on this 1-core box vs
~290 s at batch 16, which is the difference between the run fitting
its deadlines and not.

Usage: python scripts/mp_fullsize_run.py [kill_after_steps] [outdir]
                                         [batch]
Writes <outdir>/mp_fullsize.json.
"""
import json
import os
import signal
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DATAROOT = '/tmp/edgegan_mpfs_data'
OUTPUTS = '/tmp/edgegan_mpfs_run'
NAME = 'mpfs'
NUM_CLASSES = 14
BATCH = 16  # global default; half per process (see docstring)


WORKER = r'''
import os, sys
sys.path.insert(0, {repo!r})
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4')
import jax
jax.config.update('jax_platforms', 'cpu')
from edgegan_tpu.cli.train import main
main({flags!r})
print('WORKER_DONE pid=%d' % jax.process_index(), flush=True)
'''


def spawn(flags, logdir, tag):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    procs, logs = [], []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
        env.update(JAX_COORDINATOR_ADDRESS=f'localhost:{port}',
                   JAX_NUM_PROCESSES='2', JAX_PROCESS_ID=str(pid))
        log_path = os.path.join(logdir, f'{tag}_p{pid}.log')
        logs.append(log_path)
        f = open(log_path, 'w')
        procs.append(subprocess.Popen(
            [sys.executable, '-c',
             WORKER.format(repo=repo, flags=flags)],
            env=env, stdout=f, stderr=subprocess.STDOUT, text=True))
    return procs, logs


def main():
    kill_after = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    outdir = sys.argv[2] if len(sys.argv) > 2 else 'docs'
    global BATCH
    if len(sys.argv) > 3:
        BATCH = int(sys.argv[3])

    from genquality_run import stage
    if not os.path.exists(os.path.join(DATAROOT, 'genshapes')):
        stage(DATAROOT, seed=31, train_per_class=8, test_per_class=4,
              num_classes=NUM_CLASSES)  # 112 pairs -> 7 steps/epoch @16
    import shutil
    shutil.rmtree(OUTPUTS, ignore_errors=True)
    os.makedirs(OUTPUTS, exist_ok=True)

    flags = [
        '--dataroot', DATAROOT, '--dataset', 'genshapes',
        '--num_classes', str(NUM_CLASSES),
        '--name', NAME, '--outputsroot', OUTPUTS,
        '--batch_size', str(BATCH),
        '--learning_rate', '1e-4',
        # async cadence save fires at counter 2 (quirk Q9) = full-size
        # collective save_async early in the run
        '--save_checkpoint_frequency', '5',
        '--summary_frequency', '1000000',
        '--epoch', '1000',  # run "forever"; SIGTERM ends segment 1
    ]
    metrics_path = os.path.join(OUTPUTS, NAME, 'logs', 'metrics.jsonl')

    # ---- segment 1: train until kill_after steps, then SIGTERM p1 ----
    t0 = time.time()
    procs, logs = spawn(flags, OUTPUTS, 'seg1')
    deadline = time.time() + 10800
    killed_at = None
    while time.time() < deadline:
        done = [p.poll() for p in procs]
        if all(d is not None for d in done):
            break
        n = 0
        if os.path.exists(metrics_path):
            n = sum(1 for line in open(metrics_path) if '"step"' in line)
        if n >= kill_after and killed_at is None:
            # the NON-zero process: only the coordination service's
            # preemption sync can tell process 0 to stop
            procs[1].send_signal(signal.SIGTERM)
            killed_at = n
            print(f' [kill] SIGTERM to process 1 after {n} logged steps',
                  flush=True)
        time.sleep(3)
    rcs = [p.wait(timeout=1800) for p in procs]
    seg1_wall = time.time() - t0
    out0 = open(logs[0]).read()
    assert rcs == [0, 0], (rcs, out0[-4000:],
                           open(logs[1]).read()[-4000:])
    assert 'Caught signal' in out0, out0[-4000:]
    assert ' [*] Saving checkpoints...' in out0, 'no async cadence save'

    from edgegan_tpu import checkpoint as ckpt
    d = os.path.join(OUTPUTS, NAME, 'checkpoints')
    lines = [json.loads(x) for x in open(metrics_path)]
    last_step = [r['step'] for r in lines if 'step' in r][-1]
    assert ckpt.latest_step(d) == last_step, (os.listdir(d), last_step)
    seg1_steps = len([r for r in lines if 'step' in r])

    # ---- segment 2: collective resume, run to a clean epoch end ----
    t1 = time.time()
    procs, logs = spawn([*flags[:-2], '--epoch', '1'], OUTPUTS, 'seg2')
    rcs = [p.wait(timeout=10800) for p in procs]
    seg2_wall = time.time() - t1
    out0 = open(logs[0]).read()
    assert rcs == [0, 0], (rcs, out0[-4000:],
                           open(logs[1]).read()[-4000:])
    assert ' [*] Load SUCCESS' in out0, out0[-4000:]
    lines = [json.loads(x) for x in open(metrics_path)]
    resumed = [r['resumed_at'] for r in lines if 'resumed_at' in r]
    assert resumed == [last_step], (resumed, last_step)
    final_step = [r['step'] for r in lines if 'step' in r][-1]

    summary = {
        'config': f'64x128, 14 classes, batch {BATCH} global '
                  f'({BATCH // 2}/process), full-size architecture '
                  f'(~40M-param state, batch-free), f32',
        'nproc': 2,
        'seg1_steps_logged': seg1_steps,
        'sigterm_to_process': 1,
        'preemption_checkpoint_step': last_step,
        'seg1_wall_s': round(seg1_wall, 1),
        'resume_marker': resumed,
        'final_step': final_step,
        'seg2_wall_s': round(seg2_wall, 1),
        'validates': ['AOT compile + barrier + warm_collectives at full '
                      'size', 'collective async cadence save (full '
                      'state)', 'cross-process preemption sync',
                      'collective resume'],
    }
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, 'mp_fullsize.json'), 'w') as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)


if __name__ == '__main__':
    main()

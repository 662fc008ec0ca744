"""Measure the REAL train CLI's steady-state step time.

bench.py times the jitted step with a constant batch; the end-to-end
gap (BASELINE.md reference-scale run: 0.20 s/step vs 0.056 s/step) is
host serialization around it. This runs the actual
`edgegan_tpu.cli.train` on an already-staged dataset for a few hundred
steps and reports the steady-state per-step wall time from the
trainer's own progress lines (first epoch excluded: compile + cache
warmup), isolating the train-loop overhead the round-4 pipelining work
targets (deferred metrics pull, worker-thread device_put, async
checkpoint saves).

Usage: python scripts/loop_steady_state.py [dataroot] [steps] [save_freq]
Prints one JSON line.
"""
import json
import os
import re
import subprocess
import sys
import tempfile

import numpy as np


def main():
    dataroot = (sys.argv[1] if len(sys.argv) > 1
                else '/tmp/edgegan_refscale_data_1006')
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 450
    save_freq = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    if not os.path.isdir(os.path.join(dataroot, 'genshapes')):
        raise SystemExit(f'{dataroot}/genshapes not staged — run '
                         'scripts/refscale_run.py (or genquality_run.stage) '
                         'first')
    train_dir = os.path.join(dataroot, 'genshapes', 'train')
    n_train = sum(len(files) for _, _, files in os.walk(train_dir))
    steps_per_epoch = n_train // 64
    epochs = (steps + steps_per_epoch - 1) // steps_per_epoch
    out = tempfile.mkdtemp(prefix='edgegan_loopss_')
    cmd = [sys.executable, '-m', 'edgegan_tpu.cli.train',
           '--dataroot', dataroot, '--dataset', 'genshapes',
           '--num_classes', '14', '--name', 'loopss',
           '--outputsroot', out, '--dtype', 'bfloat16',
           '--learning_rate', '1e-4', '--epoch', str(epochs),
           '--save_checkpoint_frequency', str(save_freq),
           '--summary_frequency', '1000000']
    log = os.path.join(out, 'train.log')
    with open(log, 'w') as f:
        subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, text=True,
                       check=True, timeout=3600)
    times = []
    for line in open(log):
        m = re.match(r'Epoch: \[\s*(\d+)/\s*\d+\] \[\s*(\d+)/\s*(\d+)\] '
                     r'time: ([\d.]+)', line)
        if m:
            ep, idx, spe, t = (int(m.group(1)), int(m.group(2)),
                               int(m.group(3)), float(m.group(4)))
            times.append((ep * spe + idx, t))
    t = np.array([x for _, x in times])
    dt = np.diff(t)
    # steady state: drop the first epoch (compile) and checkpoint-save
    # steps land in the distribution — report both median and mean
    ss = dt[steps_per_epoch:]
    result = {
        'steps_timed': int(len(ss)),
        'median_s_per_step': round(float(np.median(ss)), 4),
        'mean_s_per_step': round(float(ss.mean()), 4),
        'p90_s_per_step': round(float(np.percentile(ss, 90)), 4),
        'max_s_per_step': round(float(ss.max()), 2),
        'steady_steps_per_sec': round(1.0 / float(np.median(ss)), 2),
        'save_freq': save_freq,
        'out': out,
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()

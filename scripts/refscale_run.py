"""Reference-scale training run (VERDICT r3 next-round #1).

The reference's headline artifact is a ~15-hour, 100-epoch, ~22,000-step
14-class training on SketchyCOCO (~14k object-level pairs) on an RTX
2080 Ti (/root/reference/README.md:84-85, train.py:17-29). This script
executes the full-scale equivalent on the TPU:

  - stages a 14-class procedural edge|photo dataset at SketchyCOCO
    scale (default 1,006 train pairs/class = 14,084 pairs -> 220
    steps/epoch at batch 64; 336 held-out pairs) — the environment has
    no network, so the procedural generator (scripts/genquality_run.py)
    stands in for the real download, clearly labeled;
  - trains the full-size 64x128 architecture, batch 64, faithful
    7-group update, bf16 (the headline bench config), RMSProp, for 100
    epochs = ~22,000 steps with a retained checkpoint ladder
    (save_freq 1000, keep 25);
  - KILLS the run mid-flight (SIGTERM at ~45% of the steps) and
    resumes it, exercising preemption-save + restore + the
    metrics.jsonl resume contract at reference scale;
  - runs the pinned-extractor FID trajectory over the ladder
    (extractor = last retained checkpoint, EXCLUDED from the curve —
    no generator/extractor co-adaptation point) and the test CLI on
    held-out sketches.

Usage:
  python scripts/refscale_run.py [lr] [outdir] [train_per_class]
                                 [epochs] [kill_frac] [save_freq]
Writes: <outdir>/refscale_{metrics.jsonl,curves.png,eval.json,
        samples.png,fidcurve.json,fidcurve.png}
"""
import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NUM_CLASSES = 14
BATCH = 64
DATAROOT = '/tmp/edgegan_refscale_data'
OUTPUTS = '/tmp/edgegan_refscale_run'
NAME = 'refscale'


def _launch(common, epochs, lr, save_freq, log_path):
    cmd = [sys.executable, '-m', 'edgegan_tpu.cli.train'] + common + [
        '--learning_rate', str(lr),
        '--dtype', 'bfloat16',
        '--epoch', str(epochs),
        '--save_checkpoint_frequency', str(save_freq),
        '--keep_checkpoint_max', '25',
        '--summary_frequency', '2000',
        '--nan_policy', 'halt',
    ]
    # stdout goes to a FILE, not a pipe: at 22k steps the trainer's
    # progress lines overflow a 64KB pipe buffer long before the
    # monitor loop would read it, deadlocking the run mid-training.
    log = open(log_path, 'w')
    return subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                            text=True)


def _count_steps(metrics_path):
    if not os.path.exists(metrics_path):
        return 0, None
    last = None
    n = 0
    for line in open(metrics_path):
        row = json.loads(line)
        if 'step' in row:
            n += 1
            last = row['step']
    return n, last


def main():
    lr = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-4
    outdir = sys.argv[2] if len(sys.argv) > 2 else 'docs'
    train_per_class = int(sys.argv[3]) if len(sys.argv) > 3 else 1006
    epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    kill_frac = float(sys.argv[5]) if len(sys.argv) > 5 else 0.45
    save_freq = int(sys.argv[6]) if len(sys.argv) > 6 else 1000

    # Scale-specific staging/output roots so a tiny smoke run can't be
    # mistaken for (or clobber) the full-scale dataset.
    global DATAROOT, OUTPUTS
    DATAROOT = f'{DATAROOT}_{train_per_class}'
    OUTPUTS = f'{OUTPUTS}_{train_per_class}'

    from genquality_run import stage
    if not os.path.exists(os.path.join(DATAROOT, 'genshapes')):
        t0 = time.time()
        n_train, n_test = stage(DATAROOT, seed=11,
                                train_per_class=train_per_class,
                                test_per_class=24,
                                num_classes=NUM_CLASSES)
        print(f'staged {n_train} train / {n_test} held-out pairs in '
              f'{time.time() - t0:.0f}s', flush=True)
    n_train = train_per_class * NUM_CLASSES
    n_test = 24 * NUM_CLASSES
    steps_per_epoch = n_train // BATCH
    total_steps = steps_per_epoch * epochs
    kill_at = int(total_steps * kill_frac)
    shutil.rmtree(OUTPUTS, ignore_errors=True)

    common = [
        '--dataroot', DATAROOT, '--dataset', 'genshapes',
        '--num_classes', str(NUM_CLASSES),
        '--name', NAME, '--outputsroot', OUTPUTS,
    ]
    metrics_path = os.path.join(OUTPUTS, NAME, 'logs', 'metrics.jsonl')

    # ---- segment 1: train until the mid-run kill ----
    print(f'target {total_steps} steps ({epochs} epochs x '
          f'{steps_per_epoch}); SIGTERM at ~step {kill_at}', flush=True)
    t_train0 = time.time()
    seg1_log = os.path.join(os.path.dirname(OUTPUTS) or '/tmp',
                            f'{NAME}_seg1.log')
    proc = _launch(common, epochs, lr, save_freq, seg1_log)
    killed_at = None
    while proc.poll() is None:
        time.sleep(5)
        _, last = _count_steps(metrics_path)
        if last is not None and last >= kill_at and killed_at is None:
            print(f' [kill] SIGTERM at step {last}', flush=True)
            proc.send_signal(signal.SIGTERM)
            killed_at = last
    proc.wait()
    out1 = open(seg1_log).read()
    seg1_wall = time.time() - t_train0
    HALT = 'nan_policy=halt'
    diverged_at = None
    if proc.returncode == 1 and HALT in out1:
        # NaN-halt: salvage the partial run (record onset, evaluate
        # whatever checkpoints exist) instead of crashing the harness.
        n1, last1 = _count_steps(metrics_path)
        diverged_at = last1
        print(f' [!] segment 1 NaN-halted at step {last1}', flush=True)
    elif proc.returncode != 0:
        print(out1[-4000:])
        raise SystemExit(f'segment 1 exited {proc.returncode}')
    n1, last1 = _count_steps(metrics_path)
    print(f'segment 1: {n1} steps (last {last1}) in {seg1_wall:.0f}s',
          flush=True)

    # ---- segment 2: resume to completion ----
    # The epoch loop restarts on resume (reference models/edgegan.py:456
    # restarts epochs from 0 with the counter carried over — same here),
    # so the relaunch gets only the REMAINING epochs.
    if diverged_at is not None:
        last2, seg2_wall = last1, 0.0
        train_wall = seg1_wall
    else:
        remaining_epochs = max(1, -(-(total_steps - last1)
                                    // steps_per_epoch))
        t_seg2 = time.time()
        seg2_log = os.path.join(os.path.dirname(OUTPUTS) or '/tmp',
                                f'{NAME}_seg2.log')
        proc = _launch(common, remaining_epochs, lr, save_freq, seg2_log)
        proc.wait()
        out2 = open(seg2_log).read()
        seg2_wall = time.time() - t_seg2
        if proc.returncode == 1 and HALT in out2:
            _, last2 = _count_steps(metrics_path)
            diverged_at = last2
            print(f' [!] segment 2 NaN-halted at step {last2}',
                  flush=True)
        elif proc.returncode != 0:
            print(out2[-4000:])
            raise SystemExit(f'segment 2 exited {proc.returncode}')
        else:
            _, last2 = _count_steps(metrics_path)
        assert ' [*] Load SUCCESS' in out2, 'resume did not restore'
        train_wall = seg1_wall + seg2_wall
        print(f'segment 2 (resumed): through step {last2} in '
              f'{seg2_wall:.0f}s; total train wall '
              f'{train_wall / 60:.1f} min', flush=True)

    if diverged_at is not None:
        # NaN params make eval/FID/samples meaningless: keep the loss
        # curves + metrics + a summary recording the onset, and stop.
        os.makedirs(outdir, exist_ok=True)
        shutil.copy(metrics_path,
                    os.path.join(outdir, 'refscale_metrics.jsonl'))
        summary = {
            'diverged_at_step': diverged_at,
            'target_steps': total_steps,
            'lr': lr,
            'train_wall_s': round(train_wall, 1),
            'mid_run_kill_at_step': killed_at,
        }
        with open(os.path.join(outdir, 'refscale_eval.json'), 'w') as f:
            json.dump(summary, f, indent=2)
        print(json.dumps(summary), flush=True)
        return

    # ---- evaluation: held-out + train split at the final checkpoint ----
    import contextlib
    import io

    import evaluate as evaluate_cli
    # pinned cross-run extractor (round 5): if the committed artifact
    # exists, score in its feature space so the numbers are comparable
    # across runs/rounds (VERDICT r4 #4); otherwise fall back to the
    # run's own last checkpoint (within-run trajectories only)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pinned = os.path.join(repo, 'docs', 'fid_extractor.npz')
    ext_flags = (['--extractor_npz', pinned] if os.path.exists(pinned)
                 else [])
    evals = {}
    for split, limit in [('train', 512), ('test', n_test)]:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            evaluate_cli.main(common + ext_flags
                              + ['--split', split,
                                 '--limit', str(limit),
                                 '--eval_batch', '32'])
        evals[split] = json.loads(buf.getvalue().strip().splitlines()[-1])
        print(split, evals[split], flush=True)

    # ---- FID trajectory over the ladder ----
    import fid_curve as fid_curve_cli
    fid_curve_cli.main(common + ext_flags
                       + ['--outdir', outdir, '--limit', '256'])
    for src, dst in [('fidcurve.json', 'refscale_fidcurve.json'),
                     ('fidcurve.png', 'refscale_fidcurve.png')]:
        shutil.move(os.path.join(outdir, src), os.path.join(outdir, dst))

    # ---- held-out samples through the real test CLI ----
    sample_root = os.path.join(DATAROOT, 'refsamples')
    shutil.rmtree(sample_root, ignore_errors=True)
    for cls in range(NUM_CLASSES):
        d = os.path.join(sample_root, 'test', str(cls))
        os.makedirs(d, exist_ok=True)
        for src in sorted(glob.glob(os.path.join(
                DATAROOT, 'genshapes', 'test', str(cls), '*.png')))[:2]:
            shutil.copy(src, os.path.join(d, os.path.basename(src)))
    from edgegan_tpu.cli.test import main as test_main
    test_main(['--dataroot', DATAROOT, '--dataset', 'refsamples',
               '--num_classes', str(NUM_CLASSES),
               '--name', NAME, '--outputsroot', OUTPUTS,
               '--test_batch_size', '28'])

    os.makedirs(outdir, exist_ok=True)
    from PIL import Image
    out_pngs = sorted(glob.glob(os.path.join(
        OUTPUTS, NAME, 'test_output', 'refsamples', '*', '*.png')))
    rows = [np.asarray(Image.open(p)) for p in out_pngs]
    grid = np.concatenate(rows, axis=0)
    Image.fromarray(grid).save(os.path.join(outdir, 'refscale_samples.png'))

    shutil.copy(metrics_path, os.path.join(outdir,
                                           'refscale_metrics.jsonl'))
    from edgegan_tpu.utils import read_metrics, read_resume_markers
    rows_m = read_metrics(metrics_path)
    resume_markers = read_resume_markers(metrics_path)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    keys = ['joint_dis_dloss', 'edge_dis_dloss', 'image_dis_dloss',
            'loss_d_ac', 'edge_gloss', 'image_gloss', 'loss_g_ac',
            'zl_loss']
    fig, axes = plt.subplots(2, 4, figsize=(16, 6))
    xs = [r['step'] for r in rows_m]
    for ax, k in zip(axes.ravel(), keys):
        ax.plot(xs, [r[k] for r in rows_m], linewidth=0.6)
        for m in resume_markers:
            ax.axvline(m, color='red', linestyle=':', linewidth=0.8)
        ax.set_title(k)
        ax.set_xlabel('step')
    fig.suptitle(f'EdgeGAN-TPU reference-scale run: 14 classes, '
                 f'{n_train} pairs, batch 64, faithful bf16, lr {lr} '
                 f'(red: mid-run kill+resume)')
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, 'refscale_curves.png'), dpi=110)

    finite = sum(1 for r in rows_m
                 if all(np.isfinite(v) for v in r.values()))
    steps_done = len(rows_m)
    summary = {
        'config': {'classes': NUM_CLASSES, 'train_pairs': n_train,
                   'heldout_pairs': n_test, 'batch': BATCH,
                   'epochs': epochs, 'lr': lr, 'dtype': 'bfloat16',
                   'update_mode': 'faithful'},
        'target_steps': total_steps,
        'steps_completed': steps_done,
        'last_step': last2,
        'steps_finite': finite,
        'train_wall_s': round(train_wall, 1),
        'train_wall_min': round(train_wall / 60, 2),
        'steps_per_sec_end_to_end': round(steps_done / train_wall, 2),
        'reference_wall_hours': 15.0,
        'speedup_vs_reference_wall': round(15 * 3600 / train_wall, 1),
        'mid_run_kill_at_step': killed_at,
        'resume_markers': resume_markers,
        'segment_walls_s': [round(seg1_wall, 1), round(seg2_wall, 1)],
        'eval': evals,
        'note': 'procedural 14-class stand-in for SketchyCOCO (no '
                'network egress in this environment); every pair a '
                'distinct randomized scene',
    }
    with open(os.path.join(outdir, 'refscale_eval.json'), 'w') as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)


if __name__ == '__main__':
    main()

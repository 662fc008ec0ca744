"""Train the 128x256 (BASELINE config 5) configuration for real
(VERDICT r4 #7).

The hires config previously had bench/roofline numbers only; this run
proves it trains, checkpoints, and evaluates end to end: stage a
NATIVE 128x128 procedural 14-class dataset (pairs 128x256 — no
upsampled 64x64 data), train the 128x256 architecture with a retained
checkpoint ladder, score the ladder in the PINNED cross-run extractor
space (docs/fid_extractor.npz, resized internally to its native 64x64),
and write held-out samples through the real test CLI.

Usage: python scripts/hires_run.py [steps] [outdir] [lr] [save_freq]
                                   [train_per_class]
Writes: <outdir>/hires_{eval.json,metrics.jsonl,curves.png,samples.png,
        fidcurve.json,fidcurve.png}
"""
import contextlib
import glob
import io
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NUM_CLASSES = 14
BATCH = 64
DATAROOT = '/tmp/edgegan_hires_data'
OUTPUTS = '/tmp/edgegan_hires_run'
NAME = 'hires'


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    outdir = sys.argv[2] if len(sys.argv) > 2 else 'docs'
    lr = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4
    save_freq = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    train_per_class = int(sys.argv[5]) if len(sys.argv) > 5 else 480

    from genquality_run import stage
    if not os.path.exists(os.path.join(DATAROOT, 'genshapes')):
        t0 = time.time()
        n_train, n_test = stage(DATAROOT, seed=23,
                                train_per_class=train_per_class,
                                test_per_class=24,
                                num_classes=NUM_CLASSES, hw=(128, 128))
        print(f'staged {n_train} train / {n_test} held-out 128x256 '
              f'pairs in {time.time() - t0:.0f}s', flush=True)
    n_train = train_per_class * NUM_CLASSES
    n_test = 24 * NUM_CLASSES
    steps_per_epoch = n_train // BATCH
    epochs = (steps + steps_per_epoch - 1) // steps_per_epoch
    shutil.rmtree(OUTPUTS, ignore_errors=True)

    size_flags = ['--input_height', '128', '--input_width', '256',
                  '--output_height', '128', '--output_width', '256']
    common = [
        '--dataroot', DATAROOT, '--dataset', 'genshapes',
        '--num_classes', str(NUM_CLASSES),
        '--name', NAME, '--outputsroot', OUTPUTS,
    ] + size_flags

    from edgegan_tpu.cli.train import main as train_main
    t0 = time.time()
    try:
        train_main(common + [
            '--learning_rate', str(lr),
            '--dtype', 'bfloat16',
            '--epoch', str(epochs),
            '--save_checkpoint_frequency', str(save_freq),
            '--keep_checkpoint_max', '15',
            '--summary_frequency', '1000000',
            '--nan_policy', 'halt'])
    except SystemExit as e:
        print(f'train halted (exit {e.code}); evaluating last finite '
              f'checkpoint', flush=True)
    train_wall = time.time() - t0

    from edgegan_tpu import checkpoint as ckpt
    ckpt_dir = os.path.join(OUTPUTS, NAME, 'checkpoints')
    used_step, pruned = ckpt.prune_nonfinite_checkpoints(ckpt_dir)
    print(f'last finite checkpoint: {used_step} (pruned {pruned})',
          flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pinned = os.path.join(repo, 'docs', 'fid_extractor.npz')
    ext_flags = (['--extractor_npz', pinned] if os.path.exists(pinned)
                 else [])

    import evaluate as evaluate_cli
    evals = {}
    for split, limit in [('train', 512), ('test', n_test)]:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            evaluate_cli.main(common + ext_flags
                              + ['--split', split, '--limit', str(limit),
                                 '--eval_batch', '16'])
        evals[split] = json.loads(buf.getvalue().strip().splitlines()[-1])
        print(split, evals[split], flush=True)

    import fid_curve as fid_curve_cli
    fid_curve_cli.main(common + ext_flags
                       + ['--outdir', outdir, '--limit', '128',
                          '--eval_batch', '16'])
    for src, dst in [('fidcurve.json', 'hires_fidcurve.json'),
                     ('fidcurve.png', 'hires_fidcurve.png')]:
        shutil.move(os.path.join(outdir, src), os.path.join(outdir, dst))

    # held-out samples through the real test CLI (1 sketch per class)
    sample_root = os.path.join(DATAROOT, 'hiressamples')
    shutil.rmtree(sample_root, ignore_errors=True)
    for cls in range(NUM_CLASSES):
        d = os.path.join(sample_root, 'test', str(cls))
        os.makedirs(d, exist_ok=True)
        for src in sorted(glob.glob(os.path.join(
                DATAROOT, 'genshapes', 'test', str(cls), '*.png')))[:1]:
            shutil.copy(src, os.path.join(d, os.path.basename(src)))
    from edgegan_tpu.cli.test import main as test_main
    test_main(['--dataroot', DATAROOT, '--dataset', 'hiressamples',
               '--num_classes', str(NUM_CLASSES),
               '--name', NAME, '--outputsroot', OUTPUTS,
               '--test_batch_size', '14'] + size_flags)

    os.makedirs(outdir, exist_ok=True)
    from PIL import Image
    out_pngs = sorted(glob.glob(os.path.join(
        OUTPUTS, NAME, 'test_output', 'hiressamples', '*', '*.png')))
    rows = [np.asarray(Image.open(p)) for p in out_pngs]
    grid = np.concatenate(rows, axis=0)
    Image.fromarray(grid).save(os.path.join(outdir, 'hires_samples.png'))

    metrics_path = os.path.join(OUTPUTS, NAME, 'logs', 'metrics.jsonl')
    shutil.copy(metrics_path, os.path.join(outdir, 'hires_metrics.jsonl'))
    from edgegan_tpu.utils import read_metrics
    rows_m = read_metrics(metrics_path)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    keys = ['joint_dis_dloss', 'edge_dis_dloss', 'image_dis_dloss',
            'loss_d_ac', 'edge_gloss', 'image_gloss', 'loss_g_ac',
            'zl_loss']
    fig, axes = plt.subplots(2, 4, figsize=(16, 6))
    xs = [r['step'] for r in rows_m]
    for ax, k in zip(axes.ravel(), keys):
        ax.plot(xs, [r[k] for r in rows_m], linewidth=0.8)
        ax.set_title(k)
        ax.set_xlabel('step')
    fig.suptitle(f'EdgeGAN-TPU 128x256 (BASELINE config 5) run: '
                 f'{NUM_CLASSES} classes, {n_train} native 128x256 '
                 f'pairs, batch {BATCH}, faithful bf16, lr {lr}')
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, 'hires_curves.png'), dpi=110)

    finite = sum(1 for r in rows_m
                 if all(np.isfinite(v) for v in r.values()))
    summary = {
        'config': {'classes': NUM_CLASSES, 'train_pairs': n_train,
                   'heldout_pairs': n_test, 'batch': BATCH,
                   'size': '128x256', 'lr': lr, 'dtype': 'bfloat16',
                   'update_mode': 'faithful'},
        'steps_run': len(rows_m),
        'steps_finite': finite,
        'checkpoint_evaluated': used_step,
        'pruned_nonfinite_checkpoints': pruned,
        'train_wall_s': round(train_wall, 1),
        'steps_per_sec_end_to_end': round(len(rows_m) / train_wall, 3),
        'eval': evals,
        'extractor': ('pinned docs/fid_extractor.npz (cross-run space)'
                      if ext_flags else 'in-run classifier'),
        'note': 'native 128x128 procedural photos (not upsampled 64s); '
                'proves the scaled config trains/checkpoints/evaluates '
                'end to end (SURVEY §7 build-order item 7)',
    }
    with open(os.path.join(outdir, 'hires_eval.json'), 'w') as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)


if __name__ == '__main__':
    main()

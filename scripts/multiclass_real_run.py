"""Multiclass REAL-data quality loop (VERDICT r2 #1).

Closes the one loop the project had never closed end to end:
multiclass training on real images -> checkpoint -> quality numbers ->
committed sample images.

Stages the reference's own example pairs
(/root/reference/images/dataset_example: five 128x64 train pairs, four
test pairs) into the reference's 14-class layout — pseudo-class
assignment round-robin over classes 0-2, since the reference repo ships
no class labels for its example images — trains the full-size faithful
multiclass config (batch 64, RMSProp 2e-4, the reference headline
config of /root/reference/edgegan/train.py:17-29,45) on the TPU, then:

  1. scripts/evaluate.py on the train split  -> classifier-FID + L1/
     MSE/PSNR (relative-tracking numbers; with 5 distinct source images
     the FID is a loop-closure demonstration, not a quality claim),
  2. scripts/evaluate.py on the HELD-OUT test split (pairs the model
     never saw),
  3. the test CLI over the 4 held-out sketches -> per-class PNGs,
  4. a vertical sample grid of those outputs
     (input pair | G1 edge | G2 photo per row).

Usage:  python scripts/multiclass_real_run.py [steps] [outdir]
Writes: <outdir>/mc_run_curves.png, mc_run_metrics.jsonl, mc_eval.json,
        mc_samples.png
"""
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = '/root/reference/images/dataset_example'
NUM_CLASSES = 14     # reference headline config (train.py:29,45)
CLASSES_USED = 3     # pseudo-classes actually populated
TRAIN_REPEATS = 40   # 5 pairs x 40 = 200 files -> 3 steps/epoch at batch 64


def stage(dataroot):
    """Reference example pairs -> multiclass train/test layout."""
    srcs_train = sorted(glob.glob(os.path.join(REF, 'train', '*.png')))
    srcs_test = sorted(glob.glob(os.path.join(REF, 'test', '*.png')))
    assert srcs_train and srcs_test, REF
    for i, s in enumerate(srcs_train):
        d = os.path.join(dataroot, 'realmc', 'train', str(i % CLASSES_USED))
        os.makedirs(d, exist_ok=True)
        for r in range(TRAIN_REPEATS):
            shutil.copy(s, os.path.join(
                d, f'{r:02d}_{os.path.basename(s)}'))
    for i, s in enumerate(srcs_test):
        d = os.path.join(dataroot, 'realmc', 'test', str(i % CLASSES_USED))
        os.makedirs(d, exist_ok=True)
        shutil.copy(s, os.path.join(d, os.path.basename(s)))
    return len(srcs_train) * TRAIN_REPEATS, len(srcs_test)


def prune_nonfinite_checkpoints(ckpt_dir):
    """Moved into the checkpoint layer (round 5); kept as an alias for
    older callers. See edgegan_tpu.checkpoint.prune_nonfinite_checkpoints."""
    from edgegan_tpu.checkpoint import prune_nonfinite_checkpoints as prune
    return prune(ckpt_dir)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1002
    outdir = sys.argv[2] if len(sys.argv) > 2 else 'docs'
    dataroot = '/tmp/edgegan_mcdata'
    outputs = '/tmp/edgegan_mcrun'
    shutil.rmtree(dataroot, ignore_errors=True)
    shutil.rmtree(outputs, ignore_errors=True)
    n_train, n_test = stage(dataroot)
    steps_per_epoch = n_train // 64
    epochs = (steps + steps_per_epoch - 1) // steps_per_epoch
    print(f'staged {n_train} train / {n_test} test files; '
          f'{epochs} epochs x {steps_per_epoch} steps')

    common = [
        '--dataroot', dataroot, '--dataset', 'realmc',
        '--num_classes', str(NUM_CLASSES),
        '--name', 'mcrun', '--outputsroot', outputs,
    ]
    from edgegan_tpu.cli.train import main as train_main
    train_main(common + [
        '--epoch', str(epochs),
        '--save_checkpoint_frequency', '200',  # saves at counter%200==2
        '--keep_checkpoint_max', '10',
    ])

    ckpt_dir = os.path.join(outputs, 'mcrun', 'checkpoints')
    used_step, pruned = prune_nonfinite_checkpoints(ckpt_dir)
    print(f'evaluating checkpoint step {used_step} '
          f'(pruned non-finite: {pruned})')

    # ---- quality numbers: train split + held-out test split ----
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import contextlib
    import io

    import evaluate as evaluate_cli
    evals = {}
    for split, limit, batch in [('train', 192, 32), ('test', 4, 2)]:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            evaluate_cli.main(common + ['--split', split,
                                        '--limit', str(limit),
                                        '--eval_batch', str(batch)])
        evals[split] = json.loads(buf.getvalue().strip().splitlines()[-1])
        print(split, evals[split])

    # ---- held-out sample images via the real test CLI ----
    from edgegan_tpu.cli.test import main as test_main
    test_main(common)

    os.makedirs(outdir, exist_ok=True)
    import numpy as np
    from PIL import Image
    out_pngs = sorted(glob.glob(os.path.join(
        outputs, 'mcrun', 'test_output', 'realmc', '*', '*.png')))
    rows = [np.asarray(Image.open(p)) for p in out_pngs]
    grid = np.concatenate(rows, axis=0)
    Image.fromarray(grid).save(os.path.join(outdir, 'mc_samples.png'))

    metrics_path = os.path.join(outputs, 'mcrun', 'logs', 'metrics.jsonl')
    shutil.copy(metrics_path, os.path.join(outdir, 'mc_run_metrics.jsonl'))
    from edgegan_tpu.utils import read_metrics
    rows_m = read_metrics(metrics_path)  # dedupes resumed steps

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
    fig.suptitle(f'EdgeGAN-TPU multiclass on real example pairs '
                 f'({n_train} train files / 5 distinct, 14-class config, '
                 f'batch 64, faithful update, f32)')
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, 'mc_run_curves.png'), dpi=110)

    finite = sum(1 for r in rows_m
                 if all(np.isfinite(v) for v in r.values()))
    summary = {
        'steps_run': len(rows_m),
        'steps_finite': finite,
        'checkpoint_evaluated': used_step,
        'pruned_nonfinite_checkpoints': pruned,
        'n_distinct_train_images': 5,
        'n_distinct_test_images': 4,
        'eval': evals,
        'note': 'classifier-feature FID on 5/4 distinct source images: '
                'loop-closure demonstration numbers, not a quality claim',
    }
    with open(os.path.join(outdir, 'mc_eval.json'), 'w') as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == '__main__':
    main()

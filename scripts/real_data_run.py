"""Short REAL-data training run (VERDICT r1 #10).

Stages the reference's own example pairs
(/root/reference/images/dataset_example/train, 128x64 sketch|photo
PNGs) upsampled by repetition, trains the full-size single-class config
through the real host pipeline (PNG decode -> bytescale contrast
stretch -> [-1,1] -> faithful 7-group step), and writes loss curves.

Usage:  python scripts/real_data_run.py [epochs] [outdir]
Writes: <outdir>/real_run_metrics.jsonl, <outdir>/real_run_curves.png
"""
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_TRAIN = '/root/reference/images/dataset_example/train'
REPEATS = 40  # 5 real pairs x 40 = 200 files -> 3 steps/epoch at batch 64


def stage(dataroot):
    dst = os.path.join(dataroot, 'realpairs', 'train')
    os.makedirs(dst, exist_ok=True)
    srcs = sorted(glob.glob(os.path.join(REF_TRAIN, '*.png')))
    assert srcs, REF_TRAIN
    for r in range(REPEATS):
        for s in srcs:
            shutil.copy(s, os.path.join(
                dst, f'{r:02d}_{os.path.basename(s)}'))
    return len(srcs) * REPEATS


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    outdir = sys.argv[2] if len(sys.argv) > 2 else 'docs'
    dataroot = '/tmp/edgegan_realdata'
    outputs = '/tmp/edgegan_realrun'
    shutil.rmtree(dataroot, ignore_errors=True)
    shutil.rmtree(outputs, ignore_errors=True)
    n = stage(dataroot)
    print(f'staged {n} real files')

    from edgegan_tpu.cli.train import main as train_main
    train_main([
        '--dataroot', dataroot, '--dataset', 'realpairs',
        '--multiclasses', 'false',
        '--epoch', str(epochs),
        '--name', 'realrun', '--outputsroot', outputs,
        '--save_checkpoint_frequency', '1000000',
    ])

    metrics_path = os.path.join(outputs, 'realrun', 'logs', 'metrics.jsonl')
    from edgegan_tpu.utils import read_metrics
    rows = read_metrics(metrics_path)  # dedupes resumed steps
    os.makedirs(outdir, exist_ok=True)
    shutil.copy(metrics_path, os.path.join(outdir, 'real_run_metrics.jsonl'))

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    keys = ['joint_dis_dloss', 'edge_dis_dloss', 'image_dis_dloss',
            'edge_gloss', 'image_gloss', 'zl_loss']
    fig, axes = plt.subplots(2, 3, figsize=(13, 6))
    steps = [r['step'] for r in rows]
    for ax, k in zip(axes.ravel(), keys):
        ax.plot(steps, [r[k] for r in rows], linewidth=0.8)
        ax.set_title(k)
        ax.set_xlabel('step')
    fig.suptitle(f'EdgeGAN-TPU on real example pairs '
                 f'({n} files, {epochs} epochs, batch 64, single-class, '
                 f'faithful update)')
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, 'real_run_curves.png'), dpi=110)
    finite = all(all(isinstance(v, (int, float)) and abs(v) < 1e9
                     for v in r.values()) for r in rows)
    print(json.dumps({'steps': len(rows), 'all_finite': finite,
                      'final': {k: rows[-1][k] for k in keys}}))


if __name__ == '__main__':
    main()

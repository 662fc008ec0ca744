"""Generalization-quality run on a diverse procedural dataset.

The multiclass real-data loop (scripts/multiclass_real_run.py) closes
train->evaluate->samples on the reference's example pairs, but with only
5 distinct training images its held-out numbers demonstrate loop
closure, not learning. This script produces the first *generalization*
evidence the environment allows (no SketchyCOCO download): a
procedurally generated edge|photo dataset diverse enough that held-out
reconstruction is only possible if the model actually learned the
sketch->photo mapping.

Dataset (self-contained, seeded):
  4 classes of filled shapes (circle / square / triangle / cross), each
  photo 64x64 with randomized shape color, size, position, background
  color + vertical brightness gradient + sensor noise; the edge half is
  DERIVED from the photo by gradient-magnitude thresholding (black
  strokes on white, like the reference's HED-style edges,
  /root/reference/README.md dataset description). Layout matches the
  reference loader: <dataroot>/<dataset>/{train,test}/<class>/*.png
  side-by-side 128x64 pairs (/root/reference/edgegan/utils/dataset.py).

Loop: train the FULL-SIZE 64x128 architecture (batch 64, RMSProp 2e-4,
faithful 7-group update — the reference headline config,
/root/reference/edgegan/train.py:17-29) with num_classes=4 on the TPU,
then evaluate train AND held-out splits (classifier-FID + L1/MSE/PSNR),
run the test CLI on held-out sketches, and write a sample grid.

Usage:  python scripts/genquality_run.py [steps] [outdir] [lr]
                                         [save_freq] [keep]
                                         [train_per_class] [test_per_class]
  lr: optional learning rate (default the reference's 2e-4; 1e-4 is
  the documented stabilization when the edge critic's WGAN drift NaNs
  a run before `steps` -- see BASELINE.md training-stability note)
  save_freq/keep: checkpoint cadence + retention (default 50/12; a
  long run with save_freq=1000, keep=20 retains a checkpoint ladder
  for the FID-vs-step sweep, scripts/fid_curve.py)
Writes: <outdir>/gq_curves.png, gq_metrics.jsonl, gq_eval.json,
        gq_samples.png
"""
import glob
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CLASSES = 4
TRAIN_PER_CLASS = 480    # 1920 files -> 30 steps/epoch at batch 64
TEST_PER_CLASS = 24      # 96 held-out pairs
H, W = 64, 64            # photo size; pair is 64x128


def _smooth_field(rng, cells=5, lo=0.0, hi=1.0):
    """Smooth random color field in [lo, hi]: random low-res RGB grid,
    bilinearly upsampled — soft blobs like out-of-focus background."""
    from PIL import Image
    grid = rng.uniform(lo, hi, (cells, cells, 3)).astype(np.float32)
    chans = [np.asarray(Image.fromarray(grid[:, :, c], mode='F')
                        .resize((W, H), Image.BILINEAR))
             for c in range(3)]
    return np.stack(chans, axis=2)


def _draw_shape(draw, class_id, cx, cy, r, fg, rng):
    """Draw class `class_id`'s filled shape. 14 distinct geometries so
    the same generator can stage a SketchyCOCO-scale 14-class dataset
    (reference train.py:29 num_classes default; scripts/refscale_run.py)."""
    import math
    t = max(3, r // 2)
    if class_id == 0:    # circle
        draw.ellipse([cx - r, cy - r, cx + r, cy + r], fill=fg)
    elif class_id == 1:  # square
        draw.rectangle([cx - r, cy - r, cx + r, cy + r], fill=fg)
    elif class_id == 2:  # triangle
        draw.polygon([(cx, cy - r), (cx - r, cy + r), (cx + r, cy + r)],
                     fill=fg)
    elif class_id == 3:  # cross
        draw.rectangle([cx - r, cy - t, cx + r, cy + t], fill=fg)
        draw.rectangle([cx - t, cy - r, cx + t, cy + r], fill=fg)
    elif class_id == 4:  # diamond
        draw.polygon([(cx, cy - r), (cx + r, cy), (cx, cy + r),
                      (cx - r, cy)], fill=fg)
    elif class_id == 5:  # wide ellipse
        draw.ellipse([cx - r, cy - t, cx + r, cy + t], fill=fg)
    elif class_id == 6:  # 5-point star
        pts = []
        for i in range(10):
            rad = r if i % 2 == 0 else max(2, int(r * 0.45))
            a = math.pi * i / 5 - math.pi / 2
            pts.append((cx + rad * math.cos(a), cy + rad * math.sin(a)))
        draw.polygon(pts, fill=fg)
    elif class_id == 7:  # pentagon
        pts = [(cx + r * math.cos(2 * math.pi * i / 5 - math.pi / 2),
                cy + r * math.sin(2 * math.pi * i / 5 - math.pi / 2))
               for i in range(5)]
        draw.polygon(pts, fill=fg)
    elif class_id == 8:  # hexagon
        pts = [(cx + r * math.cos(math.pi * i / 3),
                cy + r * math.sin(math.pi * i / 3)) for i in range(6)]
        draw.polygon(pts, fill=fg)
    elif class_id == 9:  # ring (annulus)
        draw.ellipse([cx - r, cy - r, cx + r, cy + r], fill=fg)
        hole = max(2, r - t)
        draw.ellipse([cx - hole, cy - hole, cx + hole, cy + hole],
                     fill=tuple(int(c) for c in rng.randint(0, 255, 3)))
    elif class_id == 10:  # semicircle
        draw.pieslice([cx - r, cy - r, cx + r, cy + r], 180, 360, fill=fg)
    elif class_id == 11:  # L-shape
        draw.rectangle([cx - r, cy - r, cx - r + 2 * t, cy + r], fill=fg)
        draw.rectangle([cx - r, cy + r - 2 * t, cx + r, cy + r], fill=fg)
    elif class_id == 12:  # T-shape
        draw.rectangle([cx - r, cy - r, cx + r, cy - r + 2 * t], fill=fg)
        draw.rectangle([cx - t, cy - r, cx + t, cy + r], fill=fg)
    else:                 # right triangle
        draw.polygon([(cx - r, cy - r), (cx - r, cy + r),
                      (cx + r, cy + r)], fill=fg)


def _draw_photo(rng, class_id):
    """One randomized 64x64 'photo' (uint8) for the class's shape.

    Texture-dense on purpose: flat-color backgrounds are the degenerate
    regime where the WGAN critics diverge (BASELINE.md training
    stability note — a flat-background first attempt of this script had
    its edge critic drift to -90 and NaN at step ~208). Natural photos
    (the reference's SketchyCOCO) have gradients everywhere; the smooth
    random field + clutter lines reproduce that property.
    """
    from PIL import Image, ImageDraw

    def color(lo=0, hi=255):
        return tuple(int(c) for c in rng.randint(lo, hi, 3))

    # background: smooth random color field (never flat)
    arr = _smooth_field(rng, cells=int(rng.randint(4, 8)),
                        lo=0.1, hi=0.9) * 255.0
    img = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    # background clutter: thin lines + small dots (dense edge response,
    # like foliage/ground texture in natural photos)
    for _ in range(rng.randint(2, 5)):
        p = [int(rng.randint(0, W)), int(rng.randint(0, H)),
             int(rng.randint(0, W)), int(rng.randint(0, H))]
        draw.line(p, fill=color(), width=1)
    for _ in range(rng.randint(3, 8)):
        x, y, r = rng.randint(0, W), rng.randint(0, H), rng.randint(1, 3)
        draw.ellipse([x - r, y - r, x + r, y + r], fill=color())
    # the class-defining shape, filled with its own shaded field
    bg_mean = np.asarray(img, np.float32).mean(axis=(0, 1))
    fg = color(30, 225)
    while np.abs(np.subtract(fg, bg_mean)).sum() < 180:  # contrast
        fg = color(30, 225)
    s = H // 64                                   # size scale (1 at 64,
    r = rng.randint(12 * s, 22 * s)               # 2 at 128): shape radius
    #                                               grows with the canvas;
    #                                               at s=1 the rng stream
    #                                               is unchanged
    cx = rng.randint(r + 4, W - r - 4)
    cy = rng.randint(r + 4, H - r - 4)
    _draw_shape(draw, class_id, cx, cy, r, fg, rng)
    arr = np.asarray(img, np.float32)
    # shade the shape with a soft luminance field so it isn't flat either
    shade = (_smooth_field(rng, cells=4, lo=-0.25, hi=0.25).mean(axis=2,
             keepdims=True) + 1.0)
    arr = arr * shade
    # vertical brightness gradient + sensor noise
    grad = np.linspace(-18, 18, H, dtype=np.float32)[:, None, None]
    arr = arr + grad * rng.uniform(0.0, 1.0) + rng.normal(0, 3, arr.shape)
    return np.clip(arr, 0, 255).astype(np.uint8)


def _edge_map(photo):
    """Photo -> dark-stroke-on-white edge half: per-channel gradient
    magnitude, max over channels (chroma-only boundaries count too).

    SOFT grayscale strokes, like the reference's HED edge maps — and
    unlike hard 0/255 thresholding, which makes the edge half an
    almost-constant white field: the degenerate-WGAN regime where the
    edge critic diverges (BASELINE.md training-stability note; a
    thresholded first attempt of this very script NaN'd at step 178)."""
    g = photo.astype(np.float32)
    gy, gx = np.gradient(g, axis=(0, 1))
    mag = np.sqrt(gx * gx + gy * gy).max(axis=2)
    edge = np.clip(255.0 - mag * 6.0, 0, 255).astype(np.uint8)
    return np.repeat(edge[:, :, None], 3, axis=2)


def stage(dataroot, seed=7, train_per_class=TRAIN_PER_CLASS,
          test_per_class=TEST_PER_CLASS, num_classes=NUM_CLASSES,
          dataset='genshapes', hw=None):
    """`hw=(h, w)` stages photos at a non-default size (e.g. (128, 128)
    for the BASELINE config-5 hires run — pairs come out h x 2w). The
    default 64x64 stream is byte-identical to pre-round-5 staging."""
    global H, W
    from PIL import Image
    rng = np.random.RandomState(seed)
    old_hw = (H, W)
    if hw is not None:
        H, W = hw
    try:
        counts = {'train': train_per_class, 'test': test_per_class}
        for split, per_class in counts.items():
            for cls in range(num_classes):
                d = os.path.join(dataroot, dataset, split, str(cls))
                os.makedirs(d, exist_ok=True)
                for i in range(per_class):
                    photo = _draw_photo(rng, cls)
                    pair = np.concatenate([_edge_map(photo), photo],
                                          axis=1)
                    Image.fromarray(pair).save(
                        os.path.join(d, f'{i:04d}.png'))
        return (counts['train'] * num_classes,
                counts['test'] * num_classes)
    finally:
        H, W = old_hw


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    outdir = sys.argv[2] if len(sys.argv) > 2 else 'docs'
    lr = float(sys.argv[3]) if len(sys.argv) > 3 else 2e-4
    save_freq = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    keep = int(sys.argv[5]) if len(sys.argv) > 5 else 12
    train_per_class = (int(sys.argv[6]) if len(sys.argv) > 6
                       else TRAIN_PER_CLASS)
    test_per_class = (int(sys.argv[7]) if len(sys.argv) > 7
                      else TEST_PER_CLASS)
    dataroot = '/tmp/edgegan_gqdata'
    outputs = '/tmp/edgegan_gqrun'
    shutil.rmtree(dataroot, ignore_errors=True)
    shutil.rmtree(outputs, ignore_errors=True)
    n_train, n_test = stage(dataroot, train_per_class=train_per_class,
                            test_per_class=test_per_class)
    steps_per_epoch = n_train // 64
    epochs = (steps + steps_per_epoch - 1) // steps_per_epoch
    print(f'staged {n_train} train / {n_test} held-out pairs; '
          f'{epochs} epochs x {steps_per_epoch} steps')

    common = [
        '--dataroot', dataroot, '--dataset', 'genshapes',
        '--num_classes', str(NUM_CLASSES),
        '--name', 'gqrun', '--outputsroot', outputs,
    ]
    from edgegan_tpu.cli.train import main as train_main
    try:
        train_main(common + [
            '--learning_rate', str(lr),
            '--epoch', str(epochs),
            '--save_checkpoint_frequency', str(save_freq),
            '--keep_checkpoint_max', str(keep),
            '--nan_policy', 'halt',     # stop at divergence onset, if any
        ])
    except SystemExit as e:             # halt exits 1; still evaluate the
        print(f'train halted (exit {e.code}); evaluating last finite '
              f'checkpoint')            # last finite checkpoint below

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from edgegan_tpu.checkpoint import prune_nonfinite_checkpoints
    ckpt_dir = os.path.join(outputs, 'gqrun', 'checkpoints')
    used_step, pruned = prune_nonfinite_checkpoints(ckpt_dir)
    print(f'evaluating checkpoint step {used_step} '
          f'(pruned non-finite: {pruned})')

    import contextlib
    import io

    import evaluate as evaluate_cli
    evals = {}
    for split, limit, batch in [('train', min(512, n_train), 32),
                                ('test', min(512, n_test), 32)]:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            evaluate_cli.main(common + ['--split', split,
                                        '--limit', str(limit),
                                        '--eval_batch', str(batch)])
        evals[split] = json.loads(buf.getvalue().strip().splitlines()[-1])
        print(split, evals[split])

    # held-out samples through the real test CLI (2 sketches per class)
    sample_root = os.path.join(dataroot, 'gensamples')
    for cls in range(NUM_CLASSES):
        d = os.path.join(sample_root, 'test', str(cls))
        os.makedirs(d, exist_ok=True)
        for src in sorted(glob.glob(os.path.join(
                dataroot, 'genshapes', 'test', str(cls), '*.png')))[:2]:
            shutil.copy(src, os.path.join(d, os.path.basename(src)))
    from edgegan_tpu.cli.test import main as test_main
    test_main(['--dataroot', dataroot, '--dataset', 'gensamples',
               '--num_classes', str(NUM_CLASSES),
               '--name', 'gqrun', '--outputsroot', outputs])

    os.makedirs(outdir, exist_ok=True)
    from PIL import Image
    out_pngs = sorted(glob.glob(os.path.join(
        outputs, 'gqrun', 'test_output', 'gensamples', '*', '*.png')))
    rows = [np.asarray(Image.open(p)) for p in out_pngs]
    grid = np.concatenate(rows, axis=0)
    Image.fromarray(grid).save(os.path.join(outdir, 'gq_samples.png'))

    metrics_path = os.path.join(outputs, 'gqrun', 'logs', 'metrics.jsonl')
    shutil.copy(metrics_path, os.path.join(outdir, 'gq_metrics.jsonl'))
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
    fig.suptitle(f'EdgeGAN-TPU generalization run: 4-class procedural '
                 f'shapes ({n_train} train / {n_test} held-out pairs, '
                 f'batch 64, faithful update, f32)')
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, 'gq_curves.png'), dpi=110)

    finite = sum(1 for r in rows_m
                 if all(np.isfinite(v) for v in r.values()))
    summary = {
        'steps_run': len(rows_m),
        'steps_finite': finite,
        'checkpoint_evaluated': used_step,
        'pruned_nonfinite_checkpoints': pruned,
        'n_train_pairs': n_train,
        'n_heldout_pairs': n_test,
        'eval': evals,
        'note': 'held-out pairs the model never saw; every pair is a '
                'distinct randomized scene, so held-out reconstruction '
                'requires a learned sketch->photo mapping',
    }
    with open(os.path.join(outdir, 'gq_eval.json'), 'w') as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == '__main__':
    main()

"""Quality-trajectory sweep: classifier-FID vs training step.

Evaluates EVERY retained checkpoint of a finished run (scripts/
evaluate.py --step over the checkpoint ladder) on the train and
held-out splits and writes a FID-vs-step curve. The reference has no
quantitative evaluation at all (FID lives only in the paper,
/root/reference/README.md:2); this is the rebuild's push-button
quality-trajectory instrument.

The FID feature extractor (the run's own AC-GAN classifier) is PINNED
to one checkpoint for the whole sweep — by default the last retained
step — so every point is measured in the same feature space. Without
pinning, each step would score in its own (still-training) classifier's
space and the curve would not be comparable across steps.

Usage:
  python scripts/fid_curve.py --name gqrun --outputsroot /tmp/edgegan_gqrun \
      --dataroot /tmp/edgegan_gqdata --dataset genshapes --num_classes 4 \
      [--outdir docs] [--limit 256] [--splits train,test]

Writes <outdir>/fidcurve.json and <outdir>/fidcurve.png and prints the
JSON summary.
"""
import argparse
import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    parser = argparse.ArgumentParser('edgegan_tpu.fid_curve',
                                     add_help=False)
    parser.add_argument('--outdir', default='docs')
    parser.add_argument('--limit', type=int, default=256)
    parser.add_argument('--eval_batch', type=int, default=32)
    parser.add_argument('--splits', default='train,test')
    parser.add_argument('--extractor_step', type=int, default=None,
                        help='checkpoint whose classifier scores the '
                             'whole sweep (default: the last retained '
                             'step)')
    parser.add_argument('--extractor_npz', default=None,
                        help='PINNED cross-run extractor '
                             '(docs/fid_extractor.npz). With it, no '
                             'sweep point needs excluding (the extractor '
                             'is external to the run) and curves are '
                             'comparable across runs')
    parser.add_argument('--exclude_extractor_point', type=lambda s:
                        s.lower() in ('1', 'true', 'yes'), default=True,
                        help='drop the extractor checkpoint\'s own step '
                             'from the curve: scoring a generator with '
                             'an extractor from the SAME step deflates '
                             'that one point (generator/extractor '
                             'co-adaptation — the round-3 curve\'s '
                             'final-point artifact). Default on.')
    parser.add_argument('--max_points', type=int, default=24,
                        help='subsample the ladder evenly to at most N '
                             'sweep points (first and last retained '
                             'steps always kept) — bounds sweep cost '
                             'on dense save cadences (a save_freq-500 '
                             'reference-scale ladder retains 44+ '
                             'checkpoints). 0 = sweep every retained '
                             'checkpoint.')
    args, passthrough = parser.parse_known_args(argv)

    # the run directory comes from the passthrough config flags
    cfg = argparse.ArgumentParser(add_help=False)
    cfg.add_argument('--name', required=True)
    cfg.add_argument('--outputsroot', default='outputs')
    known, _ = cfg.parse_known_args(passthrough)
    ckpt_dir = os.path.join(known.outputsroot, known.name, 'checkpoints')

    from edgegan_tpu import checkpoint as ckpt
    import evaluate as evaluate_cli

    steps = ckpt._all_steps(ckpt_dir)
    if not steps:
        raise SystemExit(f'no checkpoints under {ckpt_dir}')
    if args.extractor_npz:
        # pinned cross-run extractor: external to the run, so every
        # retained step is a valid sweep point (no co-adaptation risk)
        extractor_step = None
        sweep_steps = steps
        extractor_flags = ['--extractor_npz', args.extractor_npz]
    else:
        extractor_step = (args.extractor_step
                          if args.extractor_step is not None
                          else steps[-1])
        sweep_steps = [s for s in steps
                       if not (args.exclude_extractor_point
                               and s == extractor_step)]
        extractor_flags = ['--extractor_step', str(extractor_step)]
    if args.max_points and len(sweep_steps) > args.max_points:
        import numpy as _np
        idx = _np.unique(_np.linspace(0, len(sweep_steps) - 1,
                                      args.max_points).round().astype(int))
        sweep_steps = [sweep_steps[i] for i in idx]
    splits = args.splits.split(',')
    rows = []
    for step in sweep_steps:
        row = {'step': step}
        for split in splits:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                evaluate_cli.main(passthrough + extractor_flags + [
                    '--split', split, '--step', str(step),
                    '--limit', str(args.limit),
                    '--eval_batch', str(args.eval_batch)])
            r = json.loads(buf.getvalue().strip().splitlines()[-1])
            row[split] = {k: r[k] for k in
                          ('classifier_fid', 'l1', 'mse', 'psnr_db')}
        rows.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(args.outdir, exist_ok=True)
    summary = {'checkpoint_dir': ckpt_dir, 'n_checkpoints': len(steps),
               'extractor_step': extractor_step,
               'extractor_npz': args.extractor_npz,
               'extractor_point_excluded': args.exclude_extractor_point,
               'limit': args.limit, 'curve': rows}
    with open(os.path.join(args.outdir, 'fidcurve.json'), 'w') as f:
        json.dump(summary, f, indent=2)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, (ax_fid, ax_l1) = plt.subplots(1, 2, figsize=(11, 4))
    xs = [r['step'] for r in rows]
    for split in splits:
        ax_fid.plot(xs, [r[split]['classifier_fid'] for r in rows],
                    marker='o', label=split)
        ax_l1.plot(xs, [r[split]['l1'] for r in rows],
                   marker='o', label=split)
    ax_fid.set_yscale('log')
    ax_fid.set_xlabel('training step')
    ax_fid.set_ylabel('classifier-FID (log)')
    ax_fid.legend()
    ax_l1.set_xlabel('training step')
    ax_l1.set_ylabel('L1 (real vs generated photo)')
    ax_l1.legend()
    space = (f'pinned {os.path.basename(args.extractor_npz)}'
             if args.extractor_npz
             else f'step-{extractor_step} classifier')
    fig.suptitle(f'EdgeGAN-TPU quality trajectory (classifier-feature '
                 f'FID in the {space} space; '
                 f'relative tracking, not InceptionV3 FID)')
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, 'fidcurve.png'), dpi=110)
    print(json.dumps({'n_checkpoints': len(steps),
                      'out': os.path.join(args.outdir, 'fidcurve.json')}))


if __name__ == '__main__':
    main()

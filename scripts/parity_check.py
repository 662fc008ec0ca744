"""Pixel-parity harness vs the reference TF implementation.

Usage (once the released TF checkpoint and its outputs are available —
they require network access / TF 1.x, neither present in this image):

1. Where TF 1.x runs, dump the checkpoint to npz (see
   edgegan_tpu.convert.npz_from_tf_hint) and run the reference
   `python -m edgegan.test` to produce golden output images.
2. Here:
     python scripts/parity_check.py import --npz edgegan_tf.npz \
         --outputs outputs/edgegan
     python -m edgegan_tpu.cli.test --name edgegan ...
     python scripts/parity_check.py compare \
         --ours outputs/edgegan/test_output/class14 \
         --golden /path/to/tf/test_output/class14

`import` converts the npz into an Orbax checkpoint our test CLI can
load; `compare` reports per-image max-abs-diff / PSNR and an overall
verdict (target: <=1/255 max abs diff; SURVEY.md §7 hard parts).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cmd_import(args):
    import jax
    from edgegan_tpu import checkpoint as ckpt
    from edgegan_tpu import convert
    from edgegan_tpu.core.config import Config
    from edgegan_tpu.train import Networks, create_train_state

    config = Config().derive('train')
    params, aux = convert.import_tf_npz(args.npz, config)
    problems = convert.check_against(params, aux, config)
    if problems:
        print(f'IMPORT MISMATCHES ({len(problems)}):')
        for path, why in problems[:20]:
            print(' ', '/'.join(path), why)
        raise SystemExit(1)
    nets = Networks(config)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               config.learning_rate)
    state = state.replace(
        params=jax.tree.map(lambda r, g: np.asarray(g, np.float32),
                            state.params, params),
        aux=jax.tree.map(lambda r, g: np.asarray(g, np.float32),
                         state.aux, aux))
    ckpt_dir = os.path.join(args.outputs, 'checkpoints')
    ckpt.save(ckpt_dir, args.step, state)
    print(f'imported -> {ckpt_dir} (step {args.step})')


def cmd_compare(args):
    from PIL import Image
    ours_files = {}
    for root, _, files in os.walk(args.ours):
        for f in files:
            if f.endswith(('.png', '.jpg')):
                rel = os.path.relpath(os.path.join(root, f), args.ours)
                ours_files[rel] = os.path.join(root, f)
    worst = 0.0
    psnrs = []
    missing = []
    for root, _, files in os.walk(args.golden):
        for f in files:
            if not f.endswith(('.png', '.jpg')):
                continue
            rel = os.path.relpath(os.path.join(root, f), args.golden)
            if rel not in ours_files:
                missing.append(rel)
                continue
            a = np.asarray(Image.open(ours_files[rel]), np.float32)
            b = np.asarray(Image.open(os.path.join(root, f)), np.float32)
            if a.shape != b.shape:
                print(f'SHAPE MISMATCH {rel}: {a.shape} vs {b.shape}')
                worst = 255.0
                continue
            diff = np.abs(a - b).max()
            mse = np.mean((a - b) ** 2)
            psnr = 99.0 if mse == 0 else 20 * np.log10(255.0 / np.sqrt(mse))
            psnrs.append(psnr)
            worst = max(worst, diff)
            print(f'{rel}: max_abs={diff:.1f}/255  psnr={psnr:.1f}dB')
    if missing:
        print(f'MISSING {len(missing)} outputs, e.g. {missing[:5]}')
    print(f'\nWORST max abs diff: {worst}/255; mean PSNR: '
          f'{np.mean(psnrs) if psnrs else float("nan"):.1f} dB')
    print('PARITY PASS' if worst <= 1.0 and not missing else 'PARITY FAIL')


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='cmd', required=True)
    pi = sub.add_parser('import')
    pi.add_argument('--npz', required=True)
    pi.add_argument('--outputs', default='outputs/edgegan')
    pi.add_argument('--step', type=int, default=100002)
    pc = sub.add_parser('compare')
    pc.add_argument('--ours', required=True)
    pc.add_argument('--golden', required=True)
    args = p.parse_args(argv)
    {'import': cmd_import, 'compare': cmd_compare}[args.cmd](args)


if __name__ == '__main__':
    main()

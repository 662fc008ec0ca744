"""Quality evaluation for a trained checkpoint (in-environment).

Loads the latest checkpoint, runs the test graph (encoder -> G1/G2)
over a dataset split, and reports:
  - classifier-FID: Frechet distance in the trained AC-GAN classifier's
    768-d feature space between real photos (right halves) and
    generated photos. RELATIVE tracking only — NOT comparable to
    published InceptionV3 FID (evaluation.py).
  - reconstruction metrics (L1/MSE/PSNR) between real and generated
    photos for the same sketches.

Usage:
  python scripts/evaluate.py --name <run> --outputsroot outputs \
      --dataroot ./data --dataset class14 [--split train] [--limit N]
Prints ONE JSON line.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import jax

    from edgegan_tpu import checkpoint as ckpt
    from edgegan_tpu.core.config import (add_config_args, config_from_args,
                                         enable_compilation_cache)
    from edgegan_tpu.data import Dataset
    from edgegan_tpu.evaluation import (classifier_extractor, compute_fid,
                                        reconstruction_metrics)
    from edgegan_tpu.infer import make_test_forward
    from edgegan_tpu.train import Networks

    parser = argparse.ArgumentParser('edgegan_tpu.evaluate')
    add_config_args(parser, 'test')
    parser.add_argument('--split', default='train',
                        help='any split directory under '
                             'dataroot/dataset/ laid out like the train '
                             'split (class dirs of sketch|photo pairs) '
                             '— e.g. a paired test split for held-out '
                             'evaluation')
    parser.add_argument('--limit', type=int, default=512,
                        help='max images to evaluate')
    parser.add_argument('--eval_batch', type=int, default=32)
    parser.add_argument('--step', type=int, default=None,
                        help='evaluate a specific retained checkpoint '
                             'step instead of the latest (quality-'
                             'trajectory sweeps)')
    parser.add_argument('--extractor_step', type=int, default=None,
                        help='take the classifier FID-feature extractor '
                             'from THIS checkpoint step (default: same '
                             'checkpoint as --step). Trajectory sweeps '
                             'must pin one extractor so every point is '
                             'measured in the SAME feature space')
    parser.add_argument('--extractor_npz', default=None,
                        help='path to the PINNED cross-run extractor '
                             '(docs/fid_extractor.npz, trained once by '
                             'scripts/train_fid_extractor.py). Overrides '
                             '--extractor_step; numbers scored through '
                             'it are comparable ACROSS runs')
    args = parser.parse_args(argv)
    config = config_from_args(args).derive('test')
    enable_compilation_cache()

    if not config.multiclasses:
        raise SystemExit('classifier-FID needs a multiclass checkpoint '
                         '(the classifier only exists there)')

    nets = Networks(config)
    loaded, counter, raw = ckpt.load_raw(config.checkpoint_dir,
                                         step=args.step)
    if not loaded:
        raise SystemExit(f'no checkpoint under {config.checkpoint_dir}'
                         + (f' at step {args.step}' if args.step else ''))
    gen_params = {k: raw['params'][k] for k in ('G1', 'G2', 'E')}
    gen_aux = {k: raw['aux'][k] for k in ('G1', 'G2', 'E')}
    if args.extractor_npz:
        eraw = None  # pinned cross-run extractor replaces the in-run one
    elif args.extractor_step is not None and args.extractor_step != counter:
        eloaded, _, eraw = ckpt.load_raw(config.checkpoint_dir,
                                         step=args.extractor_step)
        if not eloaded:
            raise SystemExit(f'no checkpoint at extractor_step '
                             f'{args.extractor_step} under '
                             f'{config.checkpoint_dir}')
    else:
        eraw = raw
    if eraw is not None:
        cls_params = {'D2': eraw['params']['D2']}
        cls_aux = {'D2': eraw['aux']['D2']}

    dataset_config = {
        'input_height': config.input_height,
        'input_width': config.input_width,
        'output_height': config.output_height,
        'output_width': config.output_width,
        'crop': config.crop, 'grayscale': False,
        'z_dim': config.z_dim,
    }
    b = args.eval_batch
    dataset = Dataset(config.dataroot, config.dataset, args.limit, b,
                      dataset_config, config.num_classes, 'train',
                      subdir=args.split)

    forward = make_test_forward(nets, config)
    half_w = int(config.output_width / 2)
    rng = jax.random.PRNGKey(6666)
    reals, fakes = [], []
    for idx in range(len(dataset)):
        images, _z, files = dataset[idx]
        classes = np.array([int(os.path.basename(os.path.dirname(f)))
                            for f in files], np.int32)
        _, image_out = forward(gen_params, gen_aux, images, classes,
                               jax.random.fold_in(rng, idx))
        reals.append(images[:, :, half_w:config.output_width, :])
        fakes.append(np.asarray(image_out, np.float32))
    reals = np.concatenate(reals)
    fakes = np.concatenate(fakes)

    if args.extractor_npz:
        from edgegan_tpu.evaluation import pinned_extractor
        extractor = pinned_extractor(args.extractor_npz)
    else:
        extractor = classifier_extractor(nets, cls_params, cls_aux)
    fid_like = compute_fid(reals, fakes, extractor, batch_size=b)
    recon = reconstruction_metrics(reals, fakes)
    print(json.dumps({
        'checkpoint_step': counter,
        'extractor': (args.extractor_npz if args.extractor_npz
                      else 'in-run classifier'),
        'extractor_step': (None if args.extractor_npz
                           else args.extractor_step
                           if args.extractor_step is not None else counter),
        'split': args.split,
        'n_images': int(len(fakes)),
        'classifier_fid': round(float(fid_like), 4),
        'note': 'classifier-feature FID: relative tracking only, not '
                'comparable to published InceptionV3 FID',
        **{k: round(v, 6) for k, v in recon.items()},
    }))


if __name__ == '__main__':
    main()

"""Train the PINNED classifier-FID feature extractor (VERDICT r4 #4).

Classifier-FID numbers were previously computed in each run's OWN last
retained checkpoint's feature space — correct for within-run
trajectories (the extractor is pinned across the sweep and excluded
from the curve), but meaningless across runs: refscale's 40.0 and
gqrun's 54.8 lived in different spaces. This script trains ONE
dedicated classifier on the procedural 14-class dataset with a fixed
seed and recipe, and saves it as a compact npz artifact
(`docs/fid_extractor.npz`). Every eval that passes
`--extractor_npz docs/fid_extractor.npz` then scores in the SAME
768-d feature space, making quality numbers longitudinally comparable
across runs and rounds.

The extractor is the model's own AC-GAN classifier architecture (D2,
models/classifier.py — MRU pyramid, 768-d penultimate features) trained
as a plain classifier: focal CE on real photo halves only, Adam, no GAN
in the loop. It is NOT any training run's discriminator, so no
generator can co-adapt to it.

Recipe (fixed): seed 1234, 14-class procedural set (stage seed 11 — the
refscale dataset), batch 64, Adam 2e-4, 1500 steps, f32.

Usage: python scripts/train_fid_extractor.py [steps] [out_npz] [dataroot]
Prints ONE JSON line with the held-out accuracy and writes
<out_npz> (+ <out_npz>.json metadata).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SEED = 1234
NUM_CLASSES = 14
BATCH = 64


def flatten_tree(tree, prefix=''):
    """Nested dict of arrays -> {'a/b/c': array} (str keys only)."""
    out = {}
    for k, v in tree.items():
        key = f'{prefix}{k}'
        if isinstance(v, dict):
            out.update(flatten_tree(v, key + '/'))
        else:
            out[key] = np.asarray(v)
    return out


def nest_tree(flat):
    """Inverse of flatten_tree."""
    out = {}
    for key, v in flat.items():
        parts = key.split('/')
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    out_npz = sys.argv[2] if len(sys.argv) > 2 else 'docs/fid_extractor.npz'
    dataroot = (sys.argv[3] if len(sys.argv) > 3
                else '/tmp/edgegan_refscale_data_1006')

    import jax
    import jax.numpy as jnp
    import optax

    from edgegan_tpu import losses as L
    from edgegan_tpu.core.config import Config, enable_compilation_cache
    from edgegan_tpu.data import Dataset
    from edgegan_tpu.train import Networks, create_train_state
    enable_compilation_cache()

    from genquality_run import stage
    if not os.path.exists(os.path.join(dataroot, 'genshapes')):
        t0 = time.time()
        stage(dataroot, seed=11, train_per_class=1006, test_per_class=24,
              num_classes=NUM_CLASSES)
        print(f'staged dataset in {time.time() - t0:.0f}s', flush=True)

    config = Config(num_classes=NUM_CLASSES, seed=SEED).derive('train')
    nets = Networks(config)
    state = create_train_state(nets, jax.random.PRNGKey(SEED),
                               config.learning_rate)
    params = state.params['D2']
    aux = state.aux['D2']
    tx = optax.adam(2e-4)
    opt_state = tx.init(params)

    half_w = config.output_width // 2

    @jax.jit
    def train_step(params, opt_state, images, labels):
        photos = images[:, :, half_w:config.output_width, :]

        def loss_fn(p):
            _, _, logits = nets.classifier.apply(
                {'params': p, **aux}, photos)
            _, loss_d = L.get_acgan_loss_focal(
                logits, labels, logits, labels, NUM_CLASSES)
            acc = jnp.mean((jnp.argmax(logits, -1) == labels)
                           .astype(jnp.float32))
            return loss_d, acc

        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    @jax.jit
    def eval_acc(params, images, labels):
        photos = images[:, :, half_w:config.output_width, :]
        _, _, logits = nets.classifier.apply({'params': params, **aux},
                                             photos)
        return jnp.mean((jnp.argmax(logits, -1) == labels)
                        .astype(jnp.float32))

    dataset_config = {
        'input_height': config.input_height,
        'input_width': config.input_width,
        'output_height': config.output_height,
        'output_width': config.output_width,
        'crop': False, 'grayscale': False, 'z_dim': config.z_dim,
    }
    dataset = Dataset(dataroot, 'genshapes', float('inf'), BATCH,
                      dataset_config, NUM_CLASSES, 'train', cache=True,
                      seed=SEED, host_z=False)

    def batch_labels(files):
        return jnp.asarray([int(os.path.basename(os.path.dirname(f)))
                            for f in files], jnp.int32)

    t0 = time.time()
    done = 0
    losses = []
    while done < steps:
        dataset.shuffle()
        for idx in range(len(dataset)):
            images, _z, files = dataset[idx]
            params, opt_state, loss, acc = train_step(
                params, opt_state, jnp.asarray(images),
                batch_labels(files))
            done += 1
            if done % 200 == 0:
                losses.append(float(loss))
                print(f'step {done}/{steps} loss {float(loss):.4f} '
                      f'acc {float(acc):.3f}', flush=True)
            if done >= steps:
                break
    train_wall = time.time() - t0

    # held-out accuracy: the sanity check that the feature space is
    # class-discriminative (features feed FID; logits are the probe)
    test = Dataset(dataroot, 'genshapes', float('inf'), BATCH,
                   dataset_config, NUM_CLASSES, 'train', subdir='test',
                   host_z=False)
    accs = []
    for idx in range(len(test)):
        images, _z, files = test[idx]
        accs.append(float(eval_acc(params, jnp.asarray(images),
                                   batch_labels(files))))
    heldout_acc = float(np.mean(accs))

    os.makedirs(os.path.dirname(out_npz) or '.', exist_ok=True)
    flat = flatten_tree({'params': jax.device_get(params),
                         'aux': jax.device_get(aux)})
    # f16 halves the artifact; the extractor only produces features for
    # a relative metric, and f16 round-trip moves classifier-FID by
    # <0.1% (features recomputed in f32 at load time)
    flat = {k: (v.astype(np.float16)
                if v.dtype == np.float32 else v) for k, v in flat.items()}
    np.savez_compressed(out_npz, **flat)
    meta = {
        'seed': SEED,
        'steps': steps,
        'optimizer': 'adam(2e-4)',
        'loss': 'focal CE (ld1=1.0, gamma=2.0) on real photo halves',
        'dataset': 'procedural 14-class genshapes (stage seed 11, '
                   '1006 train/class)',
        'config': {'num_classes': NUM_CLASSES,
                   'input_height': config.input_height,
                   'input_width': config.input_width,
                   'output_height': config.output_height,
                   'output_width': config.output_width},
        'heldout_accuracy': round(heldout_acc, 4),
        'train_wall_s': round(train_wall, 1),
        'artifact_bytes': os.path.getsize(out_npz),
        'feature_dim': 768,
        'note': 'pinned cross-run classifier-FID extractor; pass '
                '--extractor_npz to scripts/evaluate.py / fid_curve.py',
    }
    with open(out_npz + '.json', 'w') as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta), flush=True)


if __name__ == '__main__':
    main()

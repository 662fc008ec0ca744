"""Inference entry point: `python -m edgegan_tpu.cli.test`.

Flag-compatible with the reference `python -m edgegan.test`
(/root/reference/edgegan/test.py): batch forced to 1, per-class output
dirs under outputs/<name>/test_output/<dataset>/, class ids parsed from
the parent directory and invalid ones masked out (quirk Q10), output
combinations 'full' | 'inputL_outputR' | 'outputR' (the reference's
'outputL_inputR' mode crashes — quirk Q7 — and is rejected here with a
clear error instead).
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..core.config import add_config_args, config_from_args
from ..data import Dataset
from ..infer import make_test_forward
from ..train import Networks
from .. import checkpoint as ckpt
from ..utils import makedirs, save_images


def pathsplit(path):
    return os.path.normpath(path).split(os.sep)


def name_with_class(filename):
    splited = pathsplit(filename)
    return os.path.join(*splited[splited.index('test') + 1:])


def classes_of(filenames, num_classes):
    result, mask = [], []
    for path in filenames:
        try:
            classid = int(pathsplit(path)[-2])
            if classid >= num_classes:
                mask.append(False)
                continue
            result.append(classid)
            mask.append(True)
        except (ValueError, IndexError):
            # The reference uses a bare except (test paths lacking a
            # parent dir component raise IndexError, unparsable class
            # ids raise ValueError) — both are masked out, not fatal
            # (models/edgegan.py:556-570).
            mask.append(False)
    return result, np.array(mask, dtype=bool)


def classes_padded(filenames, num_classes):
    """Like classes_of but returns one id per file (0 for masked rows),
    keeping the batch shape static so the jitted forward never
    recompiles; masked rows are computed and discarded."""
    _, mask = classes_of(filenames, num_classes)
    ids = []
    for path, ok in zip(filenames, mask):
        ids.append(int(pathsplit(path)[-2]) if ok else 0)
    return np.array(ids, np.int32), mask


def main(argv=None):
    np.random.seed(2333)  # reference test.py:14
    parser = argparse.ArgumentParser('edgegan_tpu.test')
    add_config_args(parser, 'test')
    args = parser.parse_args(argv)
    config = config_from_args(args).derive('test')
    if config.output_combination == 'outputL_inputR':
        # quirk Q7: this mode crashes in the reference (undefined
        # inputR, models/edgegan.py:613-614) — reject up front.
        raise SystemExit(
            "output_combination 'outputL_inputR' is broken in the "
            'reference (undefined inputR, models/edgegan.py:613-614)')
    from ..core.config import enable_compilation_cache
    enable_compilation_cache()

    makedirs(os.path.join(config.test_output_dir, config.dataset))

    dataset_config = {
        'input_height': config.input_height,
        'input_width': config.input_width,
        'output_height': config.output_height,
        'output_width': config.output_width,
        'crop': config.crop,
        'grayscale': False,
    }
    # batch 1 for reference parity (test.py:89); --test_batch_size N
    # opts into batched throughput inference over the same path
    batch = config.test_batch_size or 1
    # Batched mode pads the final partial batch (PAD-sentinel rows,
    # masked before saving) instead of Q10-dropping those files.
    dataset = Dataset(config.dataroot, config.dataset, config.train_size,
                      batch, dataset_config, None, 'test',
                      pad_tail=bool(config.test_batch_size))

    nets = Networks(config)
    # Restore raw (no target): like the reference test graph, only the
    # encoder/generator subtrees are needed, independent of the
    # train-time discriminator configuration.
    loaded, counter, raw = ckpt.load_raw(config.checkpoint_dir)
    if not loaded:
        print(' [!] Load failed...')
        return
    params = {k: raw['params'][k] for k in ('G1', 'G2', 'E')}
    aux = {k: raw['aux'][k] for k in ('G1', 'G2', 'E')}
    print(' [*] Load SUCCESS')

    forward = make_test_forward(nets, config)
    rng = jax.random.PRNGKey(6666)  # reference test.py:15 seeds TF with 6666
    half_w = int(config.output_width / 2)

    # Multi-chip batched inference: shard the batch over a 1-D data
    # mesh, replicate params, and let GSPMD partition the forward — the
    # same recipe as training (parallel/__init__.py), no code change in
    # the model. Engaged when the host sees >1 device and the batch
    # divides evenly; batch-1 parity mode stays single-device.
    mesh = None
    if (config.test_batch_size and jax.device_count() > 1
            and batch % jax.device_count() == 0):
        from ..parallel import create_mesh, replicated, shard_batch
        mesh = create_mesh()
        params = jax.device_put(params, replicated(mesh))
        aux = jax.device_put(aux, replicated(mesh))
        print(f' [*] sharding inference over {jax.device_count()} '
              f'devices')

    def _save_batch(batch_images, filenames, mask, edge_out, image_out):
        """Sync a dispatched forward and write its output files."""
        batch_images = batch_images[mask]
        filenames = [f for f, m in zip(filenames, mask) if m]
        # blocks until device done; transfer rides the device dtype
        # (bf16 in bf16 mode), composition happens in f32
        outputL = np.asarray(np.array(edge_out)[mask], np.float32)
        outputR = np.asarray(np.array(image_out)[mask], np.float32)
        inputL = batch_images[:, :, :half_w, :]

        if config.output_combination == 'inputL_outputR':
            results = np.append(inputL, outputR, axis=2)
        elif config.output_combination == 'outputR':
            results = outputR
        else:  # 'full'
            results = np.append(batch_images, outputL, axis=2)
            results = np.append(results, outputR, axis=2)

        assert results.shape[0] == len(filenames)
        for fname, img in zip(filenames, results):
            name = name_with_class(fname)
            out_path = os.path.join(config.test_output_dir,
                                    config.dataset, name)
            makedirs(os.path.dirname(out_path))
            if save_pool is not None:  # batched mode: overlap PNG
                save_futures.append(save_pool.submit(  # encode w/ device
                    save_images, img[np.newaxis, ...], [1, 1], out_path))
            else:
                save_images(img[np.newaxis, ...], [1, 1], out_path)

    # Pipelined inference: decode prefetches on a thread pool, and the
    # forward for batch i+1 is DISPATCHED before batch i's outputs are
    # pulled (jax async dispatch keeps >=2 batches in flight), so
    # neither the host decode nor the per-dispatch tunnel latency
    # (~28 ms on this backend) serialises with device compute. The
    # reference runs 2 sequential sess.runs per file
    # (models/edgegan.py:591-609).
    import time
    from concurrent.futures import ThreadPoolExecutor

    from ..data import PrefetchLoader
    loader = PrefetchLoader(dataset, prefetch=config.prefetch)
    # batched mode writes PNGs on a pool (PIL's zlib compress releases
    # the GIL); batch-1 parity mode keeps the reference's serial writes
    save_pool = (ThreadPoolExecutor(max_workers=8)
                 if config.test_batch_size else None)
    save_futures = []
    pending = None
    n_done = 0
    t0 = time.perf_counter()
    try:
        for idx, (batch_images, filenames) in enumerate(loader):
            # tail-batch PAD rows are computed (static shapes) but
            # never saved; classes_of also masks them via IndexError
            not_pad = np.array([f != Dataset.PAD for f in filenames],
                               bool)
            if config.multiclasses:
                # static batch shape: masked rows get a placeholder
                # class, are computed, and dropped before saving — the
                # jitted forward compiles once per batch size
                batch_classes, mask = classes_padded(filenames,
                                                     config.num_classes)
                mask &= not_pad
                if not mask.any():
                    continue
            else:
                batch_classes = np.zeros((batch_images.shape[0],),
                                         np.int32)
                mask = not_pad

            # bf16 halves the per-batch tunnel transfer (the jitted
            # forward casts to bf16 anyway when config.dtype is bf16);
            # the f32 original still backs the saved input panel
            dev_images = (batch_images.astype(jax.numpy.bfloat16)
                          if config.test_batch_size
                          and config.dtype == 'bfloat16' else batch_images)
            if mesh is not None:
                dev_images, batch_classes = shard_batch(
                    mesh, dev_images, batch_classes)
            edge_out, image_out = forward(
                params, aux, dev_images, batch_classes,
                jax.random.fold_in(rng, idx))
            if pending is not None:
                _save_batch(*pending)
            pending = (batch_images, filenames, mask, edge_out, image_out)
            n_done += int(mask.sum())
            print('Test: [%4d/%4d]' % (idx, len(dataset)))
        if pending is not None:
            _save_batch(*pending)
        for fut in save_futures:
            fut.result()  # surface any write failure
    finally:
        loader.close()
        if save_pool is not None:
            save_pool.shutdown(wait=True)
    if config.test_batch_size and n_done:
        dt = time.perf_counter() - t0
        print(f' [*] {n_done} images in {dt:.2f}s = '
              f'{n_done / dt:.1f} img/s (batched pipelined mode)')


if __name__ == '__main__':
    main()

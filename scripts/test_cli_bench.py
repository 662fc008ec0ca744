"""Batched test-CLI throughput on the real TPU (VERDICT r2 #6).

Measures `python -m edgegan_tpu.cli.test --test_batch_size N` through
the REAL file->forward->save path: staged PNG pairs on disk, PrefetchLoader
decode, pipelined dispatch (two batches in flight), threaded PNG writes.
The reference's test loop is batch-1 with two sequential sess.runs per
file (/root/reference/edgegan/models/edgegan.py:591-609); this is the
rebuild's own throughput bar against bench.py's one-dispatch-scan
device capability.

Stages the reference example test pairs replicated to `n_images` over
14 class dirs, saves a random-init checkpoint (throughput does not
depend on weight values), then times the CLI main().

Usage:  python scripts/test_cli_bench.py [n_images] [batch] [dtype]
Prints one JSON line.
"""
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = '/root/reference/images/dataset_example/test'
NUM_CLASSES = 14


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dtype = sys.argv[3] if len(sys.argv) > 3 else 'bfloat16'

    import jax

    from edgegan_tpu import checkpoint as ckpt
    from edgegan_tpu.cli import test as cli_test
    from edgegan_tpu.core.config import enable_compilation_cache
    from edgegan_tpu.core.config import Config
    from edgegan_tpu.train import Networks, create_train_state

    enable_compilation_cache()
    root = tempfile.mkdtemp(prefix='testclibench_')
    dataroot = os.path.join(root, 'data')
    outputs = os.path.join(root, 'outputs')

    # stage: reference test pairs replicated round-robin over 14 classes
    srcs = sorted(glob.glob(os.path.join(REF, '*.png')))
    assert srcs, REF
    for i in range(n_images):
        d = os.path.join(dataroot, 'bench', 'test', str(i % NUM_CLASSES))
        os.makedirs(d, exist_ok=True)
        shutil.copy(srcs[i % len(srcs)], os.path.join(d, f'{i:05d}.png'))

    # random-init checkpoint with the full-size 14-class architecture
    cfg = Config(name='bench', outputsroot=outputs, dataset='bench',
                 dataroot=dataroot, dtype=dtype).derive('train')
    nets = Networks(cfg)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    ckpt.save(cfg.checkpoint_dir, 2, state)

    flags = ['--dataroot', dataroot, '--dataset', 'bench',
             '--name', 'bench', '--outputsroot', outputs,
             '--dtype', dtype, '--test_batch_size', str(batch),
             '--output_combination', 'full']
    out_dir = os.path.join(outputs, 'bench', 'test_output', 'bench')
    results = {}
    for label in ('cold', 'warm'):  # cold pays the jit compile; warm
        #                              is the steady-state CLI number
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        cli_test.main(flags)
        dt = time.perf_counter() - t0
        results[label] = dt

    n_out = len(glob.glob(os.path.join(out_dir, '*', '*.png')))
    print(json.dumps({
        'mode': 'test_cli_batched', 'n_images': n_images,
        'n_written': n_out, 'batch': batch, 'dtype': dtype,
        'wall_s_cold': round(results['cold'], 2),
        'wall_s_warm': round(results['warm'], 2),
        'img_per_s': round(n_images / results['warm'], 1),
    }), flush=True)
    shutil.rmtree(root)


if __name__ == '__main__':
    main()

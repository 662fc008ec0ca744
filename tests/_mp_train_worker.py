"""Worker for the 2-process cli.train end-to-end test.

Runs the REAL training CLI under jax.distributed with 4 virtual CPU
devices per process: per-process dataset shards, put_global batch
assembly, process-0 host writes, collective Orbax checkpointing.
"""
import os
import sys


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=4')
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from edgegan_tpu.cli.train import main as train_main
    dataroot = sys.argv[1]
    outputs = sys.argv[2]
    train_main([
        '--dataroot', dataroot, '--dataset', 'ds',
        '--num_classes', '3', '--z_dim', '8',
        '--output_height', '32', '--output_width', '64',
        '--input_height', '32', '--input_width', '64',
        '--image_dis_size', '32', '--edge_dis_size', '32',
        '--batch_size', '8', '--epoch', '1',
        '--save_checkpoint_frequency', '3',
        '--name', 'mp', '--outputsroot', outputs,
    ])
    print(f'WORKER_DONE pid={jax.process_index()}', flush=True)


if __name__ == '__main__':
    main()

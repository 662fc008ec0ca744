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

    from edgegan_tpu.cli import train as cli_train
    if os.environ.get('MP_TEST_NAN') == '1':
        # fault injection for the 2-process nan_policy=halt test: every
        # metric becomes NaN so all processes must take the same halt
        # decision and meet in the collective checkpoint save
        import jax.numpy as jnp
        real_make = cli_train.make_train_step

        def nan_make(nets, config):
            real = real_make(nets, config)

            def stepfn(state, images, z, rng):
                new_state, metrics = real(state, images, z, rng)
                return new_state, {k: v * jnp.nan
                                   for k, v in metrics.items()}
            return stepfn
        cli_train.make_train_step = nan_make

    train_main = cli_train.main
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
        # exercise the TB extras path under multi-process sharding
        # (regression: p0-only jit over global arrays crashed here)
        '--summary_frequency', '2',
        '--name', 'mp', '--outputsroot', outputs,
    ] + sys.argv[3:])  # test-specific flag overrides (argparse: last wins)
    print(f'WORKER_DONE pid={jax.process_index()}', flush=True)


if __name__ == '__main__':
    main()

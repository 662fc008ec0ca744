"""Roofline + differential ablation of the HEADLINE 64x128 bench config
(VERDICT r3 next-round #4; mirrors the round-2 128x256 profile).

For the bf16 faithful batch-64 14-class step this reports:
  - XLA cost analysis: FLOPs + HBM bytes accessed per step;
  - the compute roofline (v5e bf16 peak 197 TFLOP/s) and bandwidth
    roofline (819 GB/s HBM) step-time bounds;
  - measured honest-sync steps/s for the full step and the same
    differential ablations the 128 profile used (no patch critics, no
    classifier, fast update, lambda_gp=0);
  - optionally a jax.profiler trace (pass `trace` as argv[2]).

Usage: python scripts/roofline64.py [outdir] [trace]
Writes <outdir>/roofline64.json and prints a markdown table.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197e12
V5E_HBM_BPS = 819e9


def _force(tree) -> float:
    import jax
    return float(np.asarray(jax.tree.leaves(tree)[0]).ravel()[0])


def measure(config_kw, n_steps=40, want_cost=False, trace_dir=None):
    import jax
    import jax.numpy as jnp
    from edgegan_tpu.core.config import Config, enable_compilation_cache
    from edgegan_tpu.train import (Networks, create_train_state,
                                   make_train_step)
    enable_compilation_cache()

    config = Config(dtype='bfloat16', **config_kw).derive('train')
    nets = Networks(config)
    state = create_train_state(nets, jax.random.PRNGKey(0),
                               config.learning_rate)
    step = jax.jit(make_train_step(nets, config), donate_argnums=(0,))

    b = config.batch_size
    images = jnp.asarray(np.random.RandomState(0).randn(
        b, config.output_height, config.output_width, 3
    ).astype(np.float32).clip(-1, 1))
    zdim = config.z_feed_width()  # class column only under device z
    z = np.random.RandomState(1).randn(b, zdim).astype(np.float32)
    if config.multiclasses:
        z[:, -1] = np.random.RandomState(2).randint(
            0, config.num_classes, b)
    z = jnp.asarray(z)
    rng = jax.random.PRNGKey(3)

    cost = None
    if want_cost:
        lowered = step.lower(state, images, z, jax.random.fold_in(rng, 0))
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        cost = {'flops': float(analysis.get('flops', float('nan'))),
                'bytes': float(analysis.get('bytes accessed',
                                            float('nan')))}

    state, _ = step(state, images, z, jax.random.fold_in(rng, 0))
    _force(state.params['G1'])

    if trace_dir:
        import jax.profiler
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for i in range(1, n_steps + 1):
        state, _ = step(state, images, z, jax.random.fold_in(rng, i))
    _force(state.params['G1'])
    dt = time.perf_counter() - t0
    if trace_dir:
        jax.profiler.stop_trace()
    return n_steps / dt, cost


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else 'docs'
    do_trace = len(sys.argv) > 2 and sys.argv[2] == 'trace'

    results = {}
    trace_dir = os.path.join(outdir, 'roofline64_trace') if do_trace \
        else None
    full_rate, cost = measure({}, want_cost=True, trace_dir=trace_dir)
    results['full faithful bf16'] = full_rate
    print(f'full: {full_rate:.2f} steps/s; cost={cost}', flush=True)

    for tag, kw in [
            ('no patch critics', dict(use_image_discriminator=False,
                                      use_edge_discriminator=False)),
            ('no classifier', dict(multiclasses=False)),
            ('fast update', dict(update_mode='fast')),
            ('lambda_gp=0', dict(lambda_gp=0.0))]:
        rate, _ = measure(kw)
        results[tag] = rate
        print(f'{tag}: {rate:.2f} steps/s', flush=True)

    tflop = cost['flops'] / 1e12
    gb = cost['bytes'] / 1e9
    compute_bound_ms = cost['flops'] / V5E_BF16_TFLOPS * 1e3
    bw_bound_ms = cost['bytes'] / V5E_HBM_BPS * 1e3
    measured_ms = 1e3 / full_rate
    payload = {
        'config': '64x128 pairs, batch 64, 14-class, faithful, bf16',
        'xla_cost_analysis': {'tflop_per_step': round(tflop, 3),
                              'gb_accessed_per_step': round(gb, 2)},
        'rooflines_ms': {'compute_bound': round(compute_bound_ms, 2),
                         'bandwidth_bound': round(bw_bound_ms, 2),
                         'measured': round(measured_ms, 2)},
        'fraction_of_binding_roofline': round(
            max(compute_bound_ms, bw_bound_ms) / measured_ms, 3),
        'sustained_tflops': round(tflop / (measured_ms / 1e3), 1),
        'steps_per_sec': {k: round(v, 2) for k, v in results.items()},
    }
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, 'roofline64.json'), 'w') as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))

    print('\n| variant | steps/s | ms/step |')
    print('|---|---|---|')
    for k, v in results.items():
        print(f'| {k} | {v:.2f} | {1e3 / v:.0f} |')


if __name__ == '__main__':
    main()

"""Controlled divergence-onset ablation (VERDICT r3 next-round #2).

BASELINE.md records that training at the reference's own lr 2e-4 on the
procedural 4-class dataset diverges (NaN at step 178 / 1847 across data
variants; lr 1e-4 sits ON the stability edge), and argues it's a
property of WGAN-GP on this data, not of the rebuild. This script turns
that argument into an experiment: on the diverging config, flip ONE
rebuild-specific factor at a time and record the divergence-onset step.

Baseline config: procedural 4-class soft-edge data (1,920 pairs, the
attempt-2/3 dataset), full-size 64x128 architecture, batch 64, faithful
7-group update, f32, lr 2e-4 (the reference default, train.py:18),
nan_policy=halt, capped at `steps`.

Factors (each run = baseline with exactly one flip):
  rerun       — identical config re-executed (measures the TPU
                reduction-order run-nondeterminism floor)
  seed1/seed2 — PRNG seed (params + z stream + GP alpha)
  bf16        — --dtype bfloat16
  fast        — --update_mode fast (one-snapshot grads, single G update)
  noguards    — EDGEGAN_NAN_GUARDS=0: reference-exact numerics (no
                zero-variance/zero-gradient `where` guards; also forces
                the plain-XLA path since the Pallas kernels implement
                the guarded semantics)
  nopallas    — EDGEGAN_PALLAS=0 (guards kept; flips only the fused
                instance-norm kernel in the generators)
  update_sn   — --update_sn true (power-iteration u updated each step
                instead of the reference's frozen-u quirk Q3)

Interpretation: if onset for every factor lies within the spread set by
{baseline, rerun, seed1, seed2}, no rebuild-specific factor moves the
stability edge — the divergence is data-regime-driven, as claimed. Any
factor that moves onset systematically outside that spread is a parity
bug to chase.

Each run is a fresh subprocess (env flags are read at import/trace
time). Onset = first step whose metrics contain a non-finite value
(from metrics.jsonl); runs that stay finite to the cap record onset
None.

Usage: python scripts/stability_ablation.py [steps] [outdir] [lr] [arms]
  arms — optional comma-separated subset of variant tags to (re)run;
  results merge into an existing <outdir>/stability_ablation.json so an
  interrupted sweep resumes without repeating finished arms.
Writes: <outdir>/stability_ablation.json (+ a printed markdown table)
"""
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DATAROOT = '/tmp/edgegan_abl_data'
OUTPUTS = '/tmp/edgegan_abl_runs'


def stage_data():
    from genquality_run import stage
    if os.path.exists(os.path.join(DATAROOT, 'genshapes')):
        return 1920
    n_train, _ = stage(DATAROOT, seed=7, train_per_class=480,
                       test_per_class=24, num_classes=4)
    return n_train


def run_one(tag, steps, lr, extra_flags=(), env_extra=None, seed=0):
    """One train run in a subprocess; returns (onset_step, steps_run)."""
    out = os.path.join(OUTPUTS, tag)
    shutil.rmtree(out, ignore_errors=True)
    steps_per_epoch = 1920 // 64
    epochs = (steps + steps_per_epoch - 1) // steps_per_epoch
    cmd = [sys.executable, '-m', 'edgegan_tpu.cli.train',
           '--dataroot', DATAROOT, '--dataset', 'genshapes',
           '--num_classes', '4', '--name', tag, '--outputsroot', out,
           '--learning_rate', str(lr), '--epoch', str(epochs),
           '--seed', str(seed),
           '--save_checkpoint_frequency', '1000000',
           '--summary_frequency', '1000000',
           # host-drawn z (the pre-round-5 default): keeps every arm on
           # the SAME z stream as the round-3/4 onset data this table
           # extends — flipping to device z would change the latent
           # sequence and make onsets incomparable across rounds
           '--host_z', 'true',
           '--nan_policy', 'halt'] + list(extra_flags)
    env = dict(os.environ)
    env.update(env_extra or {})
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=7200)
    wall = time.time() - t0
    metrics_path = os.path.join(out, tag, 'logs', 'metrics.jsonl')
    onset, steps_run = None, 0
    if os.path.exists(metrics_path):
        for line in open(metrics_path):
            row = json.loads(line)
            if 'step' not in row:
                continue
            steps_run += 1
            vals = [v for k, v in row.items() if k not in ('step', 'epoch')]
            if onset is None and not all(
                    v == v and abs(v) != float('inf') for v in vals):
                onset = row['step']
    if proc.returncode not in (0, 1):  # 1 = halt; anything else is a bug
        print(proc.stdout[-2000:], file=sys.stderr)
        print(proc.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f'{tag}: train exited {proc.returncode}')
    shutil.rmtree(out, ignore_errors=True)  # keep disk bounded
    return onset, steps_run, wall


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    outdir = sys.argv[2] if len(sys.argv) > 2 else 'docs'
    lr = float(sys.argv[3]) if len(sys.argv) > 3 else 2e-4
    only = set(sys.argv[4].split(',')) if len(sys.argv) > 4 else None
    stage_data()

    runs = [
        ('baseline', (), None, 0),
        ('rerun', (), None, 0),
        ('seed1', (), None, 1),
        ('seed2', (), None, 2),
        ('bf16', ('--dtype', 'bfloat16'), None, 0),
        ('fast', ('--update_mode', 'fast'), None, 0),
        ('noguards', (), {'EDGEGAN_NAN_GUARDS': '0'}, 0),
        ('nopallas', (), {'EDGEGAN_PALLAS': '0'}, 0),
        ('update_sn', ('--update_sn', 'true'), None, 0),
        # seed-crossed XLA-path arms: noguards/nopallas both diverged at
        # the SAME step (guards never fire pre-divergence, so those two
        # trajectories are identical) — these distinguish "the plain-XLA
        # instance-norm path is systematically less stable" from "onset
        # is chaotic and the seed-0 XLA trajectory was unlucky".
        ('nopallas_seed1', (), {'EDGEGAN_PALLAS': '0'}, 1),
        ('nopallas_seed2', (), {'EDGEGAN_PALLAS': '0'}, 2),
    ]
    out_path = os.path.join(outdir, 'stability_ablation.json')
    results = {}
    if only is not None and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        if prior.get('lr') == lr:
            results = prior.get('results', {})
            # pre-round-5 files carried one global step_cap; stamp it
            # onto arms that don't record their own (caps are per-arm
            # now: the round-5 extension reruns the decisive arms at a
            # 5,000 cap while keeping the 2,520-cap arms' data)
            old_cap = prior.get('step_cap')
            for r in results.values():
                r.setdefault('step_cap', old_cap)

    os.makedirs(outdir, exist_ok=True)
    for tag, flags, env_extra, seed in runs:
        if only is not None and tag not in only:
            continue
        onset, steps_run, wall = run_one(tag, steps, lr, flags,
                                         env_extra, seed)
        results[tag] = {'onset': onset, 'steps_run': steps_run,
                        'step_cap': steps, 'wall_s': round(wall, 1)}
        print(f'{tag:12s} onset={onset} steps_run={steps_run} '
              f'wall={wall:.0f}s', flush=True)
        # persist incrementally: an interrupted sweep keeps finished arms
        payload = {'lr': lr, 'dataset':
                   'procedural 4-class soft-edge (1920 pairs, seed 7)',
                   'results': results}
        with open(out_path, 'w') as f:
            json.dump(payload, f, indent=2)

    print('\n| variant | divergence onset (step) | cap |')
    print('|---|---|---|')
    for tag, r in results.items():
        cell = (str(r['onset']) if r['onset'] is not None
                else f"finite through {r['steps_run']}")
        print(f"| {tag} | {cell} | {r.get('step_cap')} |")


if __name__ == '__main__':
    main()

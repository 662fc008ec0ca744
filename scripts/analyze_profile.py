"""Summarize a jax.profiler trace captured with `--profile_steps N`.

Usage:
  python scripts/analyze_profile.py outputs/<name>/logs/profile [--steps N]

Finds the newest `*.trace.json.gz` under the given directory, then
prints: total device time per step, time grouped by op kind, by output
shape, and the top individual fusions with their HLO signatures. This
is the round-2 workflow that produced the 128-config roofline analysis
in BASELINE.md, as a tool.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, '**', '*.trace.json.gz'), recursive=True))
    if not paths:
        raise SystemExit(f'no *.trace.json.gz under {trace_dir}')
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    device_pids = {e['pid'] for e in events
                   if e.get('ph') == 'M' and e.get('name') == 'process_name'
                   and 'TPU' in str(e.get('args', {}).get('name', ''))}
    ops = [e for e in events
           if e.get('ph') == 'X' and e.get('pid') in device_pids
           and 'dur' in e and not str(e['name']).isdigit()
           and not str(e['name']).startswith('jit_')]
    return paths[-1], ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('trace_dir')
    ap.add_argument('--steps', type=int, default=None,
                    help='steps captured (divides totals); default: '
                         'inferred from the most repeated event count')
    ap.add_argument('--top', type=int, default=15)
    args = ap.parse_args()

    path, ops = load_events(args.trace_dir)
    if not ops:
        raise SystemExit('no device op events in trace')
    steps = args.steps
    if steps is None:
        counts = collections.Counter(e['name'] for e in ops)
        steps = max(1, collections.Counter(counts.values()).most_common(1)[0][0])
    total = sum(e['dur'] for e in ops) / 1000 / steps
    print(f'trace: {path}')
    print(f'device op time: {total:.1f} ms/step over {steps} step(s), '
          f'{len(ops)} events\n')

    def bucket(keyfn, title):
        agg = collections.Counter()
        for e in ops:
            agg[keyfn(e)] += e['dur']
        print(title)
        for k, d in agg.most_common(args.top):
            print(f'  {d / 1000 / steps:8.2f} ms/step  {k}')
        print()

    bucket(lambda e: e['name'].split('.')[0], 'by op kind:')

    def shape_of(e):
        ln = (e.get('args') or {}).get('long_name', '')
        m = re.match(r'%\S+ = (\(?[a-z0-9]+\[[0-9,]*\])', ln)
        return m.group(1) if m else '??'

    bucket(shape_of, 'by output shape:')

    agg = collections.Counter()
    args_of = {}
    for e in ops:
        agg[e['name']] += e['dur']
        if e.get('args'):
            args_of[e['name']] = e['args'].get('long_name', '')
    print('top individual ops:')
    for name, d in agg.most_common(args.top):
        print(f'  {d / 1000 / steps:7.2f} ms/step  {name:24} '
              f'{args_of.get(name, "")[:110]}')


if __name__ == '__main__':
    main()

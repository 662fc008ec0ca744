"""metrics.jsonl read contract.

The train CLI appends to `<logdir>/metrics.jsonl` across restarts (the
reference resumes mid-epoch from the saved counter,
/root/reference/edgegan/models/edgegan.py:447-453), so after a resume
the file can contain the same step twice: once from the pre-kill run
and once from the resumed run. The contract:

- On every resume the CLI appends a marker line
  ``{"resumed_at": <counter>}`` before the first step line.
- Consumers read through :func:`read_metrics`, which skips marker
  lines and dedupes step lines by **last write** (the resumed run's
  value wins — it is the one the surviving checkpoint lineage
  produced).
"""
from __future__ import annotations

import json
from typing import Dict, List


def read_metrics(path: str) -> List[Dict]:
    """Parse a metrics.jsonl file into step rows.

    Skips ``resumed_at`` markers (and any other line without a
    ``step`` key), keeps the LAST occurrence of each step, and returns
    rows sorted by step.
    """
    by_step: Dict[int, Dict] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if 'step' not in row:
                continue  # resumed_at marker or other annotation
            by_step[row['step']] = row
    return [by_step[s] for s in sorted(by_step)]


def read_resume_markers(path: str) -> List[int]:
    """Counters at which the run was resumed (one per restart)."""
    markers = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if 'resumed_at' in row:
                markers.append(row['resumed_at'])
    return markers

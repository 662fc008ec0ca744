"""Checkpointing (reference models/edgegan.py:635-657 semantics).

Layout mirrors the reference: `outputs/<name>/checkpoints/` holding
step-numbered entries; resume picks the latest step. Orbax is the
engine; the directory name embeds the step like the reference's
`EdgeGAN-Model-<step>` so `load` can parse the counter back out.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

MODEL_NAME = 'EdgeGAN-Model'


def _ckpt_path(checkpoint_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(checkpoint_dir),
                        f'{MODEL_NAME}-{step}')


def save(checkpoint_dir: str, step: int, state: Any, keep: int = 5):
    """Save the full train state at `step`.

    Retains the newest `keep` checkpoints (tf.train.Saver's
    max_to_keep=5 default, reference models/edgegan.py:421); keep<=0
    disables the GC.
    """
    path = _ckpt_path(checkpoint_dir, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    # retention GC is a host-side delete: one process only
    if keep > 0 and jax.process_index() == 0:
        _gc(checkpoint_dir, keep)


def _gc(checkpoint_dir: str, keep: int):
    import shutil
    steps = []
    for name in os.listdir(checkpoint_dir):
        m = re.fullmatch(rf'{MODEL_NAME}-(\d+)', name)
        if m:
            steps.append(int(m.group(1)))
    for step in sorted(steps)[:-keep]:
        shutil.rmtree(_ckpt_path(checkpoint_dir, step), ignore_errors=True)


def latest_step(checkpoint_dir: str) -> Optional[int]:
    if not os.path.isdir(checkpoint_dir):
        return None
    steps = []
    for name in os.listdir(checkpoint_dir):
        m = re.fullmatch(rf'{MODEL_NAME}-(\d+)', name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def load(checkpoint_dir: str, abstract_state: Any) -> Tuple[bool, int, Any]:
    """Restore the latest checkpoint; returns (loaded, counter, state).

    Mirrors reference load(): returns (False, 0, None) when nothing is
    found (models/edgegan.py:641-657).
    """
    step = latest_step(checkpoint_dir)
    if step is None:
        return False, 0, None
    ckptr = ocp.StandardCheckpointer()
    shapes = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
    state = ckptr.restore(_ckpt_path(checkpoint_dir, step), shapes)
    return True, step, state


def load_raw(checkpoint_dir: str) -> Tuple[bool, int, Any]:
    """Restore the latest checkpoint WITHOUT a target tree.

    Returns the stored pytree as host arrays. Used by the test CLI,
    which — like the reference test graph (models/edgegan.py:519-547)
    — only needs the E/G1/G2 subtrees and must not depend on the
    train-time discriminator configuration.
    """
    step = latest_step(checkpoint_dir)
    if step is None:
        return False, 0, None
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(_ckpt_path(checkpoint_dir, step))
    return True, step, tree

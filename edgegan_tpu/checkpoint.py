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
#: suffix of a nan_policy=halt save: the state one step past the NaN
#: (params already non-finite). Kept for forensics, but invisible to
#: `load`'s newest-first walk, `latest_step`, and retention GC — a bare
#: relaunch after a halt must resume from the last FINITE checkpoint,
#: never walk into the NaN state (round-4 VERDICT weak #2: an
#: auto-restarting job did exactly that and GC'd the finite ladder away).
HALT_SUFFIX = '-halt'


def _ckpt_path(checkpoint_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(checkpoint_dir),
                        f'{MODEL_NAME}-{step}')


def save(checkpoint_dir: str, step: int, state: Any, keep: int = 5):
    """Save the full train state at `step`, blocking until durable.

    Retains the newest `keep` checkpoints (tf.train.Saver's
    max_to_keep=5 default, reference models/edgegan.py:421); keep<=0
    disables the GC.
    """
    # serialize behind any in-flight async save of the same run: two
    # concurrent writers against the same directory tree would race the
    # retention GC and Orbax's atomic-rename commit
    wait_for_async()
    path = _ckpt_path(checkpoint_dir, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    # retention GC is a host-side delete: one process only
    if keep > 0 and jax.process_index() == 0:
        _gc(checkpoint_dir, keep)


def save_halt(checkpoint_dir: str, step: int, state: Any):
    """Save a nan_policy=halt checkpoint under `EdgeGAN-Model-<step>-halt`.

    The plain-name namespace stays finite-only: this entry is excluded
    from `load`/`latest_step`/retention GC (see HALT_SUFFIX), so a bare
    relaunch resumes from the last finite cadence checkpoint and
    repeated halt->relaunch cycles can never GC the finite ladder away.
    Collective like `save` (every process enters the Orbax save). Only
    the newest halt entry is retained.
    """
    wait_for_async()
    path = _ckpt_path(checkpoint_dir, step) + HALT_SUFFIX
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        import shutil
        for name in os.listdir(checkpoint_dir):
            m = re.fullmatch(rf'{MODEL_NAME}-(\d+){HALT_SUFFIX}', name)
            if m and int(m.group(1)) != step:
                shutil.rmtree(os.path.join(checkpoint_dir, name),
                              ignore_errors=True)


def halt_steps(checkpoint_dir: str):
    """Steps of retained halt checkpoints (forensics; newest-only)."""
    if not os.path.isdir(checkpoint_dir):
        return []
    steps = []
    for name in os.listdir(checkpoint_dir):
        m = re.fullmatch(rf'{MODEL_NAME}-(\d+){HALT_SUFFIX}', name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def tree_finite(tree: Any) -> bool:
    """True iff every floating-point leaf of the pytree is finite."""
    import numpy as np
    for leaf in jax.tree.leaves(tree):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and \
                not np.isfinite(arr).all():
            return False
    return True


def prune_nonfinite_checkpoints(checkpoint_dir: str):
    """Delete newest-first every plain checkpoint whose params are
    non-finite; returns (newest_finite_step, pruned_steps).

    Salvages a diverged run's ladder down to its last finite entry (WGAN
    critics can diverge — BASELINE.md stability notes). Current runs
    don't produce non-finite plain entries anymore (halt saves go to the
    -halt namespace), but pre-round-5 runs and nan_policy=warn/ignore
    runs killed mid-divergence can. Raises SystemExit if nothing
    survives.
    """
    import numpy as np
    import shutil
    pruned = []
    while True:
        step = latest_step(checkpoint_dir)
        if step is None:
            raise SystemExit('no finite checkpoint survived')
        # pin the step: plain load_raw's newest-first walk SKIPS
        # non-finite entries, which would make this check the wrong one
        _, _, raw = load_raw(checkpoint_dir, step)
        leaves = [np.asarray(x) for x in jax.tree.leaves(raw['params'])]
        if all(np.isfinite(l).all() for l in leaves
               if np.issubdtype(l.dtype, np.floating)):
            return step, pruned
        pruned.append(step)
        shutil.rmtree(_ckpt_path(checkpoint_dir, step), ignore_errors=True)


# One AsyncCheckpointer per process: Orbax forbids overlapping saves on
# one instance, and `save_async` waits for the previous save before
# dispatching the next, so cadence saves form an ordered pipeline.
_async_ckptr = None
_async_pending = None  # (checkpoint_dir, keep) of the in-flight save


def save_async(checkpoint_dir: str, step: int, state: Any, keep: int = 5):
    """Kick off a checkpoint save and return without waiting for the
    file writes.

    The device->host copy happens before this returns (Orbax copies,
    then writes in a background thread), so the train loop only pays
    the transfer — on the remote-TPU tunnel the synchronous version
    cost 15-80 s per save (BASELINE.md reference-scale run), almost all
    of it serialization + fsync the device does not need to wait for.
    Callers MUST call `wait_for_async()` (or a blocking `save`) before
    process exit or restore. Multi-process: AsyncCheckpointer
    coordinates its commit barrier through the jax.distributed
    coordination service, so this stays collective like `save`.
    """
    global _async_ckptr, _async_pending
    wait_for_async()
    # Pull the state to host HERE with jax.device_get — the device->host
    # path validated on the remote-TPU 'axon' backend (metrics pull,
    # test CLI, convert.py) — instead of letting AsyncCheckpointer's
    # serialization machinery issue the transfers: its
    # replica_slices.transfer_arrays_to_host stalls indefinitely on
    # this backend (main thread parked in arr._value, zero tunnel
    # traffic; observed on the round-4 reference-scale run's first
    # cadence save). Handing Orbax host numpy arrays makes its internal
    # transfer a no-op and keeps the async benefit (serialization +
    # fsync on the background thread).
    host_state = jax.device_get(state)
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    _async_ckptr.save(_ckpt_path(checkpoint_dir, step),
                      args=ocp.args.StandardSave(host_state), force=True)
    _async_pending = (checkpoint_dir, keep)


def wait_for_async():
    """Block until the in-flight `save_async` (if any) is durable, then
    run its retention GC (deferred so the GC can never delete an entry
    while its own save is mid-commit)."""
    global _async_pending
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    if _async_pending is not None:
        checkpoint_dir, keep = _async_pending
        _async_pending = None
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


def _all_steps(checkpoint_dir: str):
    if not os.path.isdir(checkpoint_dir):
        return []
    steps = []
    for name in os.listdir(checkpoint_dir):
        m = re.fullmatch(rf'{MODEL_NAME}-(\d+)', name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_step(checkpoint_dir: str) -> Optional[int]:
    steps = _all_steps(checkpoint_dir)
    return steps[-1] if steps else None


def _restore_newest(checkpoint_dir: str, restore_one):
    """Try checkpoints newest->oldest, skipping corrupt and non-finite
    entries.

    A preemption that lands mid-save (SIGKILL after SIGTERM started the
    preemption checkpoint, disk-full, ...) can leave the newest entry
    present but truncated; Orbax then raises mid-restore. Production
    resume semantics are to fall back to the previous complete
    checkpoint, not to crash the relaunched job (observed in the wild:
    a killed run left EdgeGAN-Model-502 with truncated zstd streams).

    Non-finite entries (a SIGTERM/warn-policy save that landed after the
    WGAN critics diverged, or a pre-round-5 halt save) are equally
    unusable: resuming from NaN params just halts again one step later.
    Skip them the same way — the finite ladder below is the real resume
    point.
    """
    for step in reversed(_all_steps(checkpoint_dir)):
        try:
            restored = restore_one(step)
        except Exception as e:  # corrupt/partial entry: fall back
            print(f' [!] checkpoint {MODEL_NAME}-{step} unreadable '
                  f'({type(e).__name__}); trying previous')
            continue
        if not tree_finite(restored):
            print(f' [!] checkpoint {MODEL_NAME}-{step} has non-finite '
                  f'values; trying previous')
            continue
        return True, step, restored
    return False, 0, None


def load(checkpoint_dir: str, abstract_state: Any) -> Tuple[bool, int, Any]:
    """Restore the newest readable checkpoint; returns
    (loaded, counter, state).

    Mirrors reference load(): returns (False, 0, None) when nothing is
    found (models/edgegan.py:641-657) — or when every entry is corrupt.
    """
    ckptr = ocp.StandardCheckpointer()
    shapes = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)

    def restore_one(step):
        return ckptr.restore(_ckpt_path(checkpoint_dir, step), shapes)

    return _restore_newest(checkpoint_dir, restore_one)


def load_raw(checkpoint_dir: str,
             step: Optional[int] = None) -> Tuple[bool, int, Any]:
    """Restore the newest readable checkpoint WITHOUT a target tree.

    Returns the stored pytree as host arrays. Used by the test CLI,
    which — like the reference test graph (models/edgegan.py:519-547)
    — only needs the E/G1/G2 subtrees and must not depend on the
    train-time discriminator configuration.

    `step` pins a specific retained checkpoint instead of the newest —
    used by quality-trajectory sweeps (scripts/fid_curve.py).
    """
    ckptr = ocp.PyTreeCheckpointer()

    def restore_one(s):
        return ckptr.restore(_ckpt_path(checkpoint_dir, s))

    if step is not None:
        if step not in _all_steps(checkpoint_dir):
            return False, 0, None
        return True, step, restore_one(step)
    return _restore_newest(checkpoint_dir, restore_one)

"""Training entry point: `python -m edgegan_tpu.cli.train`.

Flag-compatible with the reference `python -m edgegan.train`
(/root/reference/edgegan/train.py). One fused jitted step replaces the
reference's ~14 graph executions per batch; the batch is sharded over
the 'data' mesh axis; the host loader prefetches asynchronously.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import time

import jax
import numpy as np

from ..core.config import Config, add_config_args, config_from_args
from ..data import Dataset, PrefetchLoader
from ..parallel import (barrier, batch_sharding, create_mesh,
                        is_process_zero, maybe_distributed_init, put_global,
                        replicated, warm_collectives)
from ..train import Networks, create_train_state, make_train_step
from .. import checkpoint as ckpt
from ..utils import makedirs, show_all_variables


def main(argv=None):
    # Live-debug hook: `kill -USR1 <pid>` dumps every thread's Python
    # stack to stderr without disturbing the run — the only way to see
    # where a long-running trainer is blocked on this image (no
    # gdb/py-spy; device calls over the remote-TPU tunnel can stall).
    import faulthandler
    import signal as _signal
    if hasattr(_signal, 'SIGUSR1'):
        try:
            faulthandler.register(_signal.SIGUSR1, all_threads=True)
        except (io.UnsupportedOperation, AttributeError, ValueError):
            pass  # pytest capsys replaces stderr with a fileno-less object
    parser = argparse.ArgumentParser('edgegan_tpu.train')
    add_config_args(parser, 'train')
    args = parser.parse_args(argv)
    config = config_from_args(args).derive('train')
    maybe_distributed_init()
    from ..core.config import enable_compilation_cache
    enable_compilation_cache()
    # Host-side writes (flags.json, metrics, TB, stdout) belong to
    # process 0 only; checkpoint saves stay collective (Orbax).
    p0 = is_process_zero()
    if p0:
        config.save()
    makedirs(config.checkpoint_dir)
    makedirs(config.logdir)

    dataset_config = {
        'input_height': config.input_height,
        'input_width': config.input_width,
        'output_height': config.output_height,
        'output_width': config.output_width,
        'crop': config.crop,
        'grayscale': False,
        'z_dim': config.z_dim,
    }
    nproc = jax.process_count()
    dataset = Dataset(config.dataroot, config.dataset, config.train_size,
                      config.batch_size, dataset_config,
                      config.num_classes, 'train',
                      cache=config.cache_data,
                      # multi-process: shared-seeded shuffle rng so all
                      # hosts agree on the file order; each decodes only
                      # its batch shard
                      rng=(np.random.RandomState(config.seed)
                           if nproc > 1 else None),
                      shard=(jax.process_index(), nproc),
                      seed=config.seed,
                      host_z=config.host_z)

    mesh = create_mesh() if config.data_parallel else None
    data_sharding = batch_sharding(mesh) if mesh else None

    nets = Networks(config)
    rng = jax.random.PRNGKey(config.seed)
    state = create_train_state(nets, rng, config.learning_rate)
    # Per-step rng stream, selectable by --rng_salt (divergence rescue:
    # a relaunch with a new salt resumes from the last finite checkpoint
    # on a fresh GP-alpha/encoder-noise/device-z stream instead of
    # deterministically replaying into the same divergence). Param init
    # above stays on the UNSALTED key — rescued runs restore params from
    # the checkpoint anyway, and fresh runs stay seed-reproducible.
    step_stream = (jax.random.fold_in(rng, config.rng_salt)
                   if config.rng_salt else rng)
    if p0:
        show_all_variables(state.params)
    if mesh is not None:
        # The replicated device_put below is itself a COLLECTIVE at
        # nproc>1 (jax verifies replicated values across processes via a
        # Gloo/ICI allgather), and it is the first executed collective
        # of the process — rendezvous first, or import/init-time skew
        # between processes (> the ~30 s Gloo context key-exchange
        # window on a loaded host) kills the faster peer. Observed on
        # the full-size nproc=2 resume (scripts/mp_fullsize_run.py):
        # segment 2 died here with GetKeyValue() DEADLINE_EXCEEDED.
        barrier('edgegan_state_replicate')
        state = jax.device_put(state, replicated(mesh))

    counter = 1
    loaded, ckpt_counter, restored = ckpt.load(config.checkpoint_dir, state)
    if loaded:
        state = restored
        if mesh is not None:
            state = jax.device_put(state, replicated(mesh))
        counter = ckpt_counter
        if p0:
            print(' [*] Load SUCCESS')
    elif p0:
        print(' [!] Load failed...')

    # Pack the ~11 scalar metrics into ONE stacked f32 array inside the
    # jitted step: a device_get of a dict pulls leaf-by-leaf, and on the
    # remote-TPU tunnel each leaf is its own round trip — measured as
    # the dominant per-step host cost of the real loop (~0.09 s/step of
    # the 0.15 s/step steady state; bench.py at 0.056 and the realdata
    # bench at 0.061 never pull metrics). One array = one transfer.
    # `metric_names` fills at trace time (before any result is pulled).
    base_step = make_train_step(nets, config)
    metric_names = []

    def packed_step(state, images, z, rng):
        new_state, metrics = base_step(state, images, z, rng)
        names = sorted(metrics)
        if not metric_names:
            metric_names.extend(names)
        return new_state, jax.numpy.stack(
            [metrics[k].astype(jax.numpy.float32) for k in names])

    train_step = jax.jit(packed_step, donate_argnums=(0,))
    if nproc > 1:
        # AOT-compile on every process, then rendezvous. Without this,
        # inter-process compile-time skew (persistent-cache hit on one
        # host, cold compile on another) makes the faster process die
        # in its first collective: Gloo/ICI context creation only waits
        # ~30 s for the peer (see parallel.barrier).
        zdim = config.z_feed_width()
        local_b = config.batch_size // nproc
        img_dt = (jax.numpy.bfloat16 if config.dtype == 'bfloat16'
                  else np.float32)
        di, dz = put_global(
            data_sharding,
            np.zeros((local_b, config.output_height, config.output_width,
                      3), img_dt),
            np.zeros((local_b, zdim), np.float32))
        dkey = jax.device_put(jax.random.fold_in(step_stream, 0),
                              replicated(mesh))
        train_step = train_step.lower(state, di, dz, dkey).compile()
        barrier('edgegan_train_step_compiled')
        # create the Gloo/ICI communicator contexts inside the
        # synchronized window right after the barrier — the host work
        # below (SummaryWriter, metrics file, loader) is asymmetric
        # across processes and can exceed the ~30 s context-creation
        # deadline on a loaded host (see parallel.warm_collectives)
        warm_collectives(mesh)
    metrics_log = (open(os.path.join(config.logdir, 'metrics.jsonl'), 'a')
                   if p0 else None)
    if p0 and loaded:
        # resume contract (utils/metrics_io.py): the file is appended
        # across restarts, so steps after the restored counter appear
        # twice; mark the resume point and let read_metrics dedupe by
        # last write.
        metrics_log.write(json.dumps({'resumed_at': counter}) + '\n')
        metrics_log.flush()
    from ..summaries import SummaryWriter
    tb = SummaryWriter(config.logdir, nets, config) if p0 else None

    # Preemption-safe shutdown: on SIGTERM/SIGINT, finish the current
    # step, save a checkpoint, and exit cleanly. (The reference can lose
    # up to save_checkpoint_frequency steps on a mid-run kill,
    # models/edgegan.py:487-489.)
    #
    # Single-process: a Python signal handler sets a flag.
    # Multi-process: a one-sided collective save would deadlock, so the
    # decision must be collective — jax.distributed's preemption sync
    # manager (its C++ SIGTERM watcher broadcasts the notice through the
    # coordination service; reached_preemption_sync_point returns True at
    # the SAME step on every process). Don't also install a Python
    # handler there: it would shadow the watcher's.
    import signal
    stop_requested = []

    def _request_stop(signum, frame):
        stop_requested.append(signum)

    preemption_sync = None
    if nproc == 1:
        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, _request_stop)
    else:
        from jax.experimental import multihost_utils

        def preemption_sync(step):  # noqa: F811
            try:
                return multihost_utils.reached_preemption_sync_point(step)
            except RuntimeError:  # sync manager unavailable on backend
                return False

    profiling = False
    nan_streak = False
    halted = []
    start_time = time.time()

    def process_metrics(step_counter, epoch, idx, device_metrics):
        """Pull one step's metrics to the host and run the logging /
        NaN-policy protocol on them.

        Called one step BEHIND the dispatch (the loop dispatches step
        N+1 before pulling step N): by the time the transfer starts the
        step has long finished on-device, and the pull overlaps step
        N+1's execution instead of serializing with it. On the remote
        TPU tunnel the synchronous version cost the reference-scale run
        ~0.14 s/step of the 0.20 s/step total (BASELINE.md round 4).
        """
        nonlocal nan_streak
        # The step returns metrics as ONE stacked f32 array (see
        # packed_step): a single device->host transfer per step. The
        # array is replicated, so EVERY process pulls its local copy:
        # the NaN-halt decision below is taken identically on all
        # processes, making the Orbax save collective.
        if nproc > 1:
            vals = np.asarray(device_metrics.addressable_data(0))
        else:
            vals = np.asarray(jax.device_get(device_metrics))
        metrics = {k: float(v) for k, v in zip(metric_names, vals)}
        if p0:
            d_err = (metrics.get('joint_dis_dloss', 0.0)
                     + metrics.get('image_dis_dloss', 0.0)
                     + metrics.get('edge_dis_dloss', 0.0))
            g_err = (metrics.get('edge_gloss', 0.0)
                     + metrics.get('image_gloss', 0.0))
            # reference stdout format incl. the 2x d-loss quirk Q11
            # (models/edgegan.py:484-486)
            print('Epoch: [%2d/%2d] [%4d/%4d] time: %4.4f, '
                  'joint_dis_dloss: %.8f, joint_dis_gloss: %.8f'
                  % (epoch, config.epoch, idx, len(dataset),
                     time.time() - start_time, 2 * d_err, g_err))
            metrics_log.write(json.dumps(
                {'step': step_counter, 'epoch': epoch, **metrics}) + '\n')
            metrics_log.flush()
            tb.scalars(step_counter, metrics)
        # NaN detection (the reference trains on silently; WGAN
        # critics can diverge on degenerate data — BASELINE.md).
        # Runs on all processes over the replicated metrics, so
        # halt's checkpoint-save is a proper collective.
        bad = [k for k, v in metrics.items() if not np.isfinite(v)]
        if bad and config.nan_policy != 'ignore':
            if not nan_streak and p0:
                print(f' [!] non-finite losses at step {step_counter}: '
                      f'{",".join(sorted(bad))}')
            nan_streak = True
            if config.nan_policy == 'halt':
                halted.append(step_counter)
        else:
            nan_streak = False
    # One loader (and thread pool) for the whole run; each epoch's
    # iteration submits fresh decode futures against the reshuffled
    # dataset. (A per-epoch pool with shutdown(wait=False) leaks worker
    # threads briefly every epoch.)
    # bf16 training transfers bf16 batches: the step casts inputs to
    # bf16 anyway, and host->device bytes are the input pipeline's real
    # cost on this backend (BASELINE.md round 3)
    loader = PrefetchLoader(
        dataset, prefetch=config.prefetch, sharding=data_sharding,
        image_dtype=(jax.numpy.bfloat16
                     if config.dtype == 'bfloat16' else None))
    # metrics of the step dispatched last loop iteration, pulled AFTER
    # this iteration's dispatch so the transfer overlaps execution:
    # (counter, epoch, idx, device_metrics)
    pending = None
    for epoch in range(config.epoch):
        if stop_requested or halted:
            break
        dataset.shuffle()
        for idx, (batch_images, batch_z, _files) in enumerate(loader):
            if (p0 and config.profile_steps and counter == 2
                    and not profiling):
                jax.profiler.start_trace(
                    os.path.join(config.logdir, 'profile'))
                profiling = True
            step_rng = jax.random.fold_in(step_stream, counter)
            if nproc > 1:
                # match the AOT-compiled executable's input sharding
                step_rng = jax.device_put(step_rng, replicated(mesh))
            state, device_metrics = train_step(state, batch_images,
                                               batch_z, step_rng)
            counter += 1
            if pending is not None:
                process_metrics(*pending)
            pending = (counter, epoch, idx, device_metrics)
            if halted:
                break
            if p0 and counter % config.summary_frequency == 0:
                tb.extras(counter, state, batch_images, batch_z)
            # Multi-process preemption: all processes agree on the same
            # stop step through the coordination service.
            if preemption_sync is not None and preemption_sync(counter):
                stop_requested.append(signal.SIGTERM)
            if profiling and counter >= 2 + config.profile_steps:
                jax.block_until_ready(state.step)
                jax.profiler.stop_trace()
                profiling = False
                print(f' [*] Profile written to {config.logdir}/profile')
            # save cadence quirk Q9 (models/edgegan.py:487-489);
            # collective — every process enters the Orbax save. Async:
            # the loop only pays the device->host copy; serialization
            # and fsync happen on a background thread (the synchronous
            # version cost the reference-scale run 15-80 s per save).
            if counter % config.save_checkpoint_frequency == 2:
                if p0:
                    print(' [*] Saving checkpoints...')
                ckpt.save_async(config.checkpoint_dir, counter, state,
                                keep=config.keep_checkpoint_max)
            if stop_requested:
                break
    if pending is not None and not halted:
        process_metrics(*pending)  # the final step's metrics
    if halted:
        if p0:
            print(' [!] nan_policy=halt: saving checkpoint and exiting')
        # The state is one step past the NaN (params already non-finite):
        # save it under the -halt namespace, invisible to resume and to
        # retention GC, so a bare relaunch restores the last FINITE
        # cadence checkpoint instead of halting again one step later.
        ckpt.save_halt(config.checkpoint_dir, counter, state)
        loader.close()
        raise SystemExit(1)
    if stop_requested:
        if p0:
            print(f' [*] Caught signal {stop_requested[0]}: saving '
                  f'checkpoint at counter {counter} and exiting')
        ckpt.save(config.checkpoint_dir, counter, state,
                  keep=config.keep_checkpoint_max)
    # a cadence save_async may still be writing: make it durable before
    # the process exits (save() above already waits when it ran)
    ckpt.wait_for_async()
    loader.close()
    if profiling:
        jax.profiler.stop_trace()
    if p0:
        metrics_log.close()
        tb.close()


if __name__ == '__main__':
    main()

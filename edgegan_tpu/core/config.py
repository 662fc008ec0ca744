"""Configuration dataclasses.

Field names and defaults mirror the reference flag sets
(/root/reference/edgegan/train.py:13-75 and test.py:17-67) so that a
user of the reference CLI can switch over without relearning flags.
`update_flags` / `save_flags` reproduce the derived-path logic and the
outputs/<name>/flags.json dump (train.py:85-107).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


@dataclasses.dataclass
class Config:
    # shared flags (train.py:13-75 / test.py:17-67)
    gpu: str = '0'                       # kept for CLI parity; unused on TPU
    name: str = 'edgegan'
    outputsroot: str = 'outputs'
    epoch: int = 100
    learning_rate: float = 2e-4
    train_size: float = float('inf')
    batch_size: int = 64
    input_height: int = 64
    input_width: Optional[int] = 128
    output_height: int = 64
    output_width: Optional[int] = 128
    dataset: str = 'class14'
    input_fname_pattern: str = '*png'
    checkpoint_dir: Optional[str] = None
    logdir: Optional[str] = None
    dataroot: str = './data'
    save_checkpoint_frequency: int = 500
    crop: bool = False

    stage1_zl_loss: float = 10.0
    multiclasses: bool = True
    num_classes: Optional[int] = 14
    SPECTRAL_NORM_UPDATE_OPS: str = 'spectral_norm_update_ops'

    if_resnet_e: bool = True
    if_resnet_g: bool = False
    if_resnet_d: bool = False
    lambda_gp: float = 10.0

    E_norm: str = 'instance'
    G_norm: str = 'instance'
    D_norm: str = 'instance'

    use_image_discriminator: bool = True
    image_dis_size: int = 128
    use_edge_discriminator: bool = True
    edge_dis_size: int = 128
    joint_dweight: float = 1.0
    image_dweight: float = 1.0
    edge_dweight: float = 1.0
    z_dim: int = 100

    # test-only flags (test.py:45-54)
    test_output_dir: Optional[str] = None
    output_combination: str = 'full'
    type: str = 'gpwgan'
    optim: str = 'rmsprop'
    model: str = 'old'

    # --- TPU-native additions (no reference counterpart) ---
    seed: int = 0                 # PRNG seed for params/noise
    dtype: str = 'float32'        # compute dtype: float32 | bfloat16
    update_mode: str = 'faithful'  # 'faithful' = sequential 7-group
    #                                 chaining (models/edgegan.py:126-130);
    #                                 'fast' = all grads from one snapshot
    update_sn: bool = False       # False reproduces quirk Q3 (frozen u)
    data_parallel: bool = True    # shard batch over the 'data' mesh axis
    prefetch: int = 2             # host loader prefetch depth
    profile_steps: int = 0        # >0: jax.profiler trace of N steps
    #                               (written to <logdir>/profile)
    cache_data: bool = True       # RAM-cache decoded images (the
    #                               reference re-decodes every epoch)
    summary_frequency: int = 100  # steps between TB histogram/image
    #                               summaries (reference writes every
    #                               step; set 1 for that behavior)
    reference_metrics: bool = False  # True re-evaluates the reported
    #                               losses AFTER all optimizer groups,
    #                               matching the reference's logging
    #                               protocol (models/edgegan.py:464-486)
    #                               at the cost of extra forward passes;
    #                               False logs each group's own loss.
    keep_checkpoint_max: int = 5  # retained checkpoints (tf.train.Saver
    #                               max_to_keep default,
    #                               models/edgegan.py:421); 0 = keep all
    test_batch_size: int = 0      # >0: opt-in inference throughput mode
    #                               (reference parity forces batch 1,
    #                               test.py:89; the fused forward is
    #                               batch-agnostic). Trailing files that
    #                               don't fill a batch are dropped (Q10).
    nan_policy: str = 'warn'      # non-finite metrics: 'warn' (print
    #                               once per streak), 'halt' (save a
    #                               checkpoint and exit 1), 'ignore'
    #                               (reference behavior: train on).
    rng_salt: int = 0             # Divergence-rescue stream selector:
    #                               folded into the per-step rng stream
    #                               (GP alpha, encoder noise, device-z
    #                               draws) but NOT into param init. A
    #                               relaunch with a new salt resumes from
    #                               the last finite checkpoint on a fresh
    #                               noise stream, escaping a WGAN-GP
    #                               divergence attractor that a
    #                               deterministic replay would walk
    #                               straight back into. 0 = the unsalted
    #                               stream (bit-exact with pre-salt runs).
    host_z: bool = False          # False (default): z latents are drawn
    #                               INSIDE the jitted step from the step
    #                               rng — nothing transferred per step,
    #                               backend-exact under DP (one global
    #                               draw, rows sharded with the batch).
    #                               True: the dataset draws z on the host
    #                               per batch (the reference's
    #                               dataset.py:72-73 semantics, kept for
    #                               the --seed bit-reproducible z-stream
    #                               contract) and transfers it f32.

    def derive(self, phase: str = 'train') -> 'Config':
        """Reference update_flags (train.py:85-98, test.py:85-97)."""
        cfg = dataclasses.replace(self)
        if cfg.input_width is None:
            cfg.input_width = cfg.input_height
        if cfg.output_width is None:
            cfg.output_width = cfg.output_height
        if phase == 'train' and not cfg.multiclasses:
            cfg.num_classes = None
        if phase == 'test':
            cfg.batch_size = 1  # test.py:89 forces batch 1
        path = os.path.join(cfg.outputsroot, cfg.name)
        cfg.checkpoint_dir = os.path.join(path, 'checkpoints')
        cfg.logdir = os.path.join(path, 'logs')
        cfg.test_output_dir = os.path.join(path, 'test_output')
        return cfg

    def z_feed_width(self) -> int:
        """Width of the per-batch z array the train step is fed.

        host_z: the full latent + class-id column (reference placeholder
        [None, 101], models/edgegan.py:188-197). Device z: only the
        class-id column crosses the wire (multiclass), or nothing."""
        if self.host_z:
            return self.z_dim + (1 if self.multiclasses else 0)
        return 1 if self.multiclasses else 0

    def save(self):
        """Dump flags.json like reference train.py:100-107."""
        path = os.path.join(self.outputsroot, self.name)
        os.makedirs(path, exist_ok=True)
        d = {k: (str(v) if v == float('inf') else v)
             for k, v in dataclasses.asdict(self).items()}
        with open(os.path.join(path, 'flags.json'), 'w') as f:
            json.dump(d, f, indent=4)


def enable_compilation_cache(path: str = '/tmp/edgegan_jax_cache'):
    """Persistent XLA compilation cache: cuts the ~5-min first compile
    of the train step to ~2 min on repeat runs (measured). Safe no-op
    if the backend ignores it."""
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass


def add_config_args(parser, phase: str = 'train'):
    """Attach every Config field as a --flag (argparse front-end)."""
    for field in dataclasses.fields(Config):
        name = f'--{field.name}'
        default = field.default
        if field.type in ('bool', bool) or isinstance(default, bool):
            parser.add_argument(name, type=lambda s: s.lower() in
                                ('1', 'true', 'yes'), default=default)
            parser.add_argument(f'--no{field.name}', dest=field.name,
                                action='store_false')
        elif isinstance(default, int):
            parser.add_argument(name, type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(name, type=float, default=default)
        else:
            parser.add_argument(name, type=str, default=default)
    return parser


def config_from_args(args) -> Config:
    names = {f.name for f in dataclasses.fields(Config)}
    return Config(**{k: v for k, v in vars(args).items() if k in names})

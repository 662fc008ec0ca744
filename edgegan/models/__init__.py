"""`edgegan.models` import shim -> edgegan_tpu.models.

The reference exposes Generator / Discriminator / Encoder / Classifier
network classes (/root/reference/edgegan/models/__init__.py:1-5). The
rebuild's counterparts are Flax modules with functional (params-in)
call signatures rather than TF1 session graphs — same architectures,
JAX-native API. The TF1 `EdgeGAN(sess, config, dataset)` orchestrator
has no object-level counterpart; its train/test behavior lives in
`edgegan_tpu.train.step` / `edgegan_tpu.infer` behind the CLI
(docs/MIGRATION.md "API mapping").
"""
from edgegan_tpu.models import Classifier, Discriminator, Encoder, Generator

__all__ = ['Classifier', 'Discriminator', 'Encoder', 'Generator']

"""Drop-in CLI surface: `python -m edgegan.train` / `python -m edgegan.test`.

Thin aliases onto edgegan_tpu.cli so users of the reference
(sysu-imsl/EdgeGAN) can switch without changing their invocations.
"""

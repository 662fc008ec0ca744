"""`edgegan.utils.data` shim -> edgegan_tpu.data (same Dataset layout,
reference /root/reference/edgegan/utils/data/dataset.py semantics)."""
from edgegan_tpu.data import Dataset

__all__ = ['Dataset']

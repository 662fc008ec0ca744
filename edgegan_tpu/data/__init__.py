from .dataset import Dataset, extension_match_recursive
from .loader import PrefetchLoader

__all__ = ['Dataset', 'PrefetchLoader', 'extension_match_recursive']

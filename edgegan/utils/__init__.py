"""`edgegan.utils` import shim -> edgegan_tpu.utils.

Every reference util (/root/reference/edgegan/utils/utils.py) has a
bit-compatible counterpart in edgegan_tpu.utils.images (scipy
bytescale contrast stretch, +0.4999 rounding, uint8 resize
round-trip). `edgegan.utils.data.Dataset` maps to the rebuild's
Dataset with identical glob layout and Q10 semantics.
"""
from edgegan_tpu.utils import (bytescale, center_crop, get_image,
                               image_manifold_size, imread, imresize,
                               imsave, inverse_transform, make_gif,
                               makedirs, merge, merge_images, save_images,
                               show_all_variables, transform)

__all__ = ['bytescale', 'center_crop', 'get_image', 'image_manifold_size',
           'imread', 'imresize', 'imsave', 'inverse_transform', 'make_gif',
           'makedirs', 'merge', 'merge_images', 'save_images',
           'show_all_variables', 'transform']

from .images import (bytescale, center_crop, get_image, image_manifold_size,
                     imread, imresize, imsave, inverse_transform, make_gif,
                     makedirs, merge, merge_images, save_images,
                     show_all_variables, transform)
from .metrics_io import read_metrics, read_resume_markers

__all__ = ['bytescale', 'center_crop', 'get_image', 'image_manifold_size',
           'imread', 'imresize', 'imsave', 'inverse_transform', 'make_gif',
           'makedirs', 'merge', 'merge_images', 'read_metrics',
           'read_resume_markers', 'save_images', 'show_all_variables',
           'transform']

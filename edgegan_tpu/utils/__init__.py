from .images import (bytescale, center_crop, get_image, image_manifold_size,
                     imread, imresize, imsave, inverse_transform, make_gif,
                     makedirs, merge, merge_images, save_images,
                     show_all_variables, transform)

__all__ = ['bytescale', 'center_crop', 'get_image', 'image_manifold_size',
           'imread', 'imresize', 'imsave', 'inverse_transform', 'make_gif',
           'makedirs', 'merge', 'merge_images', 'save_images',
           'show_all_variables', 'transform']

from .images import (bytescale, center_crop, get_image, imread, imresize,
                     imsave, inverse_transform, makedirs, merge, save_images,
                     transform)

__all__ = ['bytescale', 'center_crop', 'get_image', 'imread', 'imresize',
           'imsave', 'inverse_transform', 'makedirs', 'merge', 'save_images',
           'transform']

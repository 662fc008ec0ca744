from .classifier import Classifier
from .discriminator import Discriminator
from .encoder import Encoder
from .generator import Generator

__all__ = ['Classifier', 'Discriminator', 'Encoder', 'Generator']

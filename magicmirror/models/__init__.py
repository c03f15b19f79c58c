from .attribute_encoder import AttributeEncoder
from .discriminators import Discriminator, MSDiscriminator

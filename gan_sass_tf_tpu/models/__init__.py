"""Model zoo: spectral-masking generators + conv/BN/LeakyReLU discriminators
(reference layer L5), selected by name through the registry."""

from gan_sass_tf_tpu.models import generator, discriminator  # noqa: F401  (register)
from gan_sass_tf_tpu.models.registry import (
    build_discriminator,
    build_generator,
    list_discriminators,
    list_generators,
    register_discriminator,
    register_generator,
)
from gan_sass_tf_tpu.models.generator import (
    BiLSTMGenerator,
    ConvUNetGenerator,
    MaskHead,
    ToyMLPGenerator,
)
from gan_sass_tf_tpu.models.discriminator import ConvDiscriminator, PatchDiscriminator

__all__ = [
    "build_generator", "build_discriminator",
    "list_generators", "list_discriminators",
    "register_generator", "register_discriminator",
    "ToyMLPGenerator", "ConvUNetGenerator", "BiLSTMGenerator", "MaskHead",
    "ConvDiscriminator", "PatchDiscriminator",
]

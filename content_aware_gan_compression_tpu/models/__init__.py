"""Model families: StyleGAN2 G/D (reference model.py), BiSeNet face parser
(reference Util/face_parsing/), FID InceptionV3 (reference Evaluation/
inception.py) and LPIPS VGG16 (reference lpips/) — all as functional JAX
models over param pytrees."""

from .stylegan2 import (
    GeneratorConfig,
    DiscriminatorConfig,
    default_channels,
    default_net_shape,
    net_shape_from_params,
    generator_init,
    generator_apply,
    generator_mean_latent,
    generator_get_latent,
    generator_make_noise,
    discriminator_init,
    discriminator_apply,
)

__all__ = [
    "GeneratorConfig",
    "DiscriminatorConfig",
    "default_channels",
    "default_net_shape",
    "net_shape_from_params",
    "generator_init",
    "generator_apply",
    "generator_mean_latent",
    "generator_get_latent",
    "generator_make_noise",
    "discriminator_init",
    "discriminator_apply",
]

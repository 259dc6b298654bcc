"""Latent-space image projection (reference get_projected_image.py +
Miscellaneous/Image2StyleGAN_util.py; the reference's actual optimizer module
Evaluation/image_projection is absent from its repo, so behavior is
reconstructed from the call sites — SURVEY.md section 2.1)."""

from .project import (
    image_projector,
    image_reconstruction_loss,
    psnr,
    img_to_tensor,
    latent_style_mixing,
    noise_style_mixing,
)

__all__ = [
    "image_projector",
    "image_reconstruction_loss",
    "psnr",
    "img_to_tensor",
    "latent_style_mixing",
    "noise_style_mixing",
]

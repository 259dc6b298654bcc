"""GAN + distillation losses (reference train.py:145-206)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.lpips import lpips_apply
from ..pruning.content_aware import (
    batch_img_parsing, batch_img_parsing_nhwc,
    get_masked_tensor, get_masked_tensor_nhwc,
)


def d_logistic_loss(real_pred, fake_pred):
    """Softplus logistic D loss (reference train.py:187-191)."""
    return (jax.nn.softplus(-real_pred).mean()
            + jax.nn.softplus(fake_pred).mean())


def g_nonsaturating_loss(fake_pred):
    """Non-saturating G loss (reference train.py:203-206)."""
    return jax.nn.softplus(-fake_pred).mean()


def r1_penalty(d_apply, d_params, real_img):
    """R1 = E[||grad_x D(x)||^2] (reference train.py:194-200). Returns the
    raw penalty; the caller weighs by r1/2 * d_reg_every."""
    def score_sum(img):
        return d_apply(d_params, img).sum()

    grad_real = jax.grad(score_sum)(real_img)
    return jnp.mean(jnp.sum(
        jnp.square(grad_real.reshape(grad_real.shape[0], -1)), axis=1))


def _downsample_256(img_nchw):
    # antialias=False matches torch F.interpolate(bilinear,
    # align_corners=False) — the reference's pooling for >256px KD-LPIPS
    # inputs (train.py:176-182); jax's antialias default would deviate.
    n, c = img_nchw.shape[0], img_nchw.shape[1]
    return jax.image.resize(img_nchw, (n, c, 256, 256), method="bilinear",
                            antialias=False)


def _downsample_256_nhwc(img_nhwc):
    n, c = img_nhwc.shape[0], img_nhwc.shape[3]
    return jax.image.resize(img_nhwc, (n, 256, 256, c), method="bilinear",
                            antialias=False)


def kd_loss(
    fake_img, fake_img_list, teacher_img_list, *,
    kd_l1_lambda, kd_lpips_lambda, kd_mode, size,
    lpips_params=None, parse_fn=None, lpips_image_size=256,
    data_format="NCHW", aux_dtype=None,
):
    """Content-masked knowledge distillation (reference KD_loss,
    train.py:145-184): L1 between (COI-masked) student/teacher images —
    either final output only or summed over the per-scale rgb list — plus
    LPIPS between the (masked, possibly 256-pooled) final images.

    The teacher's parsing defines the mask for BOTH images; gradients flow
    only through the student (teacher tensors arrive stop-gradiented).

    aux_dtype: compute dtype for the aux-net trunks (the VGG16 of LPIPS;
    the parse_fn caller handles BiSeNet itself). None = exact f32 (parity
    tests); bfloat16 = the TPU fast path. The L1 term and the loss values
    stay f32 either way.

    data_format: layout of every image argument AND of parse_fn's
    input/output. The NHWC path runs the whole parse->mask->LPIPS chain in
    the aux nets' native layout — zero layout copies (the NCHW round trip
    on [B,1024,1024,3] tensors was the top non-compute cost of the 1024px
    full-objective step); the NCHW path computes exactly as the reference
    does. The two are equivalence-locked by tests/test_loss_parity.py."""
    nhwc = data_format == "NHWC"
    parse = batch_img_parsing_nhwc if nhwc else batch_img_parsing
    mask_tensor = get_masked_tensor_nhwc if nhwc else get_masked_tensor
    downsample = _downsample_256_nhwc if nhwc else _downsample_256

    fake_img_teacher = teacher_img_list[-1]

    if parse_fn is not None:
        teacher_parsing = parse(fake_img_teacher, parse_fn)
        fake_img_teacher = mask_tensor(fake_img_teacher, teacher_parsing)
        fake_img = mask_tensor(fake_img, teacher_parsing)

    if kd_mode == "Output_Only":
        if parse_fn is None:
            kd_l1 = kd_l1_lambda * jnp.mean(jnp.abs(
                teacher_img_list[-1] - fake_img))
        else:
            kd_l1 = kd_l1_lambda * jnp.mean(jnp.abs(
                fake_img_teacher - fake_img))
    elif kd_mode == "Intermediate":
        # NB (parity): like the reference (train.py:165-169), the rgb-list L1
        # uses UNMASKED intermediate images, and the loop there rebinds
        # fake_img_teacher to the UNMASKED final teacher image, which LPIPS
        # then sees — both quirks replicated.
        losses = [jnp.mean(jnp.abs(t - s))
                  for t, s in zip(teacher_img_list, fake_img_list)]
        kd_l1 = kd_l1_lambda * sum(losses)
        fake_img_teacher = teacher_img_list[-1]
    else:
        raise ValueError(f"unknown kd_mode {kd_mode!r}")

    if lpips_params is None:
        kd_lpips = jnp.asarray(0.0, fake_img.dtype)
    else:
        a, b = fake_img, fake_img_teacher
        if size > lpips_image_size:
            a, b = downsample(a), downsample(b)
        kd_lpips = kd_lpips_lambda * jnp.mean(
            lpips_apply(lpips_params, a, b, dtype=aux_dtype,
                        data_format=data_format).astype(jnp.float32))

    return kd_l1, kd_lpips

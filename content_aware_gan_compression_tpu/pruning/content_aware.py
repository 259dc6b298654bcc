"""Content-aware channel scoring — the paper's core metric (reference
Util/content_aware_pruning.py).

Pipeline per batch (reference :200-249): generate images, parse faces at
512px, build the content-of-interest mask (all face classes: parsing > 0 and
!= 16/cloth), inject salt-&-pepper noise inside the mask, and score each
conv's INPUT channels by the mean |gradient| of sum|noisy - img| wrt the
kernels of [conv1] + convs + [to_rgbs[-1]].

TPU-native differences from the reference (behavior-preserving):
  * the per-pixel Python noise loop (reference :152-171, O(N*H*W) on host)
    becomes a vectorized Bernoulli mask drawn on device;
  * one jax.grad over the whole batch replaces loss.backward() + .grad
    scraping;
  * the reference parses each image individually through a PIL round-trip
    that includes a 2px make_grid border (Util/network_util.py:46-51) — we
    use its own batched parsing path (Batch_Img_Parsing, :61-88) for scoring
    too, which is the same network without the border quirk.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.stylegan2 import generator_apply, generator_make_noise

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
PARSING_SIZE = 512
CLOTH_CLASS = 16


def _bilinear_resize(x, h, w):
    """torch F.interpolate(bilinear, align_corners=False) semantics: same
    half-pixel sampling grid, and antialias=False because torch's bilinear
    never widens the kernel on downscale (jax's antialias default does)."""
    b, c = x.shape[0], x.shape[1]
    return jax.image.resize(x, (b, c, h, w), method="bilinear",
                            antialias=False)


def normalize_for_parsing(img_nchw):
    """[-1,1] images -> 512px ImageNet-normalized tensors (reference
    Batch_Img_Parsing, content_aware_pruning.py:70-83)."""
    x = jnp.clip((img_nchw + 1.0) / 2.0, 0.0, 1.0)
    x = _bilinear_resize(x, PARSING_SIZE, PARSING_SIZE)
    mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
    return (x - mean) / std


def batch_img_parsing(img_nchw, parse_fn):
    """Class map [N, 512, 512] from generated images. `parse_fn` maps
    normalized [N,3,512,512] -> logits [N,19,512,512] (BiSeNet head 0)."""
    logits = parse_fn(normalize_for_parsing(img_nchw))
    return jnp.argmax(logits, axis=1)


def coi_mask_from_parsing(parsing):
    """Content-of-interest: all face classes except background(0) and
    cloth(16) (reference content_aware_pruning.py:103)."""
    return (parsing > 0) & (parsing != CLOTH_CLASS)


def get_masked_tensor(img_nchw, batch_parsing):
    """Differentiably mask images to the COI (reference
    content_aware_pruning.py:90-117): float mask at 512, bilinear resize to
    the image size, threshold at 0.5, multiply."""
    mask = coi_mask_from_parsing(batch_parsing).astype(jnp.float32)
    h, w = img_nchw.shape[2], img_nchw.shape[3]
    mask = _bilinear_resize(mask[:, None], h, w)
    mask = (mask > 0.5).astype(img_nchw.dtype)
    return img_nchw * mask


# --- NHWC twins of the parse/mask pipeline ---------------------------------
# The TPU-native KD path (train/losses.py, data_format="NHWC") keeps the big
# C=3 images in the aux nets' native layout end to end: same math as the
# NCHW functions above (equivalence test-locked), zero layout copies.

def _bilinear_resize_nhwc(x, h, w):
    b, c = x.shape[0], x.shape[3]
    return jax.image.resize(x, (b, h, w, c), method="bilinear",
                            antialias=False)


def normalize_for_parsing_nhwc(img_nhwc):
    """[-1,1] NHWC images -> 512px ImageNet-normalized NHWC tensors."""
    x = jnp.clip((img_nhwc + 1.0) / 2.0, 0.0, 1.0)
    x = _bilinear_resize_nhwc(x, PARSING_SIZE, PARSING_SIZE)
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype).reshape(1, 1, 1, 3)
    std = jnp.asarray(IMAGENET_STD, x.dtype).reshape(1, 1, 1, 3)
    return (x - mean) / std


def batch_img_parsing_nhwc(img_nhwc, parse_fn_nhwc):
    """Class map [N, 512, 512]. `parse_fn_nhwc` maps normalized
    [N,512,512,3] -> logits [N,512,512,19] (models.bisenet.bisenet_apply_nhwc
    head 0)."""
    logits = parse_fn_nhwc(normalize_for_parsing_nhwc(img_nhwc))
    return jnp.argmax(logits, axis=-1)


def get_masked_tensor_nhwc(img_nhwc, batch_parsing):
    """NHWC twin of get_masked_tensor: float COI mask at 512, bilinear to
    the image size, threshold 0.5, multiply."""
    mask = coi_mask_from_parsing(batch_parsing).astype(jnp.float32)
    h, w = img_nhwc.shape[1], img_nhwc.shape[2]
    mask = _bilinear_resize_nhwc(mask[..., None], h, w)
    mask = (mask > 0.5).astype(img_nhwc.dtype)
    return img_nhwc * mask


def salt_pepper_noisy_images(rng, img_nchw, coi_mask_hw, noise_prob):
    """Vectorized salt-&-pepper injection (reference :152-171 semantics):
    inside the mask each pixel is replaced across ALL channels by a single
    +-1 draw with probability noise_prob.

    Args:
      coi_mask_hw: [N, H, W] bool at IMAGE resolution.
    Returns (noisy_values [N,1,H,W], replace_mask [N,1,H,W] float).
    """
    n, _, h, w = img_nchw.shape
    k_sp, k_bern = jax.random.split(rng)
    sp = jax.random.randint(k_sp, (n, 1, h, w), 0, 2) * 2 - 1  # -1 or +1
    bern = jax.random.uniform(k_bern, (n, 1, h, w)) < noise_prob
    replace = bern & coi_mask_hw[:, None]
    return sp.astype(img_nchw.dtype), replace.astype(img_nchw.dtype)


def _resize_mask_to_image(mask_512, size):
    """COI mask 512 -> image resolution, nearest (binary mask)."""
    n = mask_512.shape[0]
    return jax.image.resize(
        mask_512.astype(jnp.float32), (n, size, size), method="nearest") > 0.5


def _grad_scores(params, config, z, noise, sp_values, replace_mask):
    """mean |d loss / d W| over (out, kh, kw) per input channel for
    [conv1] + convs + [to_rgbs[-1]] (reference :174-196)."""

    def loss_fn(p):
        img = generator_apply(p, config, [z], noise=noise)
        # |sp - img| on replaced pixels; elsewhere |img - img| == 0 with zero
        # subgradient — identical to the reference's clone-and-assign trick.
        return jnp.sum(jnp.abs(sp_values - img) * replace_mask)

    grads = jax.grad(loss_fn)(params)
    trees = [grads["conv1"]["conv"]["weight"]]
    for i in range(len(params["convs"])):
        trees.append(grads["convs"][str(i)]["conv"]["weight"])
    last = str(len(params["to_rgbs"]) - 1)
    trees.append(grads["to_rgbs"][last]["conv"]["weight"])
    return [jnp.mean(jnp.abs(g), axis=(0, 1, 3, 4)) for g in trees]


def get_content_aware_pruning_score(
    params, config, *, parse_fn, n_sample, batch_size, noise_prob, rng,
    info_print=False,
):
    """Per-batch list of per-layer input-channel saliency arrays (reference
    Get_Content_Aware_Pruning_Score, content_aware_pruning.py:200-249).
    Sum over the outer list (as prune.py:45-46 does) for the final score.

    `parse_fn`: normalized [N,3,512,512] -> [N,19,512,512] logits, or None to
    treat the whole image as content (used when BiSeNet weights are absent).

    Every device batch has the SAME static shape (batch_size), so the whole
    generate->parse->noise->grad pipeline lowers ONCE: a residual
    n_sample % batch_size is covered by one extra full batch whose surplus
    rows get a zeroed replace-mask — their loss term is exactly 0 with zero
    gradient, so they contribute nothing to the scores (the padding+masking
    policy of evaluation/fid.py; a shape-changing residual batch would pay a
    second multi-minute XLA compile at 1024px through the remote-compile
    tunnel). The reference instead grows its LAST batch by the remainder
    (content_aware_pruning.py:216-222) — same sample count, same scores,
    different batching.
    """
    n_full, rem = divmod(n_sample, batch_size)
    n_batch = n_full + (1 if rem else 0)

    all_scores = []
    for idx in range(n_batch):
        if info_print:
            print(f"content-aware scoring batch {idx + 1}/{n_batch}")
        rng, kz, kn, ksp = jax.random.split(rng, 4)
        z = jax.random.normal(kz, (batch_size, config.style_dim))
        noise = generator_make_noise(kn, config, batch_size)
        n_valid = batch_size if idx < n_full else rem
        valid = jnp.arange(batch_size) < n_valid
        scores = _score_batch(params, z, noise, ksp, valid, config=config,
                              parse_fn=parse_fn, noise_prob=noise_prob)
        all_scores.append([np.asarray(s) for s in scores])
    return all_scores


@partial(jax.jit, static_argnames=("config", "parse_fn", "noise_prob"))
def _score_batch(params, z, noise, k_sp, valid, *, config, parse_fn,
                 noise_prob):
    """One fixed-shape scoring batch: generate -> parse -> salt-&-pepper ->
    grad. Jitted ONCE at module level (the _feature_step pattern,
    evaluation/fid.py): a per-call closure would be a distinct callable to
    the jit cache and re-lower on every prune run."""
    img = generator_apply(params, config, [z], noise=noise)
    if parse_fn is not None:
        parsing = batch_img_parsing(img, parse_fn)
        mask = _resize_mask_to_image(
            coi_mask_from_parsing(parsing), config.size)
    else:
        mask = jnp.ones((z.shape[0], config.size, config.size), dtype=bool)
    sp, replace = salt_pepper_noisy_images(k_sp, img, mask, noise_prob)
    replace = replace * valid[:, None, None, None].astype(replace.dtype)
    return _grad_scores(params, config, z, noise, sp, replace)

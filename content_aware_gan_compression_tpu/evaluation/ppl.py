"""Perceptual Path Length (reference Evaluation/ppl.py).

Library-path semantics: W-space lerp pairs at distance eps, LPIPS-VGG
distance between pair images, 1%/99% percentile-filtered mean, and — as in
the reference library path (ppl.py:114, unlike its __main__ which divides by
eps^2) — NO eps^2 division by default (flag-selectable)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.stylegan2 import generator_apply, generator_get_latent
from ..models.lpips import lpips_apply


def normalize(x):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))


def lerp(a, b, t):
    return a + (b - a) * t


def slerp(a, b, t):
    """Spherical interpolation (reference ppl.py:17-25)."""
    a, b = normalize(a), normalize(b)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    p = t * jnp.arccos(d)
    c = normalize(b - d * a)
    return normalize(a * jnp.cos(p) + c * jnp.sin(p))


def _ppl_batch(g_params, lpips_params, config, z, lerp_t, rng, eps,
               packed=True):
    """One PPL batch: 2B z -> W -> lerp pairs (t, t+eps) -> interleave ->
    G(input_is_latent) -> optional 256px pool -> LPIPS between pair images
    (reference ppl.py:33-70, 100-115)."""
    latent = generator_get_latent(g_params, config, z)  # [2B, D]
    t0, t1 = latent[::2], latent[1::2]
    e0 = lerp(t0, t1, lerp_t[:, None])
    e1 = lerp(t0, t1, lerp_t[:, None] + eps)
    latent_e = jnp.stack([e0, e1], 1).reshape(latent.shape)

    # packed trunk, fwd-only res>=512 gate: exact math, a structural no-op
    # below 512px. Measured @1024px full model (idle host): 40.5 vs 39.4
    # pairs/s at batch 8, and packed fits batch 16 where unpacked OOMs
    # (24G > 15.75G HBM).
    image = generator_apply(g_params, config, latent_styles=[latent_e],
                            input_is_latent=True, rng=rng,
                            packed=packed, packed_min_res=512)
    if image.shape[2] // 256 > 1:
        n, c = image.shape[0], image.shape[1]
        # antialias=False == torch F.interpolate(bilinear) — reference
        # ppl.py:107-112 pools >256px images without antialiasing.
        image = jax.image.resize(image, (n, c, 256, 256), method="bilinear",
                                 antialias=False)
    dist = lpips_apply(lpips_params, image[::2], image[1::2])
    return dist.reshape(-1)


def get_ppl_score(
    g_params, config, lpips_params, *, n_sample=5000, batch_size=64,
    eps=1e-4, rng=None, divide_eps_sq=False, info_print=False,
    return_distances=False, packed=True,
):
    """PPL over n_sample pairs (reference Get_PPL_Score, ppl.py:74-128)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n_batch = n_sample // batch_size
    resid = n_sample - n_batch * batch_size
    step = jax.jit(partial(_ppl_batch, config=config, eps=eps,
                           packed=packed))

    # Residual batch: the reference appends one more batch when n_sample
    # isn't divisible (Evaluation/ppl.py:84-91) — buggily at FULL batch size
    # (it passes `batch_size`, not `batch`), overshooting n_sample. We run
    # the same full-size batch (keeps one jit trace) but keep only the first
    # `resid` distances, so the sample count equals the flag exactly.
    # Identical to the reference at the 5000/50 defaults (resid == 0).
    distances = []
    total = n_batch + (1 if resid else 0)
    for idx in range(total):
        rng, kz, kt, kn = jax.random.split(rng, 4)
        z = jax.random.normal(kz, (batch_size * 2, config.style_dim))
        lerp_t = jax.random.uniform(kt, (batch_size,))
        if info_print:
            print(f"PPL batch {idx + 1}/{total}")
        d = np.asarray(step(g_params, lpips_params, z=z, lerp_t=lerp_t, rng=kn))
        if divide_eps_sq:
            d = d / (eps ** 2)
        if idx == n_batch:  # residual slot
            d = d[:resid]
        distances.append(d)

    distances = np.concatenate(distances, 0)
    lo = np.percentile(distances, 1, method="lower")
    hi = np.percentile(distances, 99, method="higher")
    filtered = distances[(distances >= lo) & (distances <= hi)]
    score = float(filtered.mean())
    if return_distances:  # raw pre-filter distances (reference __main__
        return score, distances  # prints their full stats, ppl.py:196-204)
    return score

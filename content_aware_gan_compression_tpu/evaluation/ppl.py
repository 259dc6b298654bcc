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


def _ppl_batch(g_params, lpips_params, config, z, lerp_t, rng, eps):
    """One PPL batch: 2B z -> W -> lerp pairs (t, t+eps) -> interleave ->
    G(input_is_latent) -> optional 256px pool -> LPIPS between pair images
    (reference ppl.py:33-70, 100-115)."""
    latent = generator_get_latent(g_params, config, z)  # [2B, D]
    t0, t1 = latent[::2], latent[1::2]
    e0 = lerp(t0, t1, lerp_t[:, None])
    e1 = lerp(t0, t1, lerp_t[:, None] + eps)
    latent_e = jnp.stack([e0, e1], 1).reshape(latent.shape)

    image = generator_apply(g_params, config, latent_styles=[latent_e],
                            input_is_latent=True, rng=rng)
    if image.shape[2] // 256 > 1:
        n, c = image.shape[0], image.shape[1]
        image = jax.image.resize(image, (n, c, 256, 256), method="bilinear")
    dist = lpips_apply(lpips_params, image[::2], image[1::2])
    return dist.reshape(-1)


def get_ppl_score(
    g_params, config, lpips_params, *, n_sample=5000, batch_size=64,
    eps=1e-4, rng=None, divide_eps_sq=False, info_print=False,
):
    """PPL over n_sample pairs (reference Get_PPL_Score, ppl.py:74-128)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n_batch = max(n_sample // batch_size, 1)
    step = jax.jit(partial(_ppl_batch, config=config, eps=eps))

    distances = []
    for idx in range(n_batch):
        rng, kz, kt, kn = jax.random.split(rng, 4)
        z = jax.random.normal(kz, (batch_size * 2, config.style_dim))
        lerp_t = jax.random.uniform(kt, (batch_size,))
        if info_print:
            print(f"PPL batch {idx + 1}/{n_batch}")
        d = np.asarray(step(g_params, lpips_params, z=z, lerp_t=lerp_t, rng=kn))
        if divide_eps_sq:
            d = d / (eps ** 2)
        distances.append(d)

    distances = np.concatenate(distances, 0)
    lo = np.percentile(distances, 1, method="lower")
    hi = np.percentile(distances, 99, method="higher")
    filtered = distances[(distances >= lo) & (distances <= hi)]
    return float(filtered.mean())

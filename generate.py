#!/usr/bin/env python
"""Sample-grid generation CLI (reference Miscellaneous/generate.py).

Generates `pics` grids of `sample` truncated samples each from a checkpoint's
g_ema and writes PNGs."""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--sample", type=int, default=16,
                        help="samples per grid")
    parser.add_argument("--pics", type=int, default=1, help="number of grids")
    parser.add_argument("--truncation", type=float, default=0.5)
    parser.add_argument("--truncation_mean", type=int, default=4096)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--latent", type=int, default=512)
    parser.add_argument("--n_mlp", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out_dir", type=str, default="sample")
    parser.add_argument("--packed", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="space-to-depth packed trunk for lane-sparse "
                             "high-res layers (exact math, ops/packed.py)")
    parser.add_argument("--packed_min_res", type=int, default=512,
                        help="pack only layer pairs at spatial res >= this; "
                             "512 is the measured fwd-only optimum (packing "
                             "res<=256 pairs costs generation throughput "
                             "while helping training — stylegan2._synthesis)")
    args = parser.parse_args()
    from content_aware_gan_compression_tpu.utils import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax

    from content_aware_gan_compression_tpu.models import (
        generator_apply, generator_mean_latent)
    from content_aware_gan_compression_tpu.utils import (
        load_torch_checkpoint, torch_state_dict_to_pytree,
        build_generator_from_pytree, load_checkpoint)
    from content_aware_gan_compression_tpu.utils.logging import (
        save_image_grid)

    if args.ckpt.endswith(".npz"):
        trees, _ = load_checkpoint(args.ckpt)
        g_tree = trees["g_ema"]
    else:
        ckpt = load_torch_checkpoint(args.ckpt)
        g_tree = torch_state_dict_to_pytree(ckpt["g_ema"])
    params, config = build_generator_from_pytree(
        g_tree, size=args.size, style_dim=args.latent, n_mlp=args.n_mlp)

    rng = jax.random.PRNGKey(args.seed)
    mean_latent = None
    if args.truncation < 1:
        rng, k = jax.random.split(rng)
        mean_latent = generator_mean_latent(params, config, k,
                                            args.truncation_mean)

    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(args.pics):
        rng, kz, kn = jax.random.split(rng, 3)
        z = jax.random.normal(kz, (args.sample, config.style_dim))
        sample = generator_apply(
            params, config, [z], truncation=args.truncation,
            truncation_latent=mean_latent, rng=kn, packed=args.packed,
            packed_min_res=args.packed_min_res)
        path = os.path.join(args.out_dir, f"{str(i).zfill(6)}.png")
        save_image_grid(sample, path, nrow=int(args.sample ** 0.5))
        print(f"saved {path}")


if __name__ == "__main__":
    main()

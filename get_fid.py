#!/usr/bin/env python
"""FID evaluation CLI — flag-compatible with reference get_fid.py.

Replaces the reference's nn.DataParallel sample loop with a jitted,
device-resident generate->inception pipeline. Real-FFHQ statistics come from
a pickle (--real_stats, the reference's pre-stored format {'mean','cov'}) or
are rebuilt from an image folder (--real_images)."""

import argparse
import os
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--generated_img_size", type=int, default=256)
    parser.add_argument("--ckpt", type=str,
                        default="./Model/full_size_model/256px_full_size.pt")
    parser.add_argument("--n_sample", type=int, default=50000)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--info_print", action="store_true", default=False)
    # TPU-native extras
    parser.add_argument("--latent", type=int, default=512)
    parser.add_argument("--n_mlp", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--inception_ckpt", type=str,
                        default="./Model/metrics/pt_inception-2015-12-05-6726825d.pth")
    parser.add_argument("--real_stats", type=str, default=None,
                        help="pre-stored {'mean','cov'} pickle "
                             "(reference Evaluation/inception_ffhq_embed format)")
    parser.add_argument("--real_images", type=str, default=None,
                        help="folder of real images to build stats from")
    parser.add_argument("--packed", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="packed trunk for the sample stream (exact "
                             "math, fwd-only res>=512 gate; no-op below "
                             "512px — ops/packed.py)")
    args = parser.parse_args()
    from content_aware_gan_compression_tpu.utils import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax

    from content_aware_gan_compression_tpu.evaluation import (
        get_model_fid_score, compute_real_stats_from_folder)
    from content_aware_gan_compression_tpu.models.inception import (
        load_fid_inception)
    from content_aware_gan_compression_tpu.utils import (
        load_torch_checkpoint, torch_state_dict_to_pytree,
        build_generator_from_pytree, load_checkpoint)

    if args.ckpt.endswith(".npz"):
        trees, _ = load_checkpoint(args.ckpt)
        g_tree = trees["g_ema"]
    else:
        ckpt = load_torch_checkpoint(args.ckpt)
        g_tree = torch_state_dict_to_pytree(ckpt["g_ema"])
    g_params, config = build_generator_from_pytree(
        g_tree, size=args.generated_img_size, style_dim=args.latent,
        n_mlp=args.n_mlp)

    if not os.path.exists(args.inception_ckpt):
        raise FileNotFoundError(
            f"FID inception weights not found at {args.inception_ckpt}; "
            "provide --inception_ckpt (pt_inception-2015-12-05 checkpoint)")
    inc_params = load_fid_inception(args.inception_ckpt)

    if args.real_stats:
        real_stats = args.real_stats
    elif args.real_images:
        real_stats = compute_real_stats_from_folder(
            args.real_images, inc_params, size=args.generated_img_size,
            batch_size=args.batch_size, info_print=args.info_print)
    else:
        raise ValueError("need --real_stats or --real_images")

    from content_aware_gan_compression_tpu.parallel import make_mesh

    mesh = make_mesh()  # data-parallel over all local devices
    print(f"Number of samples: {args.n_sample}")
    start_time = time.time()
    fid = get_model_fid_score(
        g_params, config, inc_params, real_stats,
        batch_size=args.batch_size, num_sample=args.n_sample,
        rng=jax.random.PRNGKey(args.seed), info_print=args.info_print,
        mesh=mesh, packed=args.packed)
    print(f"Total time is: {round(time.time() - start_time, 4)}")
    print(f"FID Scores: {fid}\n")


if __name__ == "__main__":
    main()

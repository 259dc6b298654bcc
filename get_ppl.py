#!/usr/bin/env python
"""PPL evaluation CLI — flag-compatible with reference get_ppl.py."""

import argparse
import os
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--generated_img_size", type=int, default=256)
    parser.add_argument("--ckpt", type=str,
                        default="./Model/full_size_model/256px_full_size.pt")
    parser.add_argument("--n_sample", type=int, default=5000)
    parser.add_argument("--batch_size", type=int, default=50)
    parser.add_argument("--eps", type=float, default=1e-4)
    parser.add_argument("--info_print", action="store_true", default=False)
    # TPU-native extras
    parser.add_argument("--latent", type=int, default=512)
    parser.add_argument("--n_mlp", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--lpips_vgg_ckpt", type=str,
                        default="./Model/metrics/vgg16_torchvision.pth")
    parser.add_argument("--lpips_lins_ckpt", type=str,
                        default="/root/reference/lpips/weights/v0.1/vgg.pth")
    parser.add_argument("--divide_eps_sq", action="store_true", default=False,
                        help="divide by eps^2 (the reference's standalone "
                             "ppl.py __main__ does; its library path doesn't)")
    parser.add_argument("--packed", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="packed trunk for the sample stream (exact "
                             "math, res>=512 gate; no-op below 512px — "
                             "evaluation/ppl.py)")
    args = parser.parse_args()
    from content_aware_gan_compression_tpu.utils import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax

    from content_aware_gan_compression_tpu.evaluation import get_ppl_score
    from content_aware_gan_compression_tpu.models.lpips import load_lpips
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

    lpips_params = load_lpips(
        args.lpips_vgg_ckpt if os.path.exists(args.lpips_vgg_ckpt) else None,
        args.lpips_lins_ckpt)

    print(f"Number of samples: {args.n_sample}")
    start_time = time.time()
    ppl = get_ppl_score(
        g_params, config, lpips_params, n_sample=args.n_sample,
        batch_size=args.batch_size, eps=args.eps,
        rng=jax.random.PRNGKey(args.seed),
        divide_eps_sq=args.divide_eps_sq, info_print=args.info_print,
        packed=args.packed)
    print(f"Total time is: {round(time.time() - start_time, 4)}")
    print(f"PPL Scores: {ppl}\n")


if __name__ == "__main__":
    main()

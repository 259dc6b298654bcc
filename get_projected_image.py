#!/usr/bin/env python
"""Image projection CLI — flag-compatible with reference
get_projected_image.py: LBFGS projection of a target image into W+ (and
noise) space, PSNR/LPIPS report, side-by-side visualization PNG."""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--generated_img_size", type=int, default=256)
    parser.add_argument("--ckpt", type=str,
                        default="./Model/full_size_model/256px_full_size.pt")
    parser.add_argument("--image_file", type=str, required=True)
    parser.add_argument("--num_iters", type=int, default=800)
    parser.add_argument("--info_print", action="store_true", default=False)
    # TPU-native extras
    parser.add_argument("--latent", type=int, default=512)
    parser.add_argument("--n_mlp", type=int, default=8)
    parser.add_argument("--opt", type=str, default="LBFGS",
                        choices=["LBFGS", "Adam"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--packed", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="packed trunk (exact math, res>=512 gate; "
                             "no-op below 512px — projector/project.py)")
    parser.add_argument("--lpips_vgg_ckpt", type=str,
                        default="./Model/metrics/vgg16_torchvision.pth")
    parser.add_argument("--lpips_lins_ckpt", type=str,
                        default="/root/reference/lpips/weights/v0.1/vgg.pth")
    parser.add_argument("--out", type=str,
                        default="./Image_Projection_Visualization.png")
    args = parser.parse_args()
    from content_aware_gan_compression_tpu.utils import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax
    import numpy as np
    from PIL import Image

    from content_aware_gan_compression_tpu.models.lpips import (
        load_lpips, lpips_apply)
    from content_aware_gan_compression_tpu.projector import (
        image_projector, img_to_tensor, psnr)
    from content_aware_gan_compression_tpu.utils import (
        load_torch_checkpoint, torch_state_dict_to_pytree,
        build_generator_from_pytree, load_checkpoint)

    if args.ckpt.endswith(".npz"):
        trees, _ = load_checkpoint(args.ckpt)
        g_tree = trees["g_ema"]
    else:
        ckpt = load_torch_checkpoint(args.ckpt)
        g_tree = torch_state_dict_to_pytree(ckpt["g_ema"])
    params, config = build_generator_from_pytree(
        g_tree, size=args.generated_img_size, style_dim=args.latent,
        n_mlp=args.n_mlp)

    lpips_params = None
    if os.path.exists(args.lpips_vgg_ckpt):
        lpips_params = load_lpips(args.lpips_vgg_ckpt, args.lpips_lins_ckpt)
    else:
        print(f"WARNING: no VGG weights at {args.lpips_vgg_ckpt}; "
              "projecting with MSE only, skipping LPIPS score")

    target_pil = Image.open(args.image_file).convert("RGB").resize(
        (args.generated_img_size, args.generated_img_size))
    target = img_to_tensor(target_pil)

    output, latent, noises, losses = image_projector(
        params, config, target, lpips_params=lpips_params,
        rng=jax.random.PRNGKey(args.seed), opt=args.opt,
        num_iters=args.num_iters,
        print_iters=100 if args.info_print else None, packed=args.packed)

    out_img = np.asarray(output)[0]
    out_uint8 = ((np.clip(out_img, -1, 1) + 1) * 127.5 + 0.5).clip(0, 255)
    out_uint8 = out_uint8.astype(np.uint8).transpose(1, 2, 0)
    target_uint8 = np.asarray(target_pil)

    if lpips_params is not None:
        score = float(np.asarray(
            lpips_apply(lpips_params, output, target)).squeeze())
        print(f"LPIPS Score: {round(score, 4)}")
    print(f"PSNR Score: {round(psnr(out_uint8, target_uint8), 4)}")

    side = np.concatenate([target_uint8, out_uint8], axis=1)
    Image.fromarray(side).save(args.out)
    print(f"saved visualization to {args.out}")


if __name__ == "__main__":
    main()

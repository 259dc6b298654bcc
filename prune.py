#!/usr/bin/env python
"""Content-aware pruning CLI — flag-compatible with reference prune.py.

Loads a checkpoint ({'g_ema', 'd', ...}, torch .pt/.pth or native .npz),
scores channels with the content-aware salt-&-pepper gradient metric, prunes
uniformly per layer, and saves {'g','d','g_ema'} with g == g_ema == pruned
(reference prune.py:60-64).
"""

import argparse
import datetime
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--generated_img_size", type=int, default=256)
    parser.add_argument("--ckpt", type=str,
                        default="./Model/full_size_model/256px_full_size.pt")
    parser.add_argument("--n_sample", type=int, default=400)
    parser.add_argument("--batch_size", type=int, default=10)
    parser.add_argument("--noise_prob", type=float, default=0.05)
    parser.add_argument("--remove_ratio", type=float, default=0.7)
    parser.add_argument("--info_print", action="store_true", default=False)
    # TPU-native extras (defaults preserve reference behavior)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--latent", type=int, default=512)
    parser.add_argument("--n_mlp", type=int, default=8)
    parser.add_argument("--parsing_ckpt", type=str,
                        default="./Model/face_parsing/79999_iter.pth",
                        help="BiSeNet weights; if missing, the whole image "
                             "is treated as content (with a warning)")
    parser.add_argument("--out_dir", type=str, default="./Model/pruned_model")
    parser.add_argument("--keep_multiple", type=int, default=1,
                        help="round kept channel counts UP to this multiple "
                             "(TPU lane-friendly pruning; 1 = exact "
                             "reference ratio)")
    parser.add_argument("--metric", type=str, default="content-aware",
                        help="content-aware (paper) or any of the baseline "
                             "metrics: Random/ASV/l1-map/l1-norm-ASV/"
                             "l2-norm-ASV/l1-in/l1-out/l1-style")
    args = parser.parse_args()
    from content_aware_gan_compression_tpu.utils import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax

    from content_aware_gan_compression_tpu.models.bisenet import (
        load_bisenet, make_parse_fn)
    from content_aware_gan_compression_tpu.pruning import (
        get_content_aware_pruning_score, get_network_score_list,
        get_uniform_remove_list, generate_prune_mask_list, mask_the_generator)
    from content_aware_gan_compression_tpu.utils import (
        load_torch_checkpoint, torch_state_dict_to_pytree,
        build_generator_from_pytree, save_checkpoint, load_checkpoint,
        pytree_to_torch_state_dict)

    rng = jax.random.PRNGKey(args.seed)

    # --- load generator -----------------------------------------------------
    if args.ckpt.endswith(".npz"):
        trees, _ = load_checkpoint(args.ckpt)
        ckpt = trees
        g_tree = trees["g_ema"]
    else:
        ckpt = load_torch_checkpoint(args.ckpt)
        g_tree = torch_state_dict_to_pytree(ckpt["g_ema"])
    params, config = build_generator_from_pytree(
        g_tree, size=args.generated_img_size, style_dim=args.latent,
        n_mlp=args.n_mlp)

    # --- parsing net ----------------------------------------------------------
    parse_fn = None
    if os.path.exists(args.parsing_ckpt):
        parse_fn = make_parse_fn(load_bisenet(args.parsing_ckpt))
    else:
        print(f"WARNING: BiSeNet weights not found at {args.parsing_ckpt}; "
              "scoring with the full image as content-of-interest")

    # --- scoring --------------------------------------------------------------
    start_time = time.time()
    if args.metric == "content-aware":
        rng, sub = jax.random.split(rng)
        grad_score_list = get_content_aware_pruning_score(
            params, config, parse_fn=parse_fn, n_sample=args.n_sample,
            batch_size=args.batch_size, noise_prob=args.noise_prob,
            rng=sub, info_print=args.info_print)
        score = [np.zeros(w) for w in config.net_shape]
        for batch_scores in grad_score_list:
            for i, s in enumerate(batch_scores):
                score[i] = score[i] + s
    else:
        rng, kz, ks = jax.random.split(rng, 3)
        z = jax.random.normal(kz, (args.n_sample, config.style_dim))
        score = get_network_score_list(params, config, z, args.metric, rng=ks,
                                       batch_size=args.batch_size)
    print(f"The content-aware metric scoring takes: "
          f"{round(time.time() - start_time, 4)} seconds")

    # --- prune ----------------------------------------------------------------
    net_shape = list(config.net_shape)
    rmve_list = get_uniform_remove_list(net_shape, args.remove_ratio,
                                        keep_multiple=args.keep_multiple)
    masks = generate_prune_mask_list(score, net_shape, rmve_list,
                                     info_print=args.info_print)
    pruned = mask_the_generator(params, masks)

    # --- save -----------------------------------------------------------------
    os.makedirs(args.out_dir, exist_ok=True)
    m_time = datetime.datetime.now().strftime("%Y-%m-%d_%H:%M:%S")
    base = (f"content_aware_pruned_{args.remove_ratio}_"
            f"{args.generated_img_size}px_model_{m_time}")
    d_tree = ckpt.get("d")
    if d_tree is not None and not isinstance(next(iter(d_tree.values()), None), dict):
        d_tree = torch_state_dict_to_pytree(d_tree)
    out_trees = {"g": pruned, "g_ema": pruned}
    if d_tree is not None:
        out_trees["d"] = d_tree
    out_path = os.path.join(args.out_dir, base + ".npz")
    save_checkpoint(out_path, out_trees,
                    metadata={"size": args.generated_img_size,
                              "remove_ratio": args.remove_ratio,
                              "metric": args.metric})
    print(f"saved pruned checkpoint to {out_path}")

    # also export a torch-loadable .pth when torch is available
    try:
        import torch

        torch_ckpt = {
            "g": {k: torch.tensor(np.asarray(v)) for k, v in
                  pytree_to_torch_state_dict(pruned).items()},
            "g_ema": {k: torch.tensor(np.asarray(v)) for k, v in
                      pytree_to_torch_state_dict(pruned).items()},
        }
        if d_tree is not None:
            torch_ckpt["d"] = {k: torch.tensor(np.asarray(v)) for k, v in
                               pytree_to_torch_state_dict(d_tree).items()}
        torch.save(torch_ckpt, os.path.join(args.out_dir, base + ".pth"))
        print(f"saved torch export to {os.path.join(args.out_dir, base + '.pth')}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()

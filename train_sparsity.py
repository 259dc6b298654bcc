#!/usr/bin/env python
"""GAN-Slimming sparsity baseline CLI — flag-compatible with reference
Miscellaneous/train_sparsity.py (defaults from train_sparsity_hyperparams.py).
"""

import argparse
import os


def main():
    from train import str2bool

    parser = argparse.ArgumentParser()
    parser.add_argument("--path", type=str, default="")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--channel_multiplier", type=int, default=2)
    parser.add_argument("--latent", type=int, default=512)
    parser.add_argument("--n_mlp", type=int, default=8)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--load_train_state", type=str2bool, default=False)
    parser.add_argument("--iter", type=int, default=200001)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--lr", type=float, default=0.002)
    parser.add_argument("--r1", type=float, default=10)
    parser.add_argument("--path_regularize", type=float, default=2)
    parser.add_argument("--path_batch_shrink", type=int, default=2)
    parser.add_argument("--d_reg_every", type=int, default=16)
    parser.add_argument("--g_reg_every", type=int, default=4)
    parser.add_argument("--mixing", type=float, default=0.9)
    # sparsity params (reference train_sparsity_hyperparams.py:30-36)
    parser.add_argument("--sparsity_eta", type=float, default=1e-5)
    parser.add_argument("--init_step", type=float, default=0)
    parser.add_argument("--model_prune_freq", type=float, default=500000)
    parser.add_argument("--lay_rmve_ratio", type=float, default=0.1)
    parser.add_argument("--num_rmve_channel", type=float, default=588)
    parser.add_argument("--prune_metric", type=str, default="l1-style")
    parser.add_argument("--pruning_mode", type=str, default="Global_Number")
    # validation
    parser.add_argument("--n_sample", type=int, default=9)
    parser.add_argument("--val_sample_freq", type=int, default=1000)
    parser.add_argument("--model_save_freq", type=int, default=10000)
    parser.add_argument("--fid_n_sample", type=int, default=50000)
    parser.add_argument("--fid_batch", type=int, default=64)
    # KD
    parser.add_argument("--teacher_ckpt", type=str, default=None)
    parser.add_argument("--kd_l1_lambda", type=float, default=0)
    parser.add_argument("--kd_percept_lambda", type=float, default=3)
    parser.add_argument("--kd_l1_mode", type=str, default="Intermediate")
    parser.add_argument("--kd_percept_mode", type=str, default="VGG",
                        choices=["LPIPS", "VGG"])
    # TPU-native extras
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--lpips_vgg_ckpt", type=str,
                        default="./Model/metrics/vgg16_torchvision.pth")
    parser.add_argument("--lpips_lins_ckpt", type=str,
                        default="/root/reference/lpips/weights/v0.1/vgg.pth")
    parser.add_argument("--exp_root", type=str, default=".")
    args = parser.parse_args()
    from content_aware_gan_compression_tpu.utils import (
        enable_compilation_cache)

    enable_compilation_cache()

    from content_aware_gan_compression_tpu.train import TrainConfig
    from content_aware_gan_compression_tpu.train.sparsity import (
        SparsityTrainer)
    from content_aware_gan_compression_tpu.utils.logging import (
        ExperimentLogger)

    cfg = TrainConfig(
        data_folder=args.path, generated_img_size=args.size, ckpt=args.ckpt,
        channel_multiplier=args.channel_multiplier, latent=args.latent,
        n_mlp=args.n_mlp, load_train_state=args.load_train_state,
        training_iters=args.iter, batch_size=args.batch, init_lr=args.lr,
        discriminator_r1=args.r1,
        generator_path_reg_weight=args.path_regularize,
        path_reg_batch_shrink=args.path_batch_shrink,
        d_reg_freq=args.d_reg_every, g_reg_freq=args.g_reg_every,
        noise_mixing=args.mixing, val_sample_num=args.n_sample,
        val_sample_freq=args.val_sample_freq,
        model_save_freq=args.model_save_freq,
        fid_n_sample=args.fid_n_sample, fid_batch=args.fid_batch,
        teacher=args.teacher_ckpt, kd_l1_lambda=args.kd_l1_lambda,
        kd_lpips_lambda=args.kd_percept_lambda, kd_mode=args.kd_l1_mode,
        content_aware_KD=False, seed=args.seed)

    lpips_params = None
    if cfg.teacher and args.kd_percept_lambda > 0:
        from content_aware_gan_compression_tpu.models.lpips import load_lpips
        if os.path.exists(args.lpips_vgg_ckpt):
            lpips_params = load_lpips(args.lpips_vgg_ckpt,
                                      args.lpips_lins_ckpt)
        else:
            print(f"WARNING: no VGG weights at {args.lpips_vgg_ckpt}; "
                  "percept KD disabled")

    trainer = SparsityTrainer(
        cfg,
        dict(sparsity_eta=args.sparsity_eta,
             model_prune_freq=args.model_prune_freq,
             lay_rmve_ratio=args.lay_rmve_ratio,
             num_rmve_channel=args.num_rmve_channel,
             prune_metric=args.prune_metric, pruning_mode=args.pruning_mode,
             kd_percept_mode=args.kd_percept_mode),
        lpips_params=lpips_params, exp_root=args.exp_root)
    logger = ExperimentLogger(args.exp_root)
    trainer.run_sparsity(logger=logger)
    logger.close()


if __name__ == "__main__":
    main()

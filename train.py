#!/usr/bin/env python
"""Distillation retraining CLI — flag-compatible with reference train.py.

Every flag keeps the reference name and default (from train_hyperparams.py);
TPU-native extras (weights paths for the aux nets, dtype, device count) are
additive. The loop runs SPMD over all local TPU devices.
"""

import argparse
import os


def str2bool(v):
    """Real boolean parsing for value-style flags (`--content_aware_KD
    False`). The reference uses `type=bool`, under which every non-empty
    string — including "False" — parses truthy (reference train.py:38,60);
    that bug is deliberately NOT replicated (docs/PARITY.md)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "t", "yes", "y", "1"):
        return True
    if v.lower() in ("false", "f", "no", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def main():
    from content_aware_gan_compression_tpu.train import TrainConfig

    hp = TrainConfig()
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", type=str, default=hp.data_folder)
    parser.add_argument("--size", type=int, default=hp.generated_img_size)
    parser.add_argument("--ckpt", type=str, default=hp.ckpt)
    parser.add_argument("--channel_multiplier", type=int,
                        default=hp.channel_multiplier)
    parser.add_argument("--latent", type=int, default=hp.latent)
    parser.add_argument("--n_mlp", type=int, default=hp.n_mlp)
    parser.add_argument("--load_train_state", type=str2bool,
                        default=hp.load_train_state)
    parser.add_argument("--iter", type=int, default=hp.training_iters)
    parser.add_argument("--batch_size", type=int, default=hp.batch_size)
    parser.add_argument("--lr", type=float, default=hp.init_lr)
    parser.add_argument("--r1", type=float, default=hp.discriminator_r1)
    parser.add_argument("--path_regularize", type=float,
                        default=hp.generator_path_reg_weight)
    parser.add_argument("--path_batch_shrink", type=int,
                        default=hp.path_reg_batch_shrink)
    parser.add_argument("--d_reg_every", type=int, default=hp.d_reg_freq)
    parser.add_argument("--g_reg_every", type=int, default=hp.g_reg_freq)
    parser.add_argument("--mixing", type=float, default=hp.noise_mixing)
    parser.add_argument("--n_sample", type=int, default=hp.val_sample_num)
    parser.add_argument("--val_sample_freq", type=int,
                        default=hp.val_sample_freq)
    parser.add_argument("--model_save_freq", type=int,
                        default=hp.model_save_freq)
    parser.add_argument("--fid_n_sample", type=int, default=hp.fid_n_sample)
    parser.add_argument("--fid_batch", type=int, default=hp.fid_batch)
    parser.add_argument("--teacher_ckpt", type=str, default=hp.teacher)
    parser.add_argument("--kd_l1_lambda", type=float, default=hp.kd_l1_lambda)
    parser.add_argument("--kd_lpips_lambda", type=float,
                        default=hp.kd_lpips_lambda)
    parser.add_argument("--kd_mode", type=str, default=hp.kd_mode)
    parser.add_argument("--content_aware_KD", type=str2bool,
                        default=hp.content_aware_KD)
    # TPU-native extras
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--opt_state_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="storage dtype for Adam's second moment "
                             "(bfloat16 halves its HBM traffic; arithmetic "
                             "stays f32 — deviates from reference numerics)")
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--remat", action="store_true", default=False,
                        help="checkpoint synthesis/D blocks (1024px memory)")
    parser.add_argument("--packed_trunk", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="run the lane-sparse high-res layers in "
                             "space-to-depth packed layout (exact math; "
                             "big win at 512/1024px)")
    parser.add_argument("--steps_per_dispatch", type=int,
                        default=hp.steps_per_dispatch,
                        help="fuse K iterations (regularizer cadence "
                             "included) into one lax.scan dispatch; "
                             "amortizes host dispatch overhead")
    parser.add_argument("--input_put", type=str, default="auto",
                        choices=("auto", "overlap", "serial"),
                        help="when to ship real batches to the device: "
                             "overlap with compute (PCIe hosts), serially "
                             "at window drains (transports whose idle "
                             "puts beat busy puts), or probe both regimes "
                             "and pick by the wall model (auto; probes + "
                             "decision logged to metrics.jsonl)")
    parser.add_argument("--data_echo", type=int, default=1,
                        help="consume each shipped real batch N times per "
                             "K-window (data echoing, Choi et al. 2020) — "
                             "cuts input wire bytes N-fold on transports "
                             "that cannot feed the chip; 1 = reference-"
                             "exact fresh batch every iteration")
    parser.add_argument("--parsing_ckpt", type=str,
                        default="./Model/face_parsing/79999_iter.pth")
    parser.add_argument("--lpips_vgg_ckpt", type=str,
                        default="./Model/metrics/vgg16_torchvision.pth")
    parser.add_argument("--lpips_lins_ckpt", type=str,
                        default="/root/reference/lpips/weights/v0.1/vgg.pth")
    parser.add_argument("--inception_ckpt", type=str,
                        default="./Model/metrics/pt_inception-2015-12-05-6726825d.pth")
    parser.add_argument("--real_stats", type=str, default=None)
    parser.add_argument("--exp_root", type=str, default=".")
    args = parser.parse_args()
    from content_aware_gan_compression_tpu.utils import (
        enable_compilation_cache)

    enable_compilation_cache()

    cfg = TrainConfig(
        data_folder=args.path, generated_img_size=args.size, ckpt=args.ckpt,
        channel_multiplier=args.channel_multiplier, latent=args.latent,
        n_mlp=args.n_mlp, load_train_state=args.load_train_state,
        training_iters=args.iter, batch_size=args.batch_size,
        init_lr=args.lr, discriminator_r1=args.r1,
        generator_path_reg_weight=args.path_regularize,
        path_reg_batch_shrink=args.path_batch_shrink,
        d_reg_freq=args.d_reg_every, g_reg_freq=args.g_reg_every,
        noise_mixing=args.mixing, val_sample_num=args.n_sample,
        val_sample_freq=args.val_sample_freq,
        model_save_freq=args.model_save_freq,
        fid_n_sample=args.fid_n_sample, fid_batch=args.fid_batch,
        teacher=args.teacher_ckpt, kd_l1_lambda=args.kd_l1_lambda,
        kd_lpips_lambda=args.kd_lpips_lambda, kd_mode=args.kd_mode,
        content_aware_KD=args.content_aware_KD, seed=args.seed,
        compute_dtype=args.dtype, opt_state_dtype=args.opt_state_dtype,
        n_devices=args.n_devices, packed_trunk=args.packed_trunk,
        remat=args.remat, steps_per_dispatch=args.steps_per_dispatch,
        input_put=args.input_put, data_echo=args.data_echo)

    import jax

    from content_aware_gan_compression_tpu.train import Trainer
    from content_aware_gan_compression_tpu.utils.logging import (
        ExperimentLogger)

    # aux nets (gated on weight availability)
    lpips_params = None
    if cfg.teacher and cfg.kd_lpips_lambda > 0:
        from content_aware_gan_compression_tpu.models.lpips import load_lpips
        if os.path.exists(args.lpips_vgg_ckpt):
            lpips_params = load_lpips(args.lpips_vgg_ckpt,
                                      args.lpips_lins_ckpt)
        else:
            print(f"WARNING: no VGG weights at {args.lpips_vgg_ckpt}; "
                  "LPIPS KD disabled")
            cfg = TrainConfig(**{**cfg.__dict__, "kd_lpips_lambda": 0.0})

    parse_params = None
    if cfg.teacher and cfg.content_aware_KD:
        from content_aware_gan_compression_tpu.models.bisenet import (
            load_bisenet)
        if os.path.exists(args.parsing_ckpt):
            parse_params = load_bisenet(args.parsing_ckpt)
        else:
            print(f"WARNING: no BiSeNet weights at {args.parsing_ckpt}; "
                  "content-aware KD masking disabled")

    inception_params = real_stats = None
    if os.path.exists(args.inception_ckpt) and args.real_stats:
        from content_aware_gan_compression_tpu.models.inception import (
            load_fid_inception)
        inception_params = load_fid_inception(args.inception_ckpt)
        real_stats = args.real_stats

    logger = ExperimentLogger(args.exp_root)
    trainer = Trainer(cfg, lpips_params=lpips_params,
                      parse_params=parse_params,
                      inception_params=inception_params,
                      real_stats=real_stats, exp_root=args.exp_root)

    status = (
        "\n--------------- Training Start ---------------\n\n"
        f"Params:\n\n  Model and Data:\n"
        f"    Data Folder: {cfg.data_folder}\n"
        f"    Multi-Layer Perceptron Num Layers: {cfg.n_mlp}\n"
        f"    Generator Num Layers: {trainer.g_config.n_latent}\n"
        f"    Latent Variable Dimension: {cfg.latent}\n"
        f"    Generated Image Size: {cfg.generated_img_size}\n"
        f"    Channel Multiplier: {cfg.channel_multiplier}\n"
        f"    Initial Checkpoint: {cfg.ckpt}\n"
        f"    Load Training State: {cfg.load_train_state}\n\n"
        f"  TPU Setup:\n"
        f"    Mesh Devices: {trainer.mesh.devices.tolist()}\n"
        f"    Compute dtype: {cfg.compute_dtype}\n\n"
        f"  Training Params:\n"
        f"    Training Iterations: {cfg.training_iters}\n"
        f"    Batch Size: {cfg.batch_size}\n"
        f"    Learning Rate: {cfg.init_lr}\n"
        f"    Generator Path Regularization Frequency: {cfg.g_reg_freq}\n"
        f"    Path Regularization Weight: {cfg.generator_path_reg_weight}\n"
        f"    Path Batch Shrink Ratio: {cfg.path_reg_batch_shrink}\n"
        f"    Discriminator Regularization Frequency: {cfg.d_reg_freq}\n"
        f"    Discriminator Regularization Weight: {cfg.discriminator_r1}\n"
        f"    Noise Mixing: {cfg.noise_mixing}\n\n"
        f"  Knowledge Distillation Params:\n"
        f"    Teacher Checkpoint: {cfg.teacher}\n"
        f"    L1 Knowledge Distillation Weight: {cfg.kd_l1_lambda}\n"
        f"    L1 Knowledge Distillation Mode: {cfg.kd_mode}\n"
        f"    LPIPS Knowledge Distillation Weight: {cfg.kd_lpips_lambda}\n"
        f"    Content Aware: {cfg.content_aware_KD}\n\n"
    )
    print(status)
    logger.write(status)

    import time
    t0 = time.time()
    trainer.run(logger=logger)
    logger.write(f"\nTotal training time: {round(time.time() - t0, 3)}")
    logger.close()


if __name__ == "__main__":
    main()

"""End-to-end GAN-Slimming sparsity trainer: sparse loss in the G step and an
in-training pruning event that shrinks the net, resets optimizers, and
re-jits (reference Miscellaneous/train_sparsity.py:570-578)."""

import os

import numpy as np
import pytest
import jax

from content_aware_gan_compression_tpu.models import (
    GeneratorConfig, DiscriminatorConfig, generator_init, discriminator_init,
)
from content_aware_gan_compression_tpu.train import TrainConfig
from content_aware_gan_compression_tpu.train.sparsity import SparsityTrainer
from content_aware_gan_compression_tpu.utils import save_checkpoint
from content_aware_gan_compression_tpu.utils.logging import ExperimentLogger

SIZE = 8


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("sparsity")
    rng = np.random.RandomState(0)
    for i in range(16):
        Image.fromarray((rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8)
                        ).save(d / f"{i}.png")
    g_cfg = GeneratorConfig(size=SIZE, style_dim=16, n_mlp=1,
                            net_shape=(8, 8, 8, 8))
    gp = generator_init(jax.random.PRNGKey(0), g_cfg)
    dp = discriminator_init(jax.random.PRNGKey(1),
                            DiscriminatorConfig(size=SIZE))
    ckpt = str(d / "init.npz")
    save_checkpoint(ckpt, {"g": gp, "g_ema": gp, "d": dp})
    return str(d), ckpt


def test_sparsity_trainer_with_prune_event(setup, tmp_path):
    data_dir, ckpt = setup
    cfg = TrainConfig(
        data_folder=data_dir, generated_img_size=SIZE, latent=16, n_mlp=1,
        ckpt=ckpt, teacher=None, batch_size=8, training_iters=100,
        d_reg_freq=2, g_reg_freq=2, val_sample_freq=1000,
        model_save_freq=10000, val_sample_num=4, content_aware_KD=False,
        kd_lpips_lambda=0.0)
    trainer = SparsityTrainer(
        cfg, dict(sparsity_eta=1e-3, model_prune_freq=2,
                  pruning_mode="Layer_Uniform", lay_rmve_ratio=0.25,
                  prune_metric="l1-style"))
    logger = ExperimentLogger(str(tmp_path), name="sparsity")
    shape_before = trainer.g_config.net_shape
    trainer.run_sparsity(max_iters=4, logger=logger)
    shape_after = trainer.g_config.net_shape
    assert shape_after != shape_before, "in-training prune did not fire"
    assert all(a <= b for a, b in zip(shape_after, shape_before))
    log = open(os.path.join(
        logger.exp_dir,
        [f for f in os.listdir(logger.exp_dir) if f.endswith(".out")][0]
    )).read()
    assert "Sparse_Loss:" in log
    assert "-------After pruning------" in log
    assert "FLOPs %:" in log


def test_sparse_objective_applies_every_iteration(setup):
    """Regression: the parent Trainer's fused D+G step and K-step scan close
    over the STANDARD G objective; SparsityTrainer must disable them so its
    sparse G step (L1 style loss) runs on non-d_reg iterations too (they are
    15 of every 16 at the reference cadence)."""
    data_dir, ckpt = setup
    cfg = TrainConfig(
        data_folder=data_dir, generated_img_size=SIZE, latent=16, n_mlp=1,
        ckpt=ckpt, teacher=None, batch_size=8, training_iters=100,
        d_reg_freq=16, g_reg_freq=4, content_aware_KD=False,
        kd_lpips_lambda=0.0)
    trainer = SparsityTrainer(cfg, dict(sparsity_eta=1e-3))
    assert trainer._dg_step is None
    assert trainer._multi_step is None
    rng = np.random.RandomState(0)
    batch = (rng.rand(8, SIZE, SIZE, 3) * 255).astype(np.uint8)
    import jax.numpy as jnp
    mpl = jnp.asarray(0.0)
    # iter 1: NOT a d_reg iteration -> previously took the fused standard
    # step and never computed the sparse loss
    metrics, _ = trainer.step(1, batch, mpl)
    assert "sparse" in metrics
    assert float(metrics["sparse"]) > 0.0

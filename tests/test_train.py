"""Training loop tests on the virtual 8-device CPU mesh — the multi-device
coverage the reference never had (SURVEY.md section 4)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from content_aware_gan_compression_tpu.models import (
    GeneratorConfig, DiscriminatorConfig, generator_init, discriminator_init,
)
from content_aware_gan_compression_tpu.train import (
    TrainConfig, Trainer, make_train_steps, make_optimizers, ema_accumulate,
)
from content_aware_gan_compression_tpu.utils import (
    save_checkpoint, pytree_to_torch_state_dict,
)
from content_aware_gan_compression_tpu.utils.logging import ExperimentLogger

SIZE = 8
STYLE = 16
NET_SHAPE = (6, 6, 4, 4)
TEACHER_SHAPE = (8, 8, 6, 6)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("ffhq_tiny")
    rng = np.random.RandomState(0)
    for i in range(24):
        arr = (rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i:03d}.png")
    return str(d)


@pytest.fixture(scope="module")
def ckpt_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpts")
    g_cfg = GeneratorConfig(size=SIZE, style_dim=STYLE, n_mlp=1,
                            net_shape=NET_SHAPE)
    t_cfg = GeneratorConfig(size=SIZE, style_dim=STYLE, n_mlp=1,
                            net_shape=TEACHER_SHAPE)
    d_cfg = DiscriminatorConfig(size=SIZE)
    gp = generator_init(jax.random.PRNGKey(0), g_cfg)
    tp = generator_init(jax.random.PRNGKey(1), t_cfg)
    dp = discriminator_init(jax.random.PRNGKey(2), d_cfg)
    student = str(d / "student.npz")
    teacher = str(d / "teacher.npz")
    save_checkpoint(student, {"g": gp, "g_ema": gp, "d": dp})
    save_checkpoint(teacher, {"g_ema": tp})
    return student, teacher


def make_cfg(data_dir, student, teacher, **kw):
    base = dict(
        data_folder=data_dir, generated_img_size=SIZE, latent=STYLE, n_mlp=1,
        ckpt=student, teacher=teacher, batch_size=8, training_iters=1000,
        d_reg_freq=4, g_reg_freq=2, val_sample_freq=1000,
        model_save_freq=10000, val_sample_num=4, content_aware_KD=False,
        kd_lpips_lambda=0.0, seed=0,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_mesh_is_multi_device():
    assert len(jax.devices()) == 8


def test_trainer_end_to_end(data_dir, ckpt_paths, tmp_path):
    student, teacher = ckpt_paths
    cfg = make_cfg(data_dir, student, teacher)
    trainer = Trainer(cfg, exp_root=str(tmp_path))
    logger = ExperimentLogger(str(tmp_path))
    g_before = np.asarray(
        trainer.g_params["conv1"]["conv"]["weight"]).copy()
    d_before = np.asarray(
        trainer.d_params["final_linear"]["1"]["weight"]).copy()

    trainer.cfg = cfg
    result_logger = trainer.run(max_iters=5, logger=logger)

    g_after = np.asarray(trainer.g_params["conv1"]["conv"]["weight"])
    d_after = np.asarray(trainer.d_params["final_linear"]["1"]["weight"])
    assert not np.allclose(g_before, g_after), "generator did not update"
    assert not np.allclose(d_before, d_after), "discriminator did not update"
    assert np.isfinite(g_after).all() and np.isfinite(d_after).all()

    # reference-format log line exists
    log_files = [f for f in os.listdir(logger.exp_dir)
                 if f.endswith("_training_log.out")]
    assert log_files
    content = open(os.path.join(logger.exp_dir, log_files[0])).read()
    assert "D_Loss:" in content and "KD_L1_Loss:" in content
    # sample grid saved at iter 0
    assert os.path.exists(os.path.join(logger.sample_dir, "000000.png"))


def test_save_and_resume(data_dir, ckpt_paths, tmp_path):
    student, teacher = ckpt_paths
    cfg = make_cfg(data_dir, student, teacher)
    trainer = Trainer(cfg, exp_root=str(tmp_path))
    logger = ExperimentLogger(str(tmp_path), name="resume_test")
    trainer.run(max_iters=3, logger=logger)
    path = trainer.save(logger, iter_idx=2)
    assert os.path.exists(path)

    cfg2 = make_cfg(data_dir, student, teacher, ckpt=path,
                    load_train_state=True)
    trainer2 = Trainer(cfg2, exp_root=str(tmp_path))
    assert trainer2.start_iter == 3
    # params identical post-load
    np.testing.assert_allclose(
        np.asarray(trainer2.g_params["conv1"]["conv"]["weight"]),
        np.asarray(trainer.g_params["conv1"]["conv"]["weight"]), rtol=1e-6)
    # optimizer state restored (adam moments non-zero after 3 steps)
    mu_leaves = jax.tree_util.tree_leaves(trainer2.g_opt_state)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in mu_leaves)
    # and it keeps training
    trainer2.run(max_iters=2, logger=ExperimentLogger(str(tmp_path),
                                                      name="resume_test2"))


def test_adam_no_mu_bit_identical_to_optax_adam():
    """The reference betas are (0**ratio, 0.99**ratio) => b1 == 0 exactly, so
    the mu-free Adam specialization (steps.py:scale_by_adam_no_mu) must
    produce bit-identical updates to optax.adam with b1=0 — it is a memory
    optimization, not a numerics change."""
    import optax
    from content_aware_gan_compression_tpu.train.steps import _reg_ratio_adam

    for ratio in (4 / 5, 16 / 17):
        lr, b2 = 0.002, 0.99 ** ratio
        ours = _reg_ratio_adam(lr, ratio)
        ref = optax.adam(lr * ratio, b1=0.0, b2=b2, eps=1e-8)
        params = {"w": jnp.asarray(np.random.RandomState(0).randn(7, 5),
                                   jnp.float32),
                  "b": jnp.asarray(np.random.RandomState(1).randn(5),
                                   jnp.float32)}
        s_ours, s_ref = ours.init(params), ref.init(params)
        # no mu buffer in our state: exactly one array leaf per param + count
        n_param = len(jax.tree_util.tree_leaves(params))
        assert len(jax.tree_util.tree_leaves(s_ours)) == n_param + 1
        assert len(jax.tree_util.tree_leaves(s_ref)) == 2 * n_param + 1
        p_ours = p_ref = params
        for i in range(4):
            g = jax.tree_util.tree_map(
                lambda p, i=i: jnp.asarray(
                    np.random.RandomState(10 + i).randn(*p.shape), p.dtype),
                params)
            u1, s_ours = ours.update(g, s_ours, p_ours)
            u2, s_ref = ref.update(g, s_ref, p_ref)
            p_ours = optax.apply_updates(p_ours, u1)
            p_ref = optax.apply_updates(p_ref, u2)
        for a, b in zip(jax.tree_util.tree_leaves(p_ours),
                        jax.tree_util.tree_leaves(p_ref)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adam_no_mu_bf16_state_option():
    """opt_state_dtype='bfloat16' (TrainConfig extra) stores Adam's second
    moment rounded to bf16 while keeping the update arithmetic in f32
    (steps.py:scale_by_adam_no_mu). The trajectory must track the f32-state
    one to bf16 rounding, and the stored state must actually be bf16."""
    import optax
    from content_aware_gan_compression_tpu.train.steps import _reg_ratio_adam

    ratio = 16 / 17
    f32_opt = _reg_ratio_adam(0.002, ratio)
    bf16_opt = _reg_ratio_adam(0.002, ratio, state_dtype="bfloat16")
    params = {"w": jnp.asarray(np.random.RandomState(0).randn(33, 17),
                               jnp.float32)}
    s32, s16 = f32_opt.init(params), bf16_opt.init(params)
    assert jax.tree_util.tree_leaves(s16)[1].dtype == jnp.bfloat16
    p32 = p16 = params
    for i in range(6):
        g = jax.tree_util.tree_map(
            lambda p, i=i: jnp.asarray(
                np.random.RandomState(20 + i).randn(*p.shape), p.dtype),
            params)
        u32, s32 = f32_opt.update(g, s32, p32)
        u16, s16 = bf16_opt.update(g, s16, p16)
        p32 = optax.apply_updates(p32, u32)
        p16 = optax.apply_updates(p16, u16)
        assert jax.tree_util.tree_leaves(s16)[1].dtype == jnp.bfloat16
        # updates computed in f32; only the carried moment is rounded
        assert u16["w"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(p16["w"]), np.asarray(p32["w"]),
                               rtol=2e-2, atol=2e-4)


def test_ema_accumulate_math():
    a = {"w": jnp.ones((3,))}
    b = {"w": jnp.zeros((3,))}
    out = ema_accumulate(a, b, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


def test_steps_without_teacher(data_dir, ckpt_paths, tmp_path):
    student, _ = ckpt_paths
    cfg = make_cfg(data_dir, student, None)
    trainer = Trainer(cfg, exp_root=str(tmp_path))
    logger = ExperimentLogger(str(tmp_path), name="no_teacher")
    trainer.run(max_iters=2, logger=logger)


def test_mixing_inject_index_distribution():
    from content_aware_gan_compression_tpu.train.steps import _mixing_latents

    cfg = TrainConfig(latent=STYLE, noise_mixing=0.0, batch_size=4)
    zs, idx = _mixing_latents(jax.random.PRNGKey(0), 4, cfg, n_latent=6)
    assert int(idx) == 6  # no mixing -> inject at n_latent == single style
    cfg1 = TrainConfig(latent=STYLE, noise_mixing=1.0, batch_size=4)
    idxs = set()
    for s in range(20):
        _, idx = _mixing_latents(jax.random.PRNGKey(s), 4, cfg1, n_latent=6)
        idxs.add(int(idx))
    assert idxs.issubset(set(range(1, 6))) and len(idxs) > 1


def test_in_loop_fid_and_checkpoint(data_dir, ckpt_paths, tmp_path):
    """model_save_freq triggers the in-loop FID (with a random inception +
    self-stats) and a checkpoint save (reference train.py:436-452)."""
    from content_aware_gan_compression_tpu.models.inception import (
        inception_init)

    student, teacher = ckpt_paths
    cfg = make_cfg(data_dir, student, None, model_save_freq=2,
                   fid_n_sample=4, fid_batch=2)
    inc = inception_init(jax.random.PRNGKey(42))
    stats = {"mean": np.zeros(2048), "cov": np.eye(2048)}
    trainer = Trainer(cfg, exp_root=str(tmp_path), inception_params=inc,
                      real_stats=stats)
    logger = ExperimentLogger(str(tmp_path), name="fid_loop")
    trainer.run(max_iters=3, logger=logger)
    log_file = [f for f in os.listdir(logger.exp_dir) if f.endswith(".out")][0]
    content = open(os.path.join(logger.exp_dir, log_file)).read()
    assert "Evaluated FID:" in content
    assert os.path.exists(os.path.join(logger.ckpt_dir, "000002.npz"))


def test_trainer_windowed_dispatch(data_dir, ckpt_paths, tmp_path):
    """steps_per_dispatch>1: the loop must fuse event-free windows into one
    scan dispatch, fall back to single steps around events, keep one log
    line per iteration, and land sample grids on the reference cadence."""
    student, teacher = ckpt_paths
    cfg = make_cfg(data_dir, student, teacher, steps_per_dispatch=4,
                   val_sample_freq=4)
    trainer = Trainer(cfg, exp_root=str(tmp_path))
    logger = ExperimentLogger(str(tmp_path), name="windowed")
    g_before = np.asarray(
        trainer.g_params["conv1"]["conv"]["weight"]).copy()

    # iter 0 single (event at 0), windows [1..4] and [5..8] (events at 4, 8
    # on window ends), iter 9 single (end boundary)
    trainer.run(max_iters=10, logger=logger)

    g_after = np.asarray(trainer.g_params["conv1"]["conv"]["weight"])
    assert not np.allclose(g_before, g_after)
    assert np.isfinite(g_after).all()

    log_files = [f for f in os.listdir(logger.exp_dir)
                 if f.endswith("_training_log.out")]
    lines = [ln for ln in open(
        os.path.join(logger.exp_dir, log_files[0])).read().splitlines()
        if "D_Loss:" in ln]
    assert len(lines) == 10, f"expected 10 iteration lines, got {len(lines)}"
    for it in (0, 4, 8):
        assert os.path.exists(
            os.path.join(logger.sample_dir, f"{it:06d}.png")), it


def test_input_put_serial_matches_overlap(data_dir, ckpt_paths, tmp_path):
    """input_put='serial' (the relay-safe staging order: drain the window,
    transfer at device idle, then dispatch — train/loop.py) must produce the
    bit-identical training trajectory to 'overlap': same data order, same
    rng stream, one log line per iteration. Only the wire scheduling moves."""
    import json

    student, teacher = ckpt_paths
    runs = {}
    for mode in ("overlap", "serial"):
        cfg = make_cfg(data_dir, student, teacher, steps_per_dispatch=4,
                       input_put=mode)
        trainer = Trainer(cfg, exp_root=str(tmp_path))
        logger = ExperimentLogger(str(tmp_path), name=f"put_{mode}")
        trainer.run(max_iters=9, logger=logger)
        rows = [json.loads(l) for l in
                open(os.path.join(logger.exp_dir, "metrics.jsonl"))]
        runs[mode] = {r["iter"]: r for r in rows if "d" in r}
        runs[mode, "g"] = np.asarray(
            trainer.g_params["conv1"]["conv"]["weight"])

    assert sorted(runs["overlap"]) == sorted(runs["serial"]) != []
    for it, row in runs["overlap"].items():
        for k, v in row.items():
            if k in ("train_time",):  # scheduling-dependent by design
                continue
            assert runs["serial"][it][k] == pytest.approx(v, abs=0), (it, k)
    np.testing.assert_array_equal(runs["overlap", "g"], runs["serial", "g"])

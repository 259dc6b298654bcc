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


def test_decide_put_mode_wall_model():
    """The input staging decision (train/loop.py:decide_put_mode) compares
    the measured WALL per window — serial: t_c + W/bw_idle vs overlap:
    max(t_c, W/bw_busy) — with probe medians, so one outlier sample (GC
    pause, rtt spike) cannot flip a 450k-iteration run's mode (VERDICT r4
    #6 / weak #2)."""
    from content_aware_gan_compression_tpu.train.loop import decide_put_mode

    MB = 2 ** 20
    # the measured relay regime (docs/ROUND5_NOTES.md): 64 MB probe at
    # ~28 MB/s idle (2.3 s) / ~14 MB/s busy (4.6 s), 768 MB window,
    # 13 s compute -> serial (40 s) beats overlap (55 s)
    idle, busy = [2.3, 2.3, 2.3], [4.6, 4.6, 4.6]
    mode, model = decide_put_mode(idle, busy, 768 * MB, 13.0)
    assert mode == "serial"
    assert model["serial_wall_s"] < model["overlap_wall_s"]
    # data echoing shrinks the wire window 4x -> the SAME bandwidths now
    # favor overlap (14 s) over serial (20 s): a fixed busy/idle-ratio
    # rule cannot express this flip
    mode, model = decide_put_mode(idle, busy, 192 * MB, 13.0)
    assert mode == "overlap"
    # healthy PCIe-like host: puts are free either way -> overlap
    assert decide_put_mode([0.05] * 3, [0.06] * 3, 768 * MB, 13.0)[0] \
        == "overlap"
    # a single pathological sample cannot flip either decision
    assert decide_put_mode(idle, [4.6, 4.6, 99.0], 192 * MB, 13.0)[0] \
        == "overlap"
    assert decide_put_mode([2.3, 2.3, 99.0], busy, 768 * MB, 13.0)[0] \
        == "serial"
    # compute-dominated regime: window is tiny next to compute -> overlap
    assert decide_put_mode(idle, busy, 8 * MB, 13.0)[0] == "overlap"


def test_train_config_validation():
    """TrainConfig must reject staging-mode / kd-mode typos loudly instead
    of silently falling into one branch (advisor r4)."""
    with pytest.raises(ValueError):
        TrainConfig(input_put="Serial")
    with pytest.raises(ValueError):
        TrainConfig(input_put="overlapped")
    with pytest.raises(ValueError):
        TrainConfig(kd_mode="output_only")
    TrainConfig(input_put="serial", kd_mode="Intermediate")  # valid spellings


def test_input_put_auto_probe_and_decision_logged(data_dir, ckpt_paths,
                                                  tmp_path):
    """input_put='auto' must (a) probe both put regimes with median-of-3
    samples at the first window and land the raw samples in metrics.jsonl,
    (b) measure forced-serial windows, then (c) log a wall-model decision
    record (VERDICT r4 #6)."""
    import json

    student, teacher = ckpt_paths
    cfg = make_cfg(data_dir, student, teacher, steps_per_dispatch=2)
    assert cfg.input_put == "auto"
    trainer = Trainer(cfg, exp_root=str(tmp_path))
    logger = ExperimentLogger(str(tmp_path), name="auto_probe")
    # iter 0 single (event), windows [1-2]..[9-10] -> decision at window 5
    trainer.run(max_iters=12, logger=logger)
    rows = [json.loads(l) for l in
            open(os.path.join(logger.exp_dir, "metrics.jsonl"))]
    probes = {r["stage"]: r for r in rows
              if r.get("event") == "input_put_probe"}
    assert "probe_idle" in probes and "probe_busy" in probes, probes
    assert len(probes["probe_idle"]["idle_s"]) == 3
    assert len(probes["probe_busy"]["busy_s"]) == 3
    decisions = [r for r in rows if r.get("event") == "input_put_decision"]
    assert decisions, "auto mode logged no decision record"
    d = decisions[0]
    assert d["mode"] in ("overlap", "serial")
    for key in ("bw_idle_mb_s", "bw_busy_mb_s", "t_compute_s", "window_mb",
                "serial_wall_s", "overlap_wall_s"):
        assert key in d, key
    # the run still logs one line per iteration around probes/decision
    iters = sorted(r["iter"] for r in rows if "d" in r)
    assert iters == list(range(12))


def test_input_put_reprobe_fires(data_dir, ckpt_paths, tmp_path,
                                 monkeypatch):
    """After the decision, auto mode must re-probe the busy regime every
    REPROBE_EVERY windows (env-overridable for this test) and log it —
    the mid-run re-probe path of VERDICT r4 #6."""
    import json

    monkeypatch.setenv("CAGC_REPROBE_EVERY", "6")
    student, teacher = ckpt_paths
    cfg = make_cfg(data_dir, student, teacher, steps_per_dispatch=2)
    trainer = Trainer(cfg, exp_root=str(tmp_path))
    logger = ExperimentLogger(str(tmp_path), name="reprobe")
    # windows 1..6: probes at 1-2, decision at 5, reprobe at 6
    trainer.run(max_iters=14, logger=logger)
    rows = [json.loads(l) for l in
            open(os.path.join(logger.exp_dir, "metrics.jsonl"))]
    stages = [r["stage"] for r in rows
              if r.get("event") == "input_put_probe"]
    assert "reprobe" in stages, stages
    # the decision preceded the reprobe (reprobe only runs post-decision)
    events = [(r["event"], r.get("stage")) for r in rows if "event" in r]
    assert events.index(("input_put_decision", None)) \
        < events.index(("input_put_probe", "reprobe"))
    iters = sorted(r["iter"] for r in rows if "d" in r)
    assert iters == list(range(14))


def test_data_echo_window(data_dir, ckpt_paths, tmp_path):
    """data_echo=2 must ship ceil(K/2) distinct batches per window, tile
    them on device K/e iterations apart, keep one log line per iteration,
    and stay finite; default 1 stays reference-exact (covered by the
    serial/overlap equality tests)."""
    student, teacher = ckpt_paths
    cfg = make_cfg(data_dir, student, teacher, steps_per_dispatch=4,
                   data_echo=2)
    trainer = Trainer(cfg, exp_root=str(tmp_path))

    # unit: the shipped stack is ceil(K/e) distinct batches...
    from content_aware_gan_compression_tpu.data import (
        open_dataset, infinite_loader)
    dataset = open_dataset(data_dir, SIZE)
    loader = infinite_loader(dataset, cfg.batch_size, seed=0, uint8_hwc=True)
    stack = trainer.stack_window(loader, 4)
    assert stack.shape[0] == 2
    assert trainer._last_stack_bytes == stack.nbytes
    # ...and put_stack tiles them to K with repeats K/e apart
    win = np.asarray(trainer.put_stack(stack, 4))
    assert win.shape[0] == 4
    np.testing.assert_array_equal(win[2], win[0])
    np.testing.assert_array_equal(win[3], win[1])
    assert not np.array_equal(win[0], win[1])

    # e2e smoke through the loop (reuse the same Trainer: the unit checks
    # above only consumed loader batches, which the run does not depend on)
    logger = ExperimentLogger(str(tmp_path), name="echo2")
    trainer.run(max_iters=9, logger=logger)
    import json
    rows = [json.loads(l) for l in
            open(os.path.join(logger.exp_dir, "metrics.jsonl"))]
    iters = sorted(r["iter"] for r in rows if "d" in r)
    assert iters == list(range(9))
    g = np.asarray(trainer.g_params["conv1"]["conv"]["weight"])
    assert np.isfinite(g).all()

    with pytest.raises(ValueError):
        TrainConfig(data_echo=0)


def test_sharded_trajectory_matches_single_device(data_dir, ckpt_paths,
                                                  tmp_path):
    """VERDICT r4 #7: >=3 fused K-windows THROUGH Trainer.run — events
    (sample grid + probe + window/single staging transitions) included — on
    the 8-device mesh must reproduce the 1-device trajectory: the
    replicated-out invariant extended in time. Tolerance-tight, not
    bit-for-bit: the psum over 8 batch shards reassociates the batch
    reduction (8 partial sums vs one flat sum), the same fp effect the
    single-window mesh test (test_mesh_training.py) bounds per step."""
    import json

    student, teacher = ckpt_paths
    runs = {}
    for n_dev in (8, 1):
        cfg = make_cfg(data_dir, student, teacher, steps_per_dispatch=4,
                       val_sample_freq=8, n_devices=n_dev)
        trainer = Trainer(cfg, exp_root=str(tmp_path))
        logger = ExperimentLogger(str(tmp_path), name=f"traj_{n_dev}dev")
        # iter 0 single (event), windows [1-4], [5-8] (event lands on its
        # last iteration), [9-12], single 13
        trainer.run(max_iters=14, logger=logger, data_seed=123)
        rows = [json.loads(l) for l in
                open(os.path.join(logger.exp_dir, "metrics.jsonl"))]
        runs[n_dev] = {r["iter"]: r for r in rows if "d" in r}
        runs[n_dev, "g"] = np.asarray(
            trainer.g_params["conv1"]["conv"]["weight"])
        runs[n_dev, "d"] = np.asarray(
            trainer.d_params["final_linear"]["1"]["weight"])
        assert os.path.exists(os.path.join(logger.sample_dir, "000008.png"))

    assert sorted(runs[8]) == sorted(runs[1]) == list(range(14))
    for it in runs[8]:
        for k, v in runs[8][it].items():
            if k in ("train_time",):
                continue
            assert runs[1][it][k] == pytest.approx(v, rel=2e-3, abs=2e-4), \
                (it, k)
    np.testing.assert_allclose(runs[8, "g"], runs[1, "g"],
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(runs[8, "d"], runs[1, "d"],
                               rtol=2e-3, atol=1e-4)


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

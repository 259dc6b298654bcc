"""Jitted SPMD training steps (reference train.py:241-338 phase functions).

Each phase (D GAN, D R1, G GAN+KD, G path-length) is one jitted function:
params/optimizer states replicated over the mesh, image batches sharded on
the data axis, gradient reductions inserted by XLA. The reference's
requires_grad toggling disappears — each step differentiates exactly its own
param tree. Double-backprop regularizers are plain jax.grad-of-grad.

Style mixing is unified into a single trace: two latents are always drawn
and the no-mixing case is inject_index == n_latent (all layers take latent
1), which is mathematically identical to the reference's 1-latent branch
(train.py:218-237) while keeping inject_index a traced scalar.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax, random

from ..models.stylegan2 import (
    GeneratorConfig, DiscriminatorConfig, generator_apply, discriminator_apply,
)
from .losses import d_logistic_loss, g_nonsaturating_loss, kd_loss
from .config import TrainConfig, LPIPS_IMAGE_SIZE


# Measurement gate (same pattern as CAGC_PACKED_NOISE5D): the aux nets
# (BiSeNet parse + LPIPS) run in their native NHWC by default; setting
# CAGC_AUX_LAYOUT=NCHW reproduces the round-3 transpose-to-NCHW aux path
# so the two can be A/B-benched on hardware. Not a supported config knob.
_AUX_LAYOUT = os.environ.get("CAGC_AUX_LAYOUT", "NHWC").upper()


class ScaleByAdamNoMuState(NamedTuple):
    """Adam state for the b1 == 0 special case: no first-moment buffer."""
    count: jnp.ndarray
    nu: optax.Updates


def scale_by_adam_no_mu(b2: float, eps: float = 1e-8, state_dtype=None):
    """optax.scale_by_adam specialized to b1 == 0 — EXACT same math.

    The reference's betas are (0**reg_ratio, 0.99**reg_ratio)
    (train.py:528-537), and 0**r == 0 for every reg ratio, so Adam's first
    moment is mu_t = (1-0)*g = g and its bias correction divides by
    1 - 0**t = 1: the update is g / (sqrt(nu_hat) + eps) with NO dependence
    on a stored mu. Dropping the buffer removes a full param-tree read+write
    from the weight-update phase — which the round-2 trace measured as
    HBM-bound (540-660 GB/s) — and a third of the optimizer-state memory,
    with bit-identical updates (tests/test_train.py asserts equality
    vs optax.adam(b1=0)).

    state_dtype: storage dtype for the second moment (default: the param
    dtype). 'bfloat16' halves the nu read+write traffic in the HBM-bound
    weight-update phase; all arithmetic (moment accumulation, sqrt,
    bias correction) still runs in the gradient dtype — only the stored
    copy is rounded. Numerics deviate from the reference, so it is opt-in
    (TrainConfig.opt_state_dtype).
    """
    state_dtype = jnp.dtype(state_dtype) if state_dtype is not None else None

    def init_fn(params):
        nu = jax.tree_util.tree_map(
            (jnp.zeros_like if state_dtype is None
             else lambda p: jnp.zeros(p.shape, state_dtype)), params)
        return ScaleByAdamNoMuState(count=jnp.zeros([], jnp.int32), nu=nu)

    def update_fn(updates, state, params=None):
        del params
        # expressions mirror optax's update_moment_per_elem_norm /
        # bias_correction so the default-dtype path stays bit-identical
        nu = jax.tree_util.tree_map(
            lambda g, v: (1.0 - b2) * jnp.square(g) + b2 * v.astype(g.dtype),
            updates, state.nu)
        count = optax.safe_int32_increment(state.count)
        bc2 = 1.0 - b2 ** count
        out = jax.tree_util.tree_map(
            lambda g, v: g / (jnp.sqrt(v / bc2.astype(v.dtype)) + eps),
            updates, nu)
        if state_dtype is not None:
            nu = jax.tree_util.tree_map(
                lambda v: v.astype(state_dtype), nu)
        return out, ScaleByAdamNoMuState(count=count, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _reg_ratio_adam(lr: float, ratio: float, state_dtype=None):
    b1, b2 = 0.0 ** ratio, 0.99 ** ratio
    if b1 == 0.0:
        return optax.chain(
            scale_by_adam_no_mu(b2=b2, state_dtype=state_dtype),
            optax.scale(-lr * ratio))
    return optax.adam(lr * ratio, b1=b1, b2=b2, eps=1e-8)


def make_optimizers(cfg: TrainConfig):
    """Reg-ratio-scaled Adam pair (reference train.py:528-537):
    lr * ratio, betas (0^ratio, 0.99^ratio). b1 is exactly 0 for every reg
    ratio, so the mu-free specialization (scale_by_adam_no_mu) applies —
    exact math, one less state buffer."""
    sd = getattr(cfg, "opt_state_dtype", "float32")
    sd = None if sd in (None, "float32") else sd
    g_opt = _reg_ratio_adam(cfg.init_lr, cfg.g_reg_ratio, state_dtype=sd)
    d_opt = _reg_ratio_adam(cfg.init_lr, cfg.d_reg_ratio, state_dtype=sd)
    return g_opt, d_opt


def ema_accumulate(g_ema_params, g_params, decay):
    """g_ema = decay * g_ema + (1-decay) * g (reference accumulate,
    train.py:124-129). Noise buffers ride along unchanged (they receive no
    updates on either side, matching torch's named_parameters exclusion)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, g_ema_params, g_params)


def _as_nhwc_image(x):
    """Accept a 3-channel image batch in NCHW or NHWC; return NHWC. The
    training steps run layout-free end to end (synthesis is NHWC-native and
    discriminator_apply takes data_format='NHWC'), so the only C=3 transpose
    left is this one, for NCHW host batches."""
    if x.shape[1] == 3 and x.shape[-1] != 3:
        return jnp.transpose(x, (0, 2, 3, 1))
    return x


def _mixing_latents(rng, batch, cfg: TrainConfig, n_latent):
    """Two z draws + a traced inject_index implementing mixing_noise /
    index_aware_mixing_noise (reference train.py:218-237)."""
    k_z, k_p, k_i = random.split(rng, 3)
    z = random.normal(k_z, (2, batch, cfg.latent))
    do_mix = random.uniform(k_p) < cfg.noise_mixing
    inject_index = jnp.where(do_mix,
                             random.randint(k_i, (), 1, n_latent),
                             n_latent)
    return [z[0], z[1]], inject_index


def make_train_steps(
    g_config: GeneratorConfig,
    d_config: DiscriminatorConfig,
    cfg: TrainConfig,
    *,
    teacher_config: GeneratorConfig | None = None,
    dtype=None,
):
    """Build the four jitted step functions. Static model configs are closed
    over; teacher/lpips/parsing params are passed as (possibly None) args
    bound at jit time via functools.partial in the loop."""

    batch = cfg.batch_size
    n_latent = g_config.n_latent

    # packing thresholds are config data (the bench sweeps them); bind them
    # once with the compute dtype instead of threading through every call
    gen_apply = partial(
        generator_apply, dtype=dtype, packed=cfg.packed_trunk,
        packed_max_ch=cfg.packed_max_ch, packed_min_res=cfg.packed_min_res)
    disc_apply = partial(
        discriminator_apply, dtype=dtype, data_format="NHWC",
        remat=cfg.remat, packed=cfg.packed_trunk,
        packed_max_ch=cfg.packed_max_ch)

    # ---------------- D GAN step (reference D_Loss_BackProp) ----------------
    def d_step(g_params, d_params, d_opt_state, real_img, rng, d_opt):
        k_mix, k_noise = random.split(rng)
        zs, inject_index = _mixing_latents(k_mix, batch, cfg, n_latent)
        fake_img = gen_apply(
            g_params, g_config, zs, inject_index=inject_index, rng=k_noise,
            output_format="NHWC")
        fake_img = jax.lax.stop_gradient(fake_img)
        real_nhwc = _as_nhwc_image(real_img)

        def loss_fn(dp):
            # NB: batching the two D passes (vmap over stacked [fake; real],
            # which preserves per-slice minibatch-stddev semantics exactly)
            # was measured at parity with the two-call form on v5e — the D
            # backward dominates d_step either way — so the simpler form
            # stays. A plain concat would NOT be equivalent: the stride-B//4
            # stddev groups would mix fake and real samples.
            fake_pred = disc_apply(dp, d_config, fake_img)
            real_pred = disc_apply(dp, d_config, real_nhwc)
            loss = d_logistic_loss(real_pred.astype(jnp.float32),
                                   fake_pred.astype(jnp.float32))
            return loss, (real_pred.mean(), fake_pred.mean())

        (d_loss, (real_s, fake_s)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(d_params)
        updates, d_opt_state = d_opt.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        metrics = {"d": d_loss, "real_score": real_s, "fake_score": fake_s}
        return d_params, d_opt_state, metrics

    # ---------------- D R1 step (reference D_Reg_BackProp) ------------------
    def d_reg_step(d_params, d_opt_state, real_img, d_opt):
        real_nhwc = _as_nhwc_image(real_img)

        def loss_fn(dp):
            def score_sum(img):
                return disc_apply(dp, d_config, img
                                  ).astype(jnp.float32).sum()
            grad_real = jax.grad(score_sum)(real_nhwc)
            r1 = jnp.mean(jnp.sum(jnp.square(
                grad_real.reshape(grad_real.shape[0], -1)), axis=1))
            return cfg.discriminator_r1 / 2 * r1 * cfg.d_reg_freq, r1

        (_, r1_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
        updates, d_opt_state = d_opt.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return d_params, d_opt_state, {"r1": r1_loss}

    # ---------------- G GAN+KD step (reference G_Loss_BackProp) -------------
    def g_step(g_params, g_opt_state, d_params, real_rng,
               teacher_params, lpips_params, parse_params, g_opt):
        k_mix, k_noise, k_tnoise = random.split(real_rng, 3)
        zs, inject_index = _mixing_latents(k_mix, batch, cfg, n_latent)

        # Output_Only KD uses only the final images; skip materializing the
        # per-scale rgb lists (they pin one skip tensor per resolution for
        # the whole step — significant at 1024px).
        need_lists = cfg.kd_mode == "Intermediate"

        teacher_list = None
        if teacher_params is not None:
            t_out = gen_apply(
                teacher_params, teacher_config, zs,
                inject_index=inject_index, rng=k_tnoise,
                return_rgb_list=need_lists, output_format="NHWC")
            teacher_list = list(t_out) if need_lists else [t_out]
            teacher_list = [jax.lax.stop_gradient(t) for t in teacher_list]

        parse_fn = None
        if parse_params is not None and _AUX_LAYOUT == "NHWC":
            from ..models.bisenet import bisenet_apply_nhwc

            def parse_fn(x_nhwc):
                # NHWC end to end (kd_loss runs data_format="NHWC"): the
                # normalized parse input feeds BiSeNet's native layout with
                # no transpose. The trunk follows the step compute dtype
                # (its convs adopt the input dtype); the logits feed an
                # argmax-derived mask on stop-gradiented teacher imagery,
                # so bf16 is safe — the f32/None path stays the CPU parity
                # configuration
                if dtype is not None:
                    x_nhwc = x_nhwc.astype(dtype)
                return bisenet_apply_nhwc(
                    parse_params, x_nhwc)[0].astype(jnp.float32)
        elif parse_params is not None:
            from ..models.bisenet import bisenet_apply

            def parse_fn(x_nchw):
                if dtype is not None:
                    x_nchw = x_nchw.astype(dtype)
                return bisenet_apply(
                    parse_params, x_nchw)[0].astype(jnp.float32)

        def loss_fn(gp):
            g_out = gen_apply(
                gp, g_config, zs, inject_index=inject_index, rng=k_noise,
                return_rgb_list=need_lists, remat=cfg.remat,
                output_format="NHWC")
            fake_list = list(g_out) if need_lists else [g_out]
            fake_img = fake_list[-1]
            fake_pred = disc_apply(d_params, d_config, fake_img)
            g_loss = g_nonsaturating_loss(fake_pred.astype(jnp.float32))
            metrics = {"g": g_loss}
            total = g_loss
            if teacher_list is not None:
                fi, fl, tl = fake_img, fake_list, teacher_list
                if _AUX_LAYOUT != "NHWC":
                    def _tr(x):
                        return jnp.transpose(x, (0, 3, 1, 2))
                    fi = _tr(fi)
                    fl = [_tr(f) for f in fl]
                    tl = [_tr(t) for t in tl]
                kd_l1, kd_lpips = kd_loss(
                    fi.astype(jnp.float32),
                    [f.astype(jnp.float32) for f in fl],
                    [t.astype(jnp.float32) for t in tl],
                    kd_l1_lambda=cfg.kd_l1_lambda,
                    kd_lpips_lambda=cfg.kd_lpips_lambda,
                    kd_mode=cfg.kd_mode, size=cfg.generated_img_size,
                    lpips_params=lpips_params, parse_fn=parse_fn,
                    lpips_image_size=LPIPS_IMAGE_SIZE,
                    data_format=_AUX_LAYOUT,
                    aux_dtype=dtype)
                metrics["kd_l1_loss"] = kd_l1
                metrics["kd_lpips_loss"] = kd_lpips
                total = g_loss + kd_l1 + kd_lpips
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, g_opt_state = g_opt.update(grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        return g_params, g_opt_state, metrics

    # ---------------- G path-length step (reference G_Reg_BackProp) ---------
    def g_reg_step(g_params, g_opt_state, rng, mean_path_length, g_opt):
        path_batch = max(1, batch // cfg.path_reg_batch_shrink)
        k_mix, k_noise, k_ppl = random.split(rng, 3)
        k_z, k_p, k_i = random.split(k_mix, 3)
        z = random.normal(k_z, (2, path_batch, cfg.latent))
        do_mix = random.uniform(k_p) < cfg.noise_mixing
        inject_index = jnp.where(
            do_mix, random.randint(k_i, (), 1, n_latent), n_latent)

        def loss_fn(gp):
            _, path_lengths = gen_apply(
                gp, g_config, [z[0], z[1]], inject_index=inject_index,
                rng=k_noise, PPL_regularize=True, ppl_rng=k_ppl,
                remat=cfg.remat)
            path_mean = mean_path_length + 0.01 * (
                path_lengths.mean() - mean_path_length)
            path_loss = jnp.mean(jnp.square(path_lengths - path_mean))
            weighted = (cfg.generator_path_reg_weight * cfg.g_reg_freq
                        * path_loss)
            return weighted, (path_loss, path_lengths.mean(),
                              jax.lax.stop_gradient(path_mean))

        (_, (path_loss, path_len, new_mpl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(g_params)
        updates, g_opt_state = g_opt.update(grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        metrics = {"path": path_loss, "path_length": path_len}
        return g_params, g_opt_state, new_mpl, metrics

    # ---------------- fused D+G step ----------------------------------------
    def dg_step(g_params, g_opt_state, d_params, d_opt_state, real_img, rng,
                teacher_params, lpips_params, parse_params, d_opt, g_opt):
        """One jit for the every-iteration work (D GAN update then G GAN+KD
        update against the UPDATED discriminator, preserving the reference's
        sequential semantics, train.py:379-388) + EMA — fewer dispatches and
        more room for XLA to overlap the two phases' memory traffic."""
        k_d, k_g = random.split(rng)
        d_params, d_opt_state, m1 = d_step(g_params, d_params, d_opt_state,
                                           real_img, k_d, d_opt)
        g_params, g_opt_state, m2 = g_step(g_params, g_opt_state, d_params,
                                           k_g, teacher_params, lpips_params,
                                           parse_params, g_opt)
        m1.update(m2)
        return g_params, g_opt_state, d_params, d_opt_state, m1

    return d_step, d_reg_step, g_step, g_reg_step, dg_step


EMA_ACCUM = 0.5 ** (32 / (10 * 1000))  # reference train.py:367


def make_multi_step(
    g_config: GeneratorConfig,
    d_config: DiscriminatorConfig,
    cfg: TrainConfig,
    *,
    teacher_config: GeneratorConfig | None = None,
    dtype=None,
):
    """K reference iterations in ONE dispatch: a `lax.scan` whose body is the
    full per-iteration work — D GAN step, R1 every `d_reg_freq` (lax.cond on
    the traced iteration index), G GAN+KD step, path-length every
    `g_reg_freq`, EMA — over a stacked [K, B, ...] real-image tensor.

    Why: the device executes one iteration in ~130 ms but dispatching the
    separate step functions costs ~35 ms/iteration of host time on a 1-core
    host (each call flattens >800-leaf pytrees). Batching K steps into one
    XLA module amortizes that to ~2 ms at K=16 while keeping the reference's
    exact per-iteration semantics and regularizer cadence
    (train.py:371-398). Metrics come back stacked [K]; regularizer metrics
    hold their last value between firings, matching the reference's
    loss_dict persistence.

    The returned function is cadence-aligned for ANY iter0 (the firing
    pattern is data, not trace structure), so the training loop can enter
    and leave the fused path at event boundaries without recompiling.
    """
    d_step, d_reg_step, g_step, g_reg_step, _ = make_train_steps(
        g_config, d_config, cfg, teacher_config=teacher_config, dtype=dtype)

    def multi_step(g_params, g_opt_state, d_params, d_opt_state, g_ema,
                   mean_path_length, rng, reals, iter0, last_reg,
                   teacher_params, lpips_params, parse_params, d_opt, g_opt):
        """reals: [K, B, 3, H, W] float or [K, B, H, W, 3] uint8 (small-wire
        path; normalized on device inside the scan body). iter0: traced int32
        index of the first iteration. last_reg: (r1, path, path_length)
        scalars carried across dispatch boundaries."""

        def body(carry, real):
            (g_p, g_o, d_p, d_o, e_p, mpl, rng, it, lr1, lpath, lplen) = carry
            if real.dtype == jnp.uint8:
                # normalize in place as NHWC — the steps are layout-aware, so
                # the uint8 wire pays ZERO C=3 transposes
                real = real.astype(jnp.float32) / 127.5 - 1.0
            rng, k_dg, k_r = random.split(rng, 3)
            k_d, k_g = random.split(k_dg)

            d_p, d_o, m_d = d_step(g_p, d_p, d_o, real, k_d, d_opt)

            def dreg_t(args):
                dp, do = args
                dp, do, mr = d_reg_step(dp, do, real, d_opt)
                return dp, do, mr["r1"]

            d_p, d_o, lr1 = lax.cond(
                it % cfg.d_reg_freq == 0, dreg_t,
                lambda args: (args[0], args[1], lr1), (d_p, d_o))

            g_p, g_o, m_g = g_step(g_p, g_o, d_p, k_g, teacher_params,
                                   lpips_params, parse_params, g_opt)

            def greg_t(args):
                gp, go, m = args
                gp, go, m, mg = g_reg_step(gp, go, k_r, m, g_opt)
                return gp, go, m, mg["path"], mg["path_length"]

            g_p, g_o, mpl, lpath, lplen = lax.cond(
                it % cfg.g_reg_freq == 0, greg_t,
                lambda args: (args[0], args[1], args[2], lpath, lplen),
                (g_p, g_o, mpl))

            e_p = ema_accumulate(e_p, g_p, EMA_ACCUM)

            metrics = dict(m_d)
            metrics.update(m_g)
            metrics.update({"r1": lr1, "path": lpath, "path_length": lplen,
                            "mean_path": mpl})
            carry = (g_p, g_o, d_p, d_o, e_p, mpl, rng, it + 1,
                     lr1, lpath, lplen)
            return carry, metrics

        carry0 = (g_params, g_opt_state, d_params, d_opt_state, g_ema,
                  mean_path_length, rng, jnp.asarray(iter0, jnp.int32),
                  jnp.asarray(last_reg[0], jnp.float32),
                  jnp.asarray(last_reg[1], jnp.float32),
                  jnp.asarray(last_reg[2], jnp.float32))
        carry, metrics = lax.scan(body, carry0, reals)
        (g_params, g_opt_state, d_params, d_opt_state, g_ema,
         mean_path_length, rng, _, lr1, lpath, lplen) = carry
        return (g_params, g_opt_state, d_params, d_opt_state, g_ema,
                mean_path_length, rng, (lr1, lpath, lplen), metrics)

    return multi_step

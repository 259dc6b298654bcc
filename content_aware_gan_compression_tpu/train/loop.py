"""The distillation retraining loop (reference train.py:341-452) as an SPMD
program over the data mesh: jitted D/G steps with lazy regularization, EMA,
reference-format logging, sample grids, in-loop FID, and self-describing
checkpoints with optimizer state.
"""

from __future__ import annotations

import math
import os
import statistics
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from ..data import open_dataset, infinite_loader
from ..models.stylegan2 import (
    GeneratorConfig, DiscriminatorConfig, generator_init, discriminator_init,
    generator_apply,
)
from ..parallel import make_mesh, shard_batch, replicate
from ..utils.checkpoint import (
    load_torch_checkpoint, torch_state_dict_to_pytree,
    build_generator_from_pytree, save_checkpoint, load_checkpoint,
)
from ..utils.logging import ExperimentLogger, save_image_grid
from .config import TrainConfig
from .steps import (make_train_steps, make_multi_step, make_optimizers,
                    ema_accumulate)


def put_probe(n: int = 3, mb: int = 64):
    """Time `n` host->device puts of an `mb`-MB buffer (seconds each).
    64 MB: big enough that the measured time is transfer (not per-put rtt)
    in every regime the tunneled relay exhibits, ~0.08 s at its 800 MB/s
    fresh-process rate and ~2-6 s in the post-first-fetch slow mode
    (docs/ROUND5_NOTES.md). The payload is incompressible (urandom) so a
    transport that compresses or elides zero pages cannot fake a fast
    probe for real image windows; a fresh buffer per put defeats any
    host-side pinning/caching of a repeat."""
    times = []
    for _ in range(n):
        x = np.frombuffer(os.urandom(mb << 20), np.uint8)
        t0 = time.perf_counter()
        jax.device_put(x).block_until_ready()
        times.append(time.perf_counter() - t0)
    return times


def decide_put_mode(idle_s, busy_s, window_bytes: float, t_compute: float,
                    probe_mb: int = 64):
    """Pick the input staging mode by the measured WALL model, not a fixed
    busy/idle ratio:

      serial  wall/window = t_compute + W / bw_idle   (drain, put at idle)
      overlap wall/window = max(t_compute, W / bw_busy)

    A ratio rule gets the answer wrong as soon as W moves: with idle twice
    the busy bandwidth (one regime the tunneled relay exhibited —
    docs/ROUND5_NOTES.md) serial wins the 768 MB 1024px window but LOSES
    once data echoing shrinks the wire window 4x; when busy ~= idle (the
    relay's other regime) overlap always wins and the ratio says nothing.
    Probe medians, so one outlier sample (GC pause, rtt spike) cannot
    flip a 450k-iteration run's mode.

    Returns (mode, model) where model carries the predicted walls for the
    decision log."""
    bw_idle = probe_mb * 2**20 / max(statistics.median(idle_s), 1e-6)
    bw_busy = probe_mb * 2**20 / max(statistics.median(busy_s), 1e-6)
    serial_wall = t_compute + window_bytes / bw_idle
    overlap_wall = max(t_compute, window_bytes / bw_busy)
    mode = "serial" if serial_wall < overlap_wall else "overlap"
    return mode, {
        "bw_idle_mb_s": round(bw_idle / 2**20, 1),
        "bw_busy_mb_s": round(bw_busy / 2**20, 1),
        "t_compute_s": round(t_compute, 3),
        "window_mb": round(window_bytes / 2**20, 1),
        "serial_wall_s": round(serial_wall, 3),
        "overlap_wall_s": round(overlap_wall, 3),
    }


@partial(jax.jit, static_argnums=1)
def _tile_window(arr, k):
    """Repeat shipped distinct batches up to the K-window length (data
    echoing device-side tile; uint8, so the copy is small next to the
    window it feeds)."""
    reps = -(-k // arr.shape[0])
    return jnp.tile(arr, (reps,) + (1,) * (arr.ndim - 1))[:k]


def _opt_state_to_tree(state):
    """Serialize optimizer state keyed by the leaf's named tree path (e.g.
    '[0].mu['conv1']['weight']'), so resume survives optax restructuring
    instead of breaking silently on a leaf-order change."""
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def _opt_state_from_tree(tree, template):
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    keys = [jax.tree_util.keystr(path) for path, _ in flat]
    if all(k in tree for k in keys):
        leaves = [jnp.asarray(tree[k]) for k in keys]
    else:
        # legacy leaf-index checkpoints ('0', '1', ...) — valid only while
        # the flatten order matches the save-time optax version
        leaves = [jnp.asarray(tree[str(i)]) for i in range(len(tree))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _load_generator_tree(ckpt, key):
    tree = ckpt[key]
    if tree and not isinstance(next(iter(tree.values())), dict):
        tree = torch_state_dict_to_pytree(tree)
    return tree


def load_training_checkpoint(path: str):
    """Load {'g','d','g_ema'[,'g_optim','d_optim']} from torch .pt/.pth or
    native .npz into nested pytrees."""
    if path.endswith(".npz"):
        trees, metadata = load_checkpoint(path)
        return trees, metadata
    ckpt = load_torch_checkpoint(path)
    trees = {}
    for k in ("g", "d", "g_ema"):
        if k in ckpt:
            trees[k] = _load_generator_tree(ckpt, k)
    return trees, {}


class Trainer:
    """Builds models/optimizers/steps from a TrainConfig; `run()` executes
    the reference loop."""

    def __init__(self, cfg: TrainConfig, *, lpips_params=None,
                 parse_params=None, inception_params=None, real_stats=None,
                 exp_root=".", mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.n_devices)
        self.dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                      else None)
        rng = random.PRNGKey(cfg.seed)
        self.rng, k_g, k_d = random.split(rng, 3)

        d_config = DiscriminatorConfig(
            size=cfg.generated_img_size,
            channel_multiplier=cfg.channel_multiplier)
        self.d_config = d_config

        # --- student G/D + g_ema (reference train.py:483-496) --------------
        self.metadata = {}
        if cfg.ckpt:
            trees, self.metadata = load_training_checkpoint(cfg.ckpt)
            self.g_params, self.g_config = build_generator_from_pytree(
                trees["g"], size=cfg.generated_img_size,
                style_dim=cfg.latent, n_mlp=cfg.n_mlp)
            self.g_ema_params, _ = build_generator_from_pytree(
                trees["g_ema"], size=cfg.generated_img_size,
                style_dim=cfg.latent, n_mlp=cfg.n_mlp)
            self.d_params = trees.get("d") or discriminator_init(k_d, d_config)
            self._ckpt_trees = trees
        else:
            self.g_config = GeneratorConfig(
                size=cfg.generated_img_size, style_dim=cfg.latent,
                n_mlp=cfg.n_mlp, channel_multiplier=cfg.channel_multiplier)
            self.g_params = generator_init(k_g, self.g_config)
            # true copy — g_params buffers are donated by the jitted steps
            self.g_ema_params = jax.tree_util.tree_map(
                jnp.copy, self.g_params)
            self.d_params = discriminator_init(k_d, d_config)
            self._ckpt_trees = {}

        # --- teacher (reference train.py:500-506) ---------------------------
        self.teacher_params = None
        self.teacher_config = None
        if cfg.teacher:
            t_trees, _ = load_training_checkpoint(cfg.teacher)
            self.teacher_params, self.teacher_config = \
                build_generator_from_pytree(
                    t_trees["g_ema"], size=cfg.generated_img_size,
                    style_dim=cfg.latent, n_mlp=cfg.n_mlp)

        self.lpips_params = lpips_params if (
            cfg.teacher and cfg.kd_lpips_lambda > 0) else None
        self.parse_params = parse_params if (
            cfg.teacher and cfg.content_aware_KD) else None
        self.inception_params = inception_params
        self.real_stats = real_stats

        # --- optimizers ------------------------------------------------------
        self.g_opt, self.d_opt = make_optimizers(cfg)
        self.g_opt_state = self.g_opt.init(self.g_params)
        self.d_opt_state = self.d_opt.init(self.d_params)
        self.start_iter = 0
        if cfg.load_train_state and self._ckpt_trees.get("g_optim"):
            self.g_opt_state = _opt_state_from_tree(
                self._ckpt_trees["g_optim"], self.g_opt_state)
            self.d_opt_state = _opt_state_from_tree(
                self._ckpt_trees["d_optim"], self.d_opt_state)
            # reference parses the iteration out of the filename
            # (train.py:541); we prefer the metadata but keep the fallback.
            if "iter" in self.metadata:
                self.start_iter = int(self.metadata["iter"]) + 1
            else:
                try:
                    self.start_iter = int(cfg.ckpt[-9:-3]) + 1
                except ValueError:
                    self.start_iter = 0
        # release checkpoint refs so the steps can donate param buffers
        self._ckpt_trees = {}

        # --- jitted steps -----------------------------------------------------
        # Buffer donation: params/optimizer-state inputs are consumed by each
        # step, so the updated pytrees reuse the same HBM.
        d_step, d_reg_step, g_step, g_reg_step, dg_step = make_train_steps(
            self.g_config, d_config, cfg, teacher_config=self.teacher_config,
            dtype=self.dtype)
        self._d_step = jax.jit(partial(d_step, d_opt=self.d_opt),
                               donate_argnums=(1, 2))
        self._d_reg_step = jax.jit(partial(d_reg_step, d_opt=self.d_opt),
                                   donate_argnums=(0, 1))
        self._g_step = jax.jit(partial(g_step, g_opt=self.g_opt),
                               donate_argnums=(0, 1))
        self._g_reg_step = jax.jit(partial(g_reg_step, g_opt=self.g_opt),
                                   donate_argnums=(0, 1))
        # Fused D+G single jit for iterations with no D regularizer: fewer
        # dispatches, one optimization barrier instead of two. On d_reg
        # iterations (every 16) the separate-step path keeps the reference's
        # exact ordering (D gan -> R1 -> G gan, train.py:379-388).
        self._dg_step = jax.jit(
            partial(dg_step, d_opt=self.d_opt, g_opt=self.g_opt),
            donate_argnums=(0, 1, 2, 3))
        self._ema = jax.jit(ema_accumulate, donate_argnums=(0,))
        # K-iterations-per-dispatch scan (full reg cadence inside via
        # lax.cond); the loop enters it on aligned event-free windows
        self._multi_step = None
        if cfg.steps_per_dispatch > 1:
            self._multi_step = jax.jit(
                partial(make_multi_step(
                    self.g_config, d_config, cfg,
                    teacher_config=self.teacher_config, dtype=self.dtype),
                    d_opt=self.d_opt, g_opt=self.g_opt),
                donate_argnums=(0, 1, 2, 3, 4, 5, 6))
        # val-sample grids: jitted — eager per-op dispatch is pathological
        # through the tunneled relay (one RTT per op)
        self._sample_fn = jax.jit(lambda p, z, k: generator_apply(
            p, self.g_config, [z], rng=k))
        # uint8 HWC batches travel host->device 4x smaller; normalize on
        # device, staying NHWC (the train steps are layout-aware, so the
        # wire path pays zero C=3 transposes)
        self._prep = jax.jit(
            lambda x: x.astype(jnp.float32) / 127.5 - 1.0)

        # replicate state over the mesh
        self.g_params = replicate(self.mesh, self.g_params)
        self.d_params = replicate(self.mesh, self.d_params)
        self.g_ema_params = replicate(self.mesh, self.g_ema_params)
        if self.teacher_params is not None:
            self.teacher_params = replicate(self.mesh, self.teacher_params)
        if self.lpips_params is not None:
            self.lpips_params = replicate(self.mesh, self.lpips_params)
        if self.parse_params is not None:
            self.parse_params = replicate(self.mesh, self.parse_params)

        self.exp_root = exp_root
        self._last_stack_bytes = None

    # -------------------------------------------------------------------------
    def put_batch(self, real_img):
        """Async host->device transfer of one batch with data sharding (the
        device-side prefetch: call on batch N+1 while step N executes)."""
        real = shard_batch(self.mesh, jnp.asarray(real_img))
        if real.dtype == jnp.uint8:  # [B,H,W,3] small-wire path
            real = self._prep(real)
        return real

    def step(self, iter_idx: int, real_img, mean_path_length):
        """One reference iteration (train.py:371-398). Returns metrics dict
        and the updated mean_path_length. real_img may be a host array or an
        already-sharded device batch from put_batch()."""
        cfg = self.cfg
        metrics = {}
        self.rng, k_d, k_g, k_greg = random.split(self.rng, 4)

        real = real_img if isinstance(real_img, jax.Array) \
            else self.put_batch(real_img)

        if iter_idx % cfg.d_reg_freq == 0:
            # reference ordering on R1 iterations: D gan -> R1 -> G gan
            self.d_params, self.d_opt_state, m = self._d_step(
                self.g_params, self.d_params, self.d_opt_state, real, k_d)
            metrics.update(m)
            self.d_params, self.d_opt_state, m = self._d_reg_step(
                self.d_params, self.d_opt_state, real)
            metrics.update(m)
            self.g_params, self.g_opt_state, m = self._g_step(
                self.g_params, self.g_opt_state, self.d_params, k_g,
                self.teacher_params, self.lpips_params, self.parse_params)
            metrics.update(m)
        elif self._dg_step is not None:
            # fused single-jit D+G (bit-identical to the sequential pair,
            # tests/test_fused_step.py); splits its key into k_d/k_g inside
            (self.g_params, self.g_opt_state, self.d_params,
             self.d_opt_state, m) = self._dg_step(
                self.g_params, self.g_opt_state, self.d_params,
                self.d_opt_state, real, k_d, self.teacher_params,
                self.lpips_params, self.parse_params)
            metrics.update(m)
        else:
            # sequential fallback for subclasses that replace _g_step with a
            # different G objective (SparsityTrainer sets _dg_step = None so
            # its override is applied on EVERY iteration, not just R1 ones)
            self.d_params, self.d_opt_state, m = self._d_step(
                self.g_params, self.d_params, self.d_opt_state, real, k_d)
            metrics.update(m)
            self.g_params, self.g_opt_state, m = self._g_step(
                self.g_params, self.g_opt_state, self.d_params, k_g,
                self.teacher_params, self.lpips_params, self.parse_params)
            metrics.update(m)

        if iter_idx % cfg.g_reg_freq == 0:
            self.g_params, self.g_opt_state, mean_path_length, m = \
                self._g_reg_step(self.g_params, self.g_opt_state, k_greg,
                                 mean_path_length)
            metrics.update(m)

        accum = 0.5 ** (32 / (10 * 1000))  # reference train.py:367
        self.g_ema_params = self._ema(self.g_ema_params, self.g_params, accum)
        return metrics, mean_path_length

    # -------------------------------------------------------------------------
    def save(self, logger: ExperimentLogger, iter_idx: int):
        path = os.path.join(logger.ckpt_dir, f"{str(iter_idx).zfill(6)}.npz")
        save_checkpoint(path, {
            "g": self.g_params,
            "d": self.d_params,
            "g_ema": self.g_ema_params,
            "g_optim": _opt_state_to_tree(self.g_opt_state),
            "d_optim": _opt_state_to_tree(self.d_opt_state),
        }, metadata={"iter": iter_idx,
                     "size": self.cfg.generated_img_size,
                     "net_shape": list(self.g_config.net_shape)})
        return path

    def step_window(self, iter0: int, reals_stacked, mean_path_length,
                    last_reg):
        """K reference iterations in one dispatch (make_multi_step); returns
        ({name: [K] array} metrics, mpl, last_reg). reals_stacked comes from
        put_window()."""
        self.rng, k = random.split(self.rng)
        (self.g_params, self.g_opt_state, self.d_params, self.d_opt_state,
         self.g_ema_params, mean_path_length, _, last_reg, metrics) = \
            self._multi_step(
                self.g_params, self.g_opt_state, self.d_params,
                self.d_opt_state, self.g_ema_params, mean_path_length, k,
                reals_stacked, iter0, last_reg, self.teacher_params,
                self.lpips_params, self.parse_params)
        return metrics, mean_path_length, last_reg

    def stack_window(self, loader, k_steps: int):
        """Assemble the window's DISTINCT batches into one host array — disk
        + memcpy only, no device traffic, so it is always safe to run while
        a window computes (the serial input_put mode overlaps exactly this
        part). With cfg.data_echo=e>1 only ceil(K/e) distinct batches are
        read and shipped; put_stack() repeats them on device (data echoing,
        Choi et al. 2020 'Faster Neural Network Training with Data Echoing'
        — an OPT-IN trade of batch freshness for input-wire bandwidth on
        transports that cannot feed the chip, e.g. the tunneled relay's
        ~28 MB/s post-fetch put cap vs the 60 MB/s a 1024px batch-16 run
        consumes — docs/ROUND5_NOTES.md. Default 1 is reference-exact:
        every iteration consumes a fresh loader batch)."""
        e = max(1, self.cfg.data_echo)
        m = -(-k_steps // e)
        out = np.stack([next(loader) for _ in range(m)])
        self._last_stack_bytes = out.nbytes
        return out

    def put_stack(self, stack, k_steps: int | None = None):
        """Ship an assembled window to the device (uint8 wire); when data
        echoing shipped fewer than K distinct batches, tile them on device
        (repeats land K/e iterations apart, not adjacent)."""
        from ..parallel import shard_stacked_batches

        k = k_steps if k_steps is not None else self.cfg.steps_per_dispatch
        arr = shard_stacked_batches(self.mesh, jnp.asarray(stack))
        if arr.shape[0] < k:
            arr = _tile_window(arr, k)
        return arr

    def put_window(self, loader, k_steps: int):
        """Async upload of K stacked batches for step_window (uint8 wire)."""
        return self.put_stack(self.stack_window(loader, k_steps), k_steps)

    def run(self, *, max_iters: int | None = None, logger=None,
            data_seed=None):
        cfg = self.cfg
        logger = logger or ExperimentLogger(self.exp_root)
        # open_dataset prefers a prebuilt uint8 memmap cache (zero decode
        # on the 1-core host) and falls back to decode-per-read
        dataset = open_dataset(cfg.data_folder, cfg.generated_img_size)
        loader = infinite_loader(dataset, cfg.batch_size,
                                 seed=data_seed if data_seed is not None
                                 else cfg.seed, uint8_hwc=True)

        self.rng, k_sample = random.split(self.rng)
        sample_z = random.normal(k_sample, (cfg.val_sample_num, cfg.latent))

        mean_path_length = jnp.asarray(0.0)
        last_metrics = {"r1": 0.0, "path": 0.0, "path_length": 0.0}
        end = min(cfg.training_iters,
                  self.start_iter + max_iters if max_iters else
                  cfg.training_iters)

        def pack(metrics, extra=()):
            """Stack a step's metric leaves into ONE device buffer, enqueued
            IMMEDIATELY after the step that produced them. Enqueue order is
            load-bearing on the single-stream relay: if the stack op is
            built lazily at flush time (i.e. after the NEXT window has been
            dispatched), it queues behind that window, the flush blocks a
            full extra window, and the logged train_time double-counts —
            sum(train_time) exceeded the actual run wall by 27% before this
            was measured and moved here."""
            keys = sorted(k for k in metrics if k != "mean_path")
            cols = [metrics[k] for k in keys] + [
                metrics[v] for v in (("mean_path",) if "mean_path" in metrics
                                     else ())] + list(extra)
            return keys, jnp.stack(cols)

        def flush(pending):
            """Fetch + log a previous iteration's packed metrics — called
            AFTER the next step has been dispatched, so by flush time the
            buffer is computed and np.asarray is a pure transfer (one packed
            fetch: per-leaf pulls each pay a full host round-trip on the
            tunneled relay)."""
            p_idx, p_t0, keys, packed = pending
            vals = np.asarray(packed)
            last_metrics.update({k: float(v) for k, v in zip(keys, vals)})
            last_metrics["mean_path_avg"] = float(vals[-1])
            logger.log_iteration(p_idx, time.time() - p_t0, last_metrics)

        def flush_window(pending_w, next_t0=None, vals=None):
            """Fetch + log a window's K packed per-iteration metrics with ONE
            transfer. Per-iteration time is the PASS-BOUNDARY delta (this
            window's dispatch to the next window's dispatch) — the true
            pipelined rate; fetch-completion time would fold the in-flight
            next window into this one's number. Serial input_put passes the
            already-fetched `vals` (its drain point) and still logs the
            pass-boundary time so the idle-put cost stays in the number."""
            i0, w_t0, keys, packed = pending_w
            if vals is None:
                vals = np.asarray(packed)
            k_steps = vals.shape[1]
            per_iter = ((next_t0 or time.time()) - w_t0) / k_steps
            for j in range(k_steps):
                last_metrics.update(
                    {k: float(v) for k, v in zip(keys, vals[:, j])})
                last_metrics["mean_path_avg"] = float(vals[-1, j])
                logger.log_iteration(i0 + j, per_iter, last_metrics)

        pending = None
        fid_eval = None
        fid_eval_iter = None  # the iteration whose g_ema the eval snapshots

        def _is_oom(e) -> bool:
            return "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e)

        def _sync_fid(batch_size):
            """Synchronous FID (the reference's stalling behavior,
            train.py:436-441) — the overlapped path's OOM fallback: no g_ema
            snapshot resident, and a halvable batch."""
            from ..evaluation import get_model_fid_score
            while batch_size >= 1:
                try:
                    return get_model_fid_score(
                        self.g_ema_params, self.g_config,
                        self.inception_params, self.real_stats,
                        batch_size=batch_size,
                        num_sample=cfg.fid_n_sample, mesh=self.mesh)
                except Exception as e:  # noqa: BLE001 - halve batch on OOM
                    if not _is_oom(e) or batch_size == 1:
                        raise
                    logger.write(f"FID batch {batch_size} OOM; "
                                 f"halving to {batch_size // 2}\n")
                    batch_size //= 2

        def fid_tick(n_batches):
            """Advance an in-flight overlapped FID eval; log on completion.
            If the eval's extra HBM (g_ema snapshot + in-flight feature
            batches on top of training state) OOMs, degrade to a synchronous
            eval instead of killing the run."""
            nonlocal fid_eval
            if fid_eval is None:
                return
            try:
                score = fid_eval.advance(n_batches)
            except Exception as e:  # noqa: BLE001 - OOM fallback only
                if not _is_oom(e):
                    raise
                logger.write("overlapped FID OOM mid-eval; falling back to "
                             "a synchronous pass at half batch\n")
                fid_eval = None
                logger.log_fid(_sync_fid(max(1, cfg.fid_batch // 2)),
                               fid_eval_iter)
                return
            if score is not None:
                logger.log_fid(score, fid_eval_iter)
                logger.write(
                    f"FID eval overlapped with training: wall "
                    f"{time.time() - fid_eval.started:.1f}s, host-side cost "
                    f"{fid_eval.extra_seconds:.1f}s\n")
                fid_eval = None

        def do_events(iter_idx):
            if iter_idx % cfg.val_sample_freq == 0:
                self.rng, k_noise = random.split(self.rng)
                sample = self._sample_fn(self.g_ema_params, sample_z,
                                         k_noise)
                save_image_grid(
                    sample,
                    os.path.join(logger.sample_dir,
                                 f"{str(iter_idx).zfill(6)}.png"),
                    nrow=int(cfg.val_sample_num ** 0.5))

            if iter_idx % cfg.model_save_freq == 0 and iter_idx > 0:
                nonlocal fid_eval, fid_eval_iter
                if (self.inception_params is not None
                        and self.real_stats is not None):
                    if cfg.fid_overlap:
                        # start an overlapped eval on a g_ema snapshot;
                        # batches interleave with the coming iterations
                        from ..evaluation import OverlappedFIDEval

                        if fid_eval is not None:  # drain a straggler
                            fid_tick(10 ** 9)
                        self.rng, k_fid = random.split(self.rng)
                        fid_eval_iter = iter_idx
                        try:
                            fid_eval = OverlappedFIDEval(
                                self.g_ema_params, self.g_config,
                                self.inception_params, self.real_stats,
                                batch_size=cfg.fid_batch,
                                n_sample=cfg.fid_n_sample, rng=k_fid,
                                mesh=self.mesh)
                        except Exception as e:  # noqa: BLE001 - OOM only
                            if not _is_oom(e):
                                raise
                            logger.write(
                                "overlapped FID snapshot OOM; running a "
                                "synchronous eval instead\n")
                            logger.log_fid(_sync_fid(cfg.fid_batch),
                                           iter_idx)
                    else:
                        logger.log_fid(_sync_fid(cfg.fid_batch), iter_idx)
                self.save(logger, iter_idx)

        def is_event(j):
            return (j % cfg.val_sample_freq == 0
                    or (j % cfg.model_save_freq == 0 and j > 0))

        K = cfg.steps_per_dispatch

        def window_ok(i):
            """A K-window starting at i is usable when any event inside it
            falls on its LAST iteration (events run after the dispatch)."""
            if self._multi_step is None or i + K > end:
                return False
            return not any(is_event(j) for j in range(i, i + K - 1))

        # strong-typed f32 scalars: Python floats would trace the K-step
        # scan a second time (weak f32[] avals on dispatch 1 vs the strong
        # f32 arrays it returns) — a full re-trace of the >800-leaf scan
        last_reg = tuple(jnp.asarray(0.0, jnp.float32) for _ in range(3))
        pending_w = None
        pending_w_vals = None
        # --- input_put controller (VERDICT r4 #6) --------------------------
        # auto: window 1 is drained first (forcing the transport's
        # post-first-fetch regime — docs/ROUND5_NOTES.md) and idle-probed;
        # window 2 is busy-probed in flight; windows 3..4 run forced-serial
        # (trajectory-identical; tests/test_train.py) so their
        # dispatch->drain wall directly measures the per-window compute
        # time; then decide_put_mode's wall model picks at window 5. Raw
        # probe samples and the decision model land in metrics.jsonl.
        auto_put = cfg.input_put == "auto"
        put_mode = "overlap" if auto_put else cfg.input_put
        measuring = auto_put           # windows forced serial until decided
        put_decided = not auto_put
        put_probes = {"idle": None, "busy": None}
        t_compute_est = None
        t_drain_samples = []   # direct t_compute: dispatch -> drain wall
        n_windows = 0
        # windows between busy re-probes in auto mode (env override exists
        # so the reprobe/mode-switch branch is testable on short CPU runs)
        REPROBE_EVERY = int(os.environ.get("CAGC_REPROBE_EVERY", "256"))

        def log_probe(stage, idle_s, busy_s):
            rec = {"event": "input_put_probe", "stage": stage}
            if idle_s is not None:
                rec["idle_s"] = [round(t, 4) for t in idle_s]
            if busy_s is not None:
                rec["busy_s"] = [round(t, 4) for t in busy_s]
            logger.log_event(rec)
            txt = " / ".join(
                f"{statistics.median(s) * 1e3:.0f} ms {nm}"
                for nm, s in (("idle", idle_s), ("busy", busy_s))
                if s is not None)
            logger.write(f"input_put {stage} probe: 64 MB put {txt}\n")
        try:
            iter_idx = self.start_iter
            real = window = None
            if window_ok(iter_idx):
                window = self.put_window(loader, K)   # prime the prefetch
            else:
                real = self.put_batch(next(loader))
            while iter_idx < end:
                t0 = time.time()
                if window is not None:
                    i0 = iter_idx
                    metricsK, mean_path_length, last_reg = self.step_window(
                        i0, window, mean_path_length, last_reg)
                    # pack NOW — the stack op must land on the stream right
                    # behind its own window, before the next one (see pack())
                    w_keys, w_packed = pack(metricsK)
                    iter_idx += K
                    window = real = None
                    n_windows += 1
                    probe_vals = None
                    if auto_put and n_windows == 1:
                        # drain window 1 FIRST: the first device->host fetch
                        # permanently flips this transport class into its
                        # slow put regime (docs/ROUND5_NOTES.md), and both
                        # probes must measure the regime production runs in
                        probe_vals = np.asarray(w_packed)   # drain = fetch
                        idle = put_probe()
                        put_probes["idle"] = idle
                        log_probe("probe_idle", idle, None)
                    elif auto_put and n_windows == 2:
                        # window 2 is in flight: the busy regime
                        busy = put_probe()
                        put_probes["busy"] = busy
                        log_probe("probe_busy", None, busy)
                    elif (auto_put and not put_decided and n_windows >= 5
                          and len(t_drain_samples) >= 2):
                        # windows 3..4 ran forced-serial with no probes in
                        # the pass: their dispatch->drain wall IS the
                        # per-window compute time, measured directly (the
                        # round-5 1024px e2e showed the pass-time-minus-
                        # put subtraction mis-splits when the probe
                        # bandwidth differs from the actual window put's)
                        W = self._last_stack_bytes
                        t_compute_est = statistics.median(t_drain_samples)
                        put_mode, model = decide_put_mode(
                            put_probes["idle"], put_probes["busy"], W,
                            t_compute_est)
                        put_decided = True
                        measuring = False
                        logger.log_event({"event": "input_put_decision",
                                          "mode": put_mode, **model})
                        logger.write(f"input_put decision: {put_mode} "
                                     f"{model}\n")
                    elif (auto_put and put_decided
                          and n_windows % REPROBE_EVERY == 0):
                        # transports degrade (and recover) mid-run: re-probe
                        # the busy regime and re-run the wall model; the
                        # idle reference and t_compute stay from the last
                        # serial measurements
                        busy = put_probe()
                        put_probes["busy"] = busy
                        log_probe("reprobe", None, busy)
                        if put_mode == "serial" and t_drain_samples:
                            t_compute_est = statistics.median(
                                t_drain_samples)
                        new_mode, model = decide_put_mode(
                            put_probes["idle"], busy,
                            self._last_stack_bytes, t_compute_est)
                        if new_mode != put_mode:
                            logger.write(f"input_put mode switch: "
                                         f"{put_mode} -> {new_mode} "
                                         f"{model}\n")
                            logger.log_event(
                                {"event": "input_put_decision",
                                 "mode": new_mode, "stage": "reprobe",
                                 **model})
                            put_mode = new_mode
                    win_serial = put_mode == "serial" or measuring
                    want_window = window_ok(iter_idx)
                    want_single = not want_window and iter_idx < end
                    next_stack = next_single = None
                    if not win_serial:
                        if want_window:            # prefetch next window
                            window = self.put_window(loader, K)
                        elif want_single:
                            real = self.put_batch(next(loader))
                    else:
                        # serial staging: only HOST work (disk + memcpy)
                        # while the window computes; the wire transfer waits
                        # for the drain so it runs at idle bandwidth
                        if want_window:
                            next_stack = self.stack_window(loader, K)
                        elif want_single:
                            next_single = next(loader)
                    fid_tick(cfg.fid_batches_per_iter * K)
                    if pending is not None:
                        flush(pending)
                        pending = None
                    if pending_w is not None:      # overlapped by this window
                        flush_window(pending_w, next_t0=t0,
                                     vals=pending_w_vals)
                        pending_w = pending_w_vals = None
                    pending_w = (i0, t0, w_keys, w_packed)
                    if win_serial:
                        # drain: blocks until THIS window completes; the log
                        # line waits for the next pass boundary so its time
                        # includes the puts below
                        pending_w_vals = (probe_vals if probe_vals is not None
                                          else np.asarray(w_packed))
                        if probe_vals is None and n_windows >= 3:
                            # dispatch->drain wall = direct t_compute sample
                            # (windows 1-2 carry compile / probe cost)
                            t_drain_samples.append(time.time() - t0)
                            t_drain_samples = t_drain_samples[-8:]
                        if is_event(iter_idx - 1):
                            flush_window(pending_w, vals=pending_w_vals)
                            pending_w = pending_w_vals = None
                            do_events(iter_idx - 1)
                        # device idle here: transfers run at full bandwidth
                        if want_window:
                            window = self.put_stack(next_stack)
                        elif want_single:
                            real = self.put_batch(next_single)
                    else:
                        if probe_vals is not None:  # window 1 was drained
                            pending_w_vals = probe_vals
                        if is_event(iter_idx - 1):
                            # event needs in-order logs + synced state anyway
                            flush_window(pending_w, vals=pending_w_vals)
                            pending_w = pending_w_vals = None
                            do_events(iter_idx - 1)
                else:
                    metrics, mean_path_length = self.step(
                        iter_idx, real, mean_path_length)
                    s_keys, s_packed = pack(metrics, (mean_path_length,))
                    iter_idx += 1
                    real = None
                    want_window = window_ok(iter_idx)
                    want_single = not want_window and iter_idx < end
                    next_stack = next_single = None
                    if put_mode == "serial":
                        # stage HOST work only while the step computes; the
                        # wire transfer waits for the drain below (same rule
                        # as the window branch — ADVICE r4: this branch used
                        # to put while the step was in flight, re-introducing
                        # the busy-device stall around every event boundary
                        # that falls back to single steps)
                        if want_window:
                            next_stack = self.stack_window(loader, K)
                        elif want_single:
                            next_single = next(loader)
                    else:
                        if want_window:
                            window = self.put_window(loader, K)
                        elif want_single:
                            real = self.put_batch(next(loader))
                    fid_tick(cfg.fid_batches_per_iter)
                    if pending_w is not None:
                        flush_window(pending_w, next_t0=t0,
                                     vals=pending_w_vals)
                        pending_w = pending_w_vals = None
                    if pending is not None:
                        flush(pending)
                    pending = (iter_idx - 1, t0, s_keys, s_packed)
                    if put_mode == "serial":
                        # drain: the flush's np.asarray blocks until THIS
                        # step completes; events then run on the synced
                        # state, and the device is idle for the puts below
                        flush(pending)
                        pending = None
                        if is_event(iter_idx - 1):
                            do_events(iter_idx - 1)
                        if want_window:
                            window = self.put_stack(next_stack)
                        elif want_single:
                            real = self.put_batch(next_single)
                    # periodic events sync the device anyway — flush first so
                    # the log lines stay in order around sample/FID/ckpt
                    elif is_event(iter_idx - 1):
                        flush(pending)
                        pending = None
                        do_events(iter_idx - 1)
            fid_tick(10 ** 9)  # drain any in-flight eval before returning
            if pending_w is not None:
                flush_window(pending_w, vals=pending_w_vals)
            if pending is not None:
                flush(pending)
        finally:
            loader.close()
        return logger

"""FID evaluation (reference Evaluation/fid.py).

Sharded, jitted sample->feature streaming on device; Frechet distance on the
host with scipy.linalg.sqrtm in float64 (matching fid.py:41-64 exactly,
including the singular-cov eps retry and imaginary-component check).

Real-FFHQ statistics: the reference ships pre-stored pickles (missing blobs,
SURVEY.md section 2.3); `compute_real_stats_from_folder` rebuilds them from
an image folder (the calc_inception.py flow without the LMDB detour), and
`get_model_fid_score` accepts either a pickle path or a stats dict.
"""

from __future__ import annotations

import os
import pickle
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.stylegan2 import generator_apply
from ..models.inception import inception_pool3

# the feature function both sides of the Frechet distance must share:
# patched FID InceptionV3, [-1,1] images entering RAW (normalize_input=False,
# reference calc_inception.py:54)
INCEPTION_REGIME = "patched_fid_inception_raw[-1,1]"


@partial(jax.jit, static_argnames=("config", "truncation", "packed"))
def _feature_step(g_params, inc_params, z, rng, *, config, truncation,
                  truncation_latent, packed=True):
    """One fixed-shape sample->pool3 batch. Jitted ONCE at module level
    (static config/truncation/packed): per-call `jax.jit(partial(...))`
    wrappers are distinct callables to the jit cache, so every FID cycle
    would re-trace + re-lower the stream — seconds of host work per
    in-loop eval, and the single-trace invariant tested in
    tests/test_evaluation.py would only hold within one call."""
    # packed trunk with the fwd-only res>=512 gate: exact math and a
    # structural no-op below 512px (stylegan2._synthesis packed_min_res).
    # Measured +54% on the 1024px full-model feature stream (61.3 vs 39.8
    # samples/s, idle host).
    img = generator_apply(
        g_params, config, [z], truncation=truncation,
        truncation_latent=truncation_latent, rng=rng,
        packed=packed, packed_min_res=512)
    # NB: [-1,1] images enter inception RAW — the reference's FID net is
    # load_patched_inception_v3 (calc_inception.py:50-55), which builds
    # InceptionV3 with normalize_input=False, so the wrapper's 2x-1 rescale
    # (inception.py:152-153) never runs on the generated-image path
    # (fid.py:32-33). Passing normalize_input=True here would feed [-3,1]
    # and score a different metric than the reference's FID.
    return inception_pool3(inc_params, img, normalize_input=False)


def extract_feature_from_samples(
    g_params, config, inc_params, *, truncation=1.0, truncation_latent=None,
    batch_size=64, n_sample=50000, rng=None, info_print=False, mesh=None,
    packed=True,
):
    """Stream pool3 features for n_sample generated images (reference
    fid.py:19-38). Returns [n_sample-ish, 2048] float64 numpy.

    With `mesh`, each latent batch is sharded over the data axis so the
    50k-sample stream runs data-parallel across the slice (the reference
    DataParallels both G and inception, fid.py:98-105).

    Every device batch has the SAME static shape (batch_size): a residual
    n_sample % batch_size is covered by one extra full batch whose surplus
    feature rows are dropped on the host. One jit trace total — a
    shape-changing residual batch would pay a second full XLA compile
    (multiple minutes at 1024px through the remote-compile tunnel) for one
    batch of work."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n_batch = max(1, -(-n_sample // batch_size))
    step = partial(_feature_step, config=config, truncation=truncation,
                   truncation_latent=truncation_latent, packed=packed)
    shard = None
    if mesh is not None:
        from ..parallel import batch_sharding

        shard = batch_sharding(mesh)

    feats = []
    for idx in range(n_batch):
        rng, kz, kn = jax.random.split(rng, 3)
        z = jax.random.normal(kz, (batch_size, config.style_dim))
        if shard is not None and batch_size % mesh.size == 0:
            z = jax.device_put(z, shard)
        if info_print and idx % 50 == 0:
            print(f"FID features: batch {idx + 1}/{n_batch}")
        feats.append(np.asarray(step(g_params, inc_params, z=z, rng=kn)))
    return np.concatenate(feats, axis=0)[:n_sample].astype(np.float64)


def calc_fid(sample_mean, sample_cov, real_mean, real_cov, eps=1e-6):
    """Frechet distance (reference fid.py:41-64)."""
    import warnings

    from scipy import linalg

    # `disp=` is deprecated (removal slated for SciPy 1.18); modern sqrtm
    # returns just the array and warns on singular input instead of erroring,
    # which preserves the reference's disp=False retry semantics below.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", linalg.LinAlgWarning)
        cov_sqrt = linalg.sqrtm(sample_cov @ real_cov)

    if not np.isfinite(cov_sqrt).all():
        warnings.warn("product of cov matrices is singular; retrying with "
                      f"eps={eps} on the diagonals", RuntimeWarning,
                      stacklevel=2)
        offset = np.eye(sample_cov.shape[0]) * eps
        cov_sqrt = linalg.sqrtm((sample_cov + offset) @ (real_cov + offset))

    if np.iscomplexobj(cov_sqrt):
        if not np.allclose(np.diagonal(cov_sqrt).imag, 0, atol=1e-3):
            m = np.max(np.abs(cov_sqrt.imag))
            raise ValueError(f"Imaginary component {m}")
        cov_sqrt = cov_sqrt.real

    mean_diff = sample_mean - real_mean
    mean_norm = mean_diff @ mean_diff
    trace = np.trace(sample_cov) + np.trace(real_cov) - 2 * np.trace(cov_sqrt)
    return mean_norm + trace


def load_real_stats(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def _check_regime(stats: dict):
    """Refuse stats computed under a different inception feature function
    (absent key = reference-built or pre-stamp pickle, accepted as-is)."""
    regime = stats.get("inception_regime")
    if regime is not None and regime != INCEPTION_REGIME:
        raise ValueError(
            f"real-stats pickle was computed under feature regime {regime!r} "
            f"but this build extracts {INCEPTION_REGIME!r}; regenerate the "
            "stats (compute_real_stats_from_folder / calc_inception.py)")


def get_model_fid_score(
    g_params, config, inc_params, real_stats, *, truncation=1.0,
    truncation_latent=None, batch_size=100, num_sample=50000, rng=None,
    info_print=False, mesh=None, packed=True,
):
    """One-button FID (reference Get_Model_FID_Score, fid.py:67-121).
    `real_stats`: {'mean','cov'} dict or a pickle path."""
    if isinstance(real_stats, str):
        real_stats = load_real_stats(real_stats)
    _check_regime(real_stats)
    start = time.time()
    features = extract_feature_from_samples(
        g_params, config, inc_params, truncation=truncation,
        truncation_latent=truncation_latent, batch_size=batch_size,
        n_sample=num_sample, rng=rng, info_print=info_print, mesh=mesh,
        packed=packed)
    if info_print:
        print(f"feature extraction took {time.time() - start:.2f}s, "
              f"shape {features.shape}")
    sample_mean = np.mean(features, 0)
    sample_cov = np.cov(features, rowvar=False)
    return calc_fid(sample_mean, sample_cov,
                    real_stats["mean"], real_stats["cov"])


class OverlappedFIDEval:
    """In-loop FID that interleaves with training instead of stalling it
    (SURVEY.md section 7 hard-part #5; the reference blocks the loop for the
    full 50k-sample pass, train.py:436-441).

    One (or a few) feature batches are dispatched per training iteration
    onto the same ordered device stream; the feature fetch for batch i is
    delayed until after later work has been dispatched, so the device never
    idles waiting on the host. Evaluates a SNAPSHOT of g_ema taken at
    construction time, preserving the reference's "FID of g_ema at iteration
    k" semantics while the live g_ema keeps training.
    """

    def __init__(self, g_params, config, inc_params, real_stats, *,
                 batch_size=64, n_sample=50000, rng=None, mesh=None,
                 truncation=1.0, truncation_latent=None, packed=True):
        # snapshot: the training loop donates/overwrites the live buffers
        self._g = jax.tree_util.tree_map(jnp.copy, g_params)
        self._inc = inc_params
        self._real = (load_real_stats(real_stats)
                      if isinstance(real_stats, str) else real_stats)
        _check_regime(self._real)
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._cfg = config
        self._bs = batch_size
        # fixed-shape batches only (one jit trace): ceil(n/b) full batches,
        # surplus feature rows dropped at scoring time
        self._n_sample = n_sample
        self._n_batch = max(1, -(-n_sample // batch_size))
        self._step = partial(
            _feature_step, config=config, truncation=truncation,
            truncation_latent=truncation_latent, packed=packed)
        self._shard = None
        if mesh is not None:
            from ..parallel import batch_sharding

            self._mesh_size = mesh.size
            self._shard = batch_sharding(mesh)
        self._idx = 0
        self._pending = None   # device features awaiting fetch
        self._feats = []
        self.started = time.time()
        self.extra_seconds = 0.0  # host+fetch time attributable to the eval

    @property
    def done(self) -> bool:
        return self._idx >= self._n_batch and self._pending is None

    def advance(self, n_batches: int = 1):
        """Dispatch up to n_batches feature batches and drain the delayed
        fetch. Returns the FID score when the stream completes, else None."""
        for _ in range(n_batches):
            if self._idx >= self._n_batch:
                break
            self._rng, kz, kn = jax.random.split(self._rng, 3)
            z = jax.random.normal(kz, (self._bs, self._cfg.style_dim))
            if self._shard is not None and self._bs % self._mesh_size == 0:
                z = jax.device_put(z, self._shard)
            feats = self._step(self._g, self._inc, z=z, rng=kn)
            if self._pending is not None:
                t0 = time.time()
                self._feats.append(np.asarray(self._pending))
                self.extra_seconds += time.time() - t0
            self._pending = feats
            self._idx += 1
        if self._idx >= self._n_batch and self._pending is not None:
            t0 = time.time()
            self._feats.append(np.asarray(self._pending))
            self._pending = None
            features = np.concatenate(
                self._feats, 0)[:self._n_sample].astype(np.float64)
            self._feats = []
            self._g = None  # release the snapshot HBM
            score = calc_fid(np.mean(features, 0),
                             np.cov(features, rowvar=False),
                             self._real["mean"], self._real["cov"])
            self.extra_seconds += time.time() - t0
            return score
        return None


def compute_real_stats_from_folder(
    folder: str, inc_params, *, size: int, batch_size=64, n_sample=None,
    save_path: str | None = None, info_print=False,
):
    """Build {'mean','cov'} Inception statistics from a folder of images —
    replaces the missing pre-stored pickles (reference calc_inception.py flow,
    keeping the same [-1,1]-input quirk as the generated-image path)."""
    from PIL import Image

    files = sorted(
        os.path.join(folder, f) for f in os.listdir(folder)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
    if n_sample:
        files = files[:n_sample]
    if not files:
        raise ValueError(f"no images found in {folder}")

    # normalize_input=False: same patched-inception configuration as the
    # generated-image path (_feature_step) and the reference's real-stats
    # builder (calc_inception.py:54) — both sides of the Frechet distance
    # must use the identical feature function.
    step = jax.jit(lambda p, x: inception_pool3(p, x, normalize_input=False))
    feats = []
    batch = []
    for i, f in enumerate(files):
        img = Image.open(f).convert("RGB").resize((size, size), Image.LANCZOS)
        arr = np.asarray(img, np.float32).transpose(2, 0, 1) / 127.5 - 1.0
        batch.append(arr)
        if len(batch) == batch_size or i == len(files) - 1:
            feats.append(np.asarray(step(inc_params, jnp.asarray(np.stack(batch)))))
            batch = []
            if info_print:
                print(f"real stats: {i + 1}/{len(files)} images")
    features = np.concatenate(feats, 0).astype(np.float64)
    # inception_regime stamps WHICH feature function produced these stats:
    # stats pickles saved before the normalize_input fix (commit 59c6c0e)
    # were computed in a different feature space and must be regenerated —
    # mixing regimes across the two sides of the Frechet distance is a
    # silent wrong-FID (ADVICE r3). Absent key = pre-fix or reference-built.
    stats = {"mean": np.mean(features, 0),
             "cov": np.cov(features, rowvar=False),
             "size": size,
             "inception_regime": INCEPTION_REGIME}
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        with open(save_path, "wb") as f:
            pickle.dump(stats, f)
    return stats

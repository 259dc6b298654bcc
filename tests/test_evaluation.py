"""Evaluation layer tests: LPIPS math vs an independent torch oracle,
FID Frechet distance vs analytic values, inception plumbing, PPL smoke."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from content_aware_gan_compression_tpu.models.lpips import (
    lpips_init, lpips_apply, vgg16_features, VGG16_CONVS,
)
from content_aware_gan_compression_tpu.models.inception import (
    inception_init, inception_pool3, _avgpool_excl_pad,
)
from content_aware_gan_compression_tpu.evaluation import (
    calc_fid, get_model_fid_score, get_ppl_score, extract_feature_from_samples,
)
from content_aware_gan_compression_tpu.models import (
    GeneratorConfig, generator_init,
)


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------

def torch_lpips_oracle(params, x0, x1):
    """Independent torch implementation of the LPIPS formula (scaling layer,
    VGG16 slices, channel-unit-normalize, squared diff, 1x1 heads, spatial
    mean, sum) using the SAME random weights as the jax params."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        h = (x - shift) / scale
        outs = []
        conv_i = 0
        seq = 0
        pools = {4, 9, 16, 23}
        ends = {3, 8, 15, 22, 29}
        while len(outs) < 5:
            if seq in pools:
                h = F.max_pool2d(h, 2)
                seq += 1
                continue
            idx, _, _ = VGG16_CONVS[conv_i]
            w = torch.tensor(np.asarray(params["vgg"][str(idx)]["weight"]))
            b = torch.tensor(np.asarray(params["vgg"][str(idx)]["bias"]))
            h = F.relu(F.conv2d(h, w, b, padding=1))
            conv_i += 1
            seq += 2
            if seq - 1 in ends:
                outs.append(h)
        return outs

    f0, f1 = feats(x0), feats(x1)
    val = 0
    for kk, (a, b) in enumerate(zip(f0, f1)):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        diff = (na - nb) ** 2
        w = torch.tensor(np.asarray(params["lins"][str(kk)]["weight"]))
        val = val + F.conv2d(diff, w).mean([2, 3], keepdim=True)
    return val


def test_lpips_matches_torch_oracle():
    params = lpips_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 3, 64, 64).astype(np.float32) * 0.5
    x1 = (x0 + rng.randn(2, 3, 64, 64).astype(np.float32) * 0.1)
    want = torch_lpips_oracle(params, torch.tensor(x0), torch.tensor(x1))
    got = lpips_apply(params, jnp.asarray(x0), jnp.asarray(x1))
    assert got.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-3, atol=1e-5)


def test_lpips_zero_for_identical_inputs():
    params = lpips_init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.RandomState(1).randn(1, 3, 32, 32), jnp.float32)
    d = lpips_apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-10)


# ---------------------------------------------------------------------------
# Inception / FID
# ---------------------------------------------------------------------------

def test_avgpool_excl_pad_matches_torch():
    x = np.random.RandomState(2).randn(1, 8, 8, 5).astype(np.float32)
    want = F.avg_pool2d(torch.tensor(x.transpose(0, 3, 1, 2)), 3, 1, 1,
                        count_include_pad=False).numpy()
    got = np.asarray(_avgpool_excl_pad(jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_inception():
    return inception_init(jax.random.PRNGKey(3))


def test_inception_pool3_shape(tiny_inception):
    x = jnp.asarray(np.random.RandomState(3).randn(2, 3, 75, 75), jnp.float32)
    feat = inception_pool3(tiny_inception, x)
    assert feat.shape == (2, 2048)
    assert np.isfinite(np.asarray(feat)).all()


def test_calc_fid_analytic():
    d = 4
    m1, m2 = np.zeros(d), np.ones(d)
    c = np.eye(d)
    # identical Gaussians -> 0
    assert abs(calc_fid(m1, c, m1, c)) < 1e-8
    # mean shift only -> ||dm||^2
    np.testing.assert_allclose(calc_fid(m1, c, m2, c), d, atol=1e-8)
    # commuting covs: tr(C1 + C2 - 2 sqrt(C1 C2))
    c2 = 4 * np.eye(d)
    np.testing.assert_allclose(calc_fid(m1, c, m1, c2), d * (1 + 4 - 2 * 2),
                               atol=1e-8)


def test_fid_pipeline_end_to_end(tiny_inception):
    cfg = GeneratorConfig(size=16, style_dim=16, n_mlp=1,
                          net_shape=(8, 8, 8, 8, 8, 8))
    gp = generator_init(jax.random.PRNGKey(4), cfg)
    feats = extract_feature_from_samples(
        gp, cfg, tiny_inception, batch_size=2, n_sample=4,
        rng=jax.random.PRNGKey(5))
    assert feats.shape == (4, 2048)
    stats = {"mean": feats.mean(0),
             "cov": np.cov(feats, rowvar=False) + np.eye(2048) * 1e-3}
    fid = get_model_fid_score(gp, cfg, tiny_inception, stats, batch_size=2,
                              num_sample=4, rng=jax.random.PRNGKey(5))
    # same seed -> identical features; only the 1e-3 ridge on the stats cov
    # separates the two Gaussians, so FID ~= ridge * dim / 2-ish. The point
    # is plumbing (shapes/finiteness), not the value at n=4 << d=2048.
    assert np.isfinite(fid) and 0 <= fid < 10.0


def test_fid_feature_path_uses_reference_normalization(tiny_inception):
    """The FID feature function must be the reference's: [-1,1] images into
    the patched inception with normalize_input=False (the reference builds
    its FID net via load_patched_inception_v3, calc_inception.py:50-55, so
    the wrapper's 2x-1 rescale, inception.py:152-153, never runs). A
    regression here would silently score a different metric than the
    reference — and than the prestored real-FFHQ statistics."""
    from content_aware_gan_compression_tpu.models.stylegan2 import (
        generator_apply)

    cfg = GeneratorConfig(size=16, style_dim=16, n_mlp=1,
                          net_shape=(8, 8, 8, 8, 8, 8))
    gp = generator_init(jax.random.PRNGKey(4), cfg)

    # replay extract_feature_from_samples' internal rng schedule for the
    # first (only) batch: rng -> (rng, kz, kn), z ~ N(0,1), noise rng = kn
    rng, kz, kn = jax.random.split(jax.random.PRNGKey(5), 3)
    z = jax.random.normal(kz, (2, cfg.style_dim))
    img = generator_apply(gp, cfg, [z], rng=kn, packed=True,
                          packed_min_res=512)
    want = np.asarray(inception_pool3(tiny_inception, img,
                                      normalize_input=False))
    wrong = np.asarray(inception_pool3(tiny_inception, img,
                                       normalize_input=True))

    got = extract_feature_from_samples(
        gp, cfg, tiny_inception, batch_size=2, n_sample=2,
        rng=jax.random.PRNGKey(5))
    np.testing.assert_allclose(got, want.astype(np.float64), rtol=1e-5,
                               atol=1e-6)
    # and the two configurations genuinely differ (the test has teeth)
    assert np.abs(want - wrong).max() > 1e-3


# ---------------------------------------------------------------------------
# PPL
# ---------------------------------------------------------------------------

def test_ppl_score_runs_and_positive():
    cfg = GeneratorConfig(size=16, style_dim=16, n_mlp=1,
                          net_shape=(8, 8, 8, 8, 8, 8))
    gp = generator_init(jax.random.PRNGKey(6), cfg)
    lp = lpips_init(jax.random.PRNGKey(7))
    ppl = get_ppl_score(gp, cfg, lp, n_sample=8, batch_size=4,
                        rng=jax.random.PRNGKey(8))
    assert np.isfinite(ppl) and ppl >= 0


def test_ppl_sample_count_exact():
    """The distance count equals --n_sample for every n_sample/batch_size
    relation: residual batches are trimmed, and n_sample < batch_size runs
    one trimmed batch instead of a full (overshooting) one."""
    cfg = GeneratorConfig(size=16, style_dim=16, n_mlp=1,
                          net_shape=(8, 8, 8, 8, 8, 8))
    gp = generator_init(jax.random.PRNGKey(6), cfg)
    lp = lpips_init(jax.random.PRNGKey(7))
    for n_sample, batch in ((3, 4), (6, 4), (8, 4)):
        _, d = get_ppl_score(gp, cfg, lp, n_sample=n_sample,
                             batch_size=batch, rng=jax.random.PRNGKey(8),
                             return_distances=True)
        assert len(d) == n_sample, (n_sample, batch, len(d))


def test_fid_feature_stream_single_trace(tiny_inception):
    """A residual batch (n_sample % batch_size != 0) must NOT re-trace the
    feature step: at 1024px through the remote-compile tunnel a second trace
    is a multi-minute compile for one batch of work. Fixed-shape batches +
    host-side truncation keep it to ONE lowering and return exactly
    n_sample features."""
    import jax._src.test_util as jtu

    cfg = GeneratorConfig(size=16, style_dim=16, n_mlp=1,
                          net_shape=(8, 8, 8, 8, 8, 8))
    gp = generator_init(jax.random.PRNGKey(4), cfg)
    # warm every lowering (feature step + eager helpers) at batch_size=4...
    extract_feature_from_samples(
        gp, cfg, tiny_inception, batch_size=4, n_sample=8,
        rng=jax.random.PRNGKey(5))
    # ...then a run WITH a residual (10 % 4 != 0) must add ZERO lowerings:
    # every device batch has the same static shape; surplus rows are cut on
    # the host
    with jtu.count_jit_and_pmap_lowerings() as count:
        feats = extract_feature_from_samples(
            gp, cfg, tiny_inception, batch_size=4, n_sample=10,
            rng=jax.random.PRNGKey(7))
    assert feats.shape == (10, 2048)
    assert count() == 0, f"residual batch added {count()} lowerings"


def test_overlapped_fid_matches_synchronous_score(tiny_inception):
    """Same rng => OverlappedFIDEval and the synchronous path draw the
    identical latent stream (same fixed batch shapes, same split order) and
    must return the IDENTICAL score — the overlap changes scheduling, not
    the eval (VALIDATION.md's in-loop FID claim)."""
    from content_aware_gan_compression_tpu.evaluation import OverlappedFIDEval

    cfg = GeneratorConfig(size=16, style_dim=16, n_mlp=1,
                          net_shape=(8, 8, 8, 8, 8, 8))
    gp = generator_init(jax.random.PRNGKey(4), cfg)
    feats = extract_feature_from_samples(
        gp, cfg, tiny_inception, batch_size=2, n_sample=4,
        rng=jax.random.PRNGKey(5))
    stats = {"mean": feats.mean(0),
             "cov": np.cov(feats, rowvar=False) + np.eye(2048) * 1e-3}

    sync = get_model_fid_score(gp, cfg, tiny_inception, stats, batch_size=4,
                               num_sample=10, rng=jax.random.PRNGKey(11))
    ev = OverlappedFIDEval(gp, cfg, tiny_inception, stats, batch_size=4,
                           n_sample=10, rng=jax.random.PRNGKey(11))
    overlapped = None
    while overlapped is None:
        overlapped = ev.advance(1)
    np.testing.assert_allclose(overlapped, sync, rtol=0, atol=0)


def test_overlapped_fid_small_n_sample(tiny_inception):
    """OverlappedFIDEval must produce a score even when n_sample <
    batch_size (n_batch used to floor to 0 and advance() returned None
    forever, silently dropping the in-loop FID line)."""
    from content_aware_gan_compression_tpu.evaluation import OverlappedFIDEval

    cfg = GeneratorConfig(size=16, style_dim=16, n_mlp=1,
                          net_shape=(8, 8, 8, 8, 8, 8))
    gp = generator_init(jax.random.PRNGKey(4), cfg)
    feats = extract_feature_from_samples(
        gp, cfg, tiny_inception, batch_size=2, n_sample=4,
        rng=jax.random.PRNGKey(5))
    stats = {"mean": feats.mean(0),
             "cov": np.cov(feats, rowvar=False) + np.eye(2048) * 1e-3}
    ev = OverlappedFIDEval(gp, cfg, tiny_inception, stats, batch_size=4,
                           n_sample=2, rng=jax.random.PRNGKey(9))
    score = None
    for _ in range(4):  # a couple of fid_tick-style advances
        score = ev.advance(1)
        if score is not None:
            break
    assert score is not None and np.isfinite(score)
    assert ev.done


def test_slerp_endpoints():
    from content_aware_gan_compression_tpu.evaluation import slerp
    a = jnp.asarray(np.random.RandomState(9).randn(3, 8), jnp.float32)
    b = jnp.asarray(np.random.RandomState(10).randn(3, 8), jnp.float32)
    s0 = np.asarray(slerp(a, b, 0.0))
    an = np.asarray(a) / np.linalg.norm(a, axis=-1, keepdims=True)
    np.testing.assert_allclose(s0, an, rtol=1e-4, atol=1e-5)

"""calc_inception.py CLI (reference Evaluation/calc_inception.py:75-116):
reference-compatible flags and output pickle schema, fixed-batch-shape
feature streaming with the wrap-and-drop tail policy, and statistics that
match a direct per-image computation through the same patched-inception
configuration (normalize_input=False)."""

import os
import pickle
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import calc_inception
from content_aware_gan_compression_tpu.models.inception import (
    inception_init, inception_pool3)

N_IMAGES = 6
SIZE = 32


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    from PIL import Image

    folder = tmp_path_factory.mktemp("real_images")
    rs = np.random.RandomState(11)
    for i in range(N_IMAGES):
        arr = rs.randint(0, 256, (SIZE, SIZE, 3), np.uint8)
        Image.fromarray(arr).save(folder / f"{i:05d}.png")
    return folder


def test_calc_inception_cli_stats_and_schema(image_folder, tmp_path,
                                             monkeypatch):
    tiny = inception_init(jax.random.PRNGKey(7), width_scale=0.25)
    monkeypatch.setattr(
        "content_aware_gan_compression_tpu.models.inception."
        "load_fid_inception", lambda path: tiny)

    out = tmp_path / "inception_test.pkl"
    # batch 4 over n_sample 6: two fixed-shape batches, the second wraps to
    # indices [4, 5, 0, 1] and its surplus rows are dropped — exercises the
    # single-trace tail policy
    calc_inception.main([
        "--size", str(SIZE), "--batch", "4", "--n_sample", str(N_IMAGES),
        "--inception_ckpt", str(next(image_folder.iterdir())),
        "--output", str(out), str(image_folder)])

    with open(out, "rb") as f:
        stats = pickle.load(f)
    # the reference's schema (calc_inception.py:116); get_fid.py consumes
    # the {'mean','cov'} subset
    assert set(stats) == {"mean", "cov", "size", "path"}
    assert stats["size"] == SIZE

    # direct per-image recomputation: sorted file order, no flip, [-1,1]
    # images RAW into the patched inception (normalize_input=False)
    from PIL import Image

    feats = []
    for f in sorted(os.listdir(image_folder)):
        arr = np.asarray(Image.open(image_folder / f), np.float32)
        img = jnp.asarray(arr.transpose(2, 0, 1)[None] / 127.5 - 1.0)
        feats.append(np.asarray(
            inception_pool3(tiny, img, normalize_input=False)))
    feats = np.concatenate(feats, 0).astype(np.float64)

    assert stats["mean"].shape == (feats.shape[1],)
    assert stats["cov"].shape == (feats.shape[1], feats.shape[1])
    np.testing.assert_allclose(stats["mean"], feats.mean(0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats["cov"], np.cov(feats, rowvar=False),
                               rtol=1e-4, atol=1e-6)


def test_calc_inception_cli_uint8_cache_path(image_folder, tmp_path,
                                             monkeypatch):
    """PATH with a prebuilt uint8 cache takes the vectorized
    load_batch_uint8 read (ADVICE r3); the tail batch is padded by tiling
    its own rows so the dropped rows are exactly the padding even under the
    cache's sorted batch reads — stats must equal the per-image folder run."""
    from content_aware_gan_compression_tpu.data import build_uint8_cache

    tiny = inception_init(jax.random.PRNGKey(7), width_scale=0.25)
    monkeypatch.setattr(
        "content_aware_gan_compression_tpu.models.inception."
        "load_fid_inception", lambda path: tiny)
    build_uint8_cache(str(image_folder), SIZE)

    out = tmp_path / "cache_stats.pkl"
    calc_inception.main([
        "--size", str(SIZE), "--batch", "4", "--n_sample", str(N_IMAGES),
        "--inception_ckpt", str(next(image_folder.iterdir())),
        "--output", str(out), str(image_folder)])
    with open(out, "rb") as f:
        stats = pickle.load(f)

    from PIL import Image
    feats = []
    for f in sorted(f for f in os.listdir(image_folder)
                    if f.endswith(".png")):
        arr = np.asarray(Image.open(image_folder / f), np.float32)
        img = jnp.asarray(arr.transpose(2, 0, 1)[None] / 127.5 - 1.0)
        feats.append(np.asarray(
            inception_pool3(tiny, img, normalize_input=False)))
    feats = np.concatenate(feats, 0).astype(np.float64)
    np.testing.assert_allclose(stats["mean"], feats.mean(0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats["cov"], np.cov(feats, rowvar=False),
                               rtol=1e-4, atol=1e-6)


def test_calc_inception_cli_size_mismatch_errors(image_folder, tmp_path,
                                                 monkeypatch):
    """--size that disagrees with a cache's baked resolution must error
    instead of stamping a wrong size into the pickle (ADVICE r3)."""
    from content_aware_gan_compression_tpu.data import (
        build_uint8_cache, cache_path_for)

    tiny = inception_init(jax.random.PRNGKey(7), width_scale=0.25)
    monkeypatch.setattr(
        "content_aware_gan_compression_tpu.models.inception."
        "load_fid_inception", lambda path: tiny)
    cache = cache_path_for(str(image_folder), SIZE)
    if not os.path.exists(cache):
        build_uint8_cache(str(image_folder), SIZE)

    with pytest.raises(SystemExit, match="baked resolution"):
        calc_inception.main([
            "--size", str(SIZE * 2), "--batch", "4",
            "--inception_ckpt", str(next(image_folder.iterdir())),
            "--output", str(tmp_path / "x.pkl"), cache])


def test_real_stats_regime_stamp_and_check(image_folder, tmp_path):
    """compute_real_stats_from_folder stamps the feature regime; FID
    scoring refuses stats stamped with a DIFFERENT regime (pre-fix pickles,
    which carry no stamp, pass through untouched)."""
    from content_aware_gan_compression_tpu.evaluation.fid import (
        INCEPTION_REGIME, compute_real_stats_from_folder, _check_regime)

    tiny = inception_init(jax.random.PRNGKey(7), width_scale=0.25)
    stats = compute_real_stats_from_folder(
        str(image_folder), tiny, size=SIZE, batch_size=4)
    assert stats["inception_regime"] == INCEPTION_REGIME
    assert stats["size"] == SIZE
    _check_regime(stats)          # own stamp passes
    _check_regime({"mean": 0})    # unstamped (reference-built) passes
    with pytest.raises(ValueError, match="regenerate"):
        _check_regime({"inception_regime": "pre-fix-2x-1-rescale"})

"""Native C++ batch transform vs the PIL/numpy reference path."""

import numpy as np
import pytest
from PIL import Image

from content_aware_gan_compression_tpu.data import native_loader


@pytest.fixture(scope="module")
def lib():
    lib = native_loader.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def pil_reference(img_u8, out_size, flip):
    img = Image.fromarray(img_u8)
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    img = img.resize((out_size, out_size), Image.BILINEAR)
    return np.asarray(img, np.float32).transpose(2, 0, 1) / 127.5 - 1.0


@pytest.mark.parametrize("in_size,out_size", [(64, 32), (32, 32), (48, 64)])
def test_matches_pil_bilinear(lib, in_size, out_size):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (4, in_size, in_size, 3), dtype=np.uint8)
    flips = np.array([0, 1, 0, 1], np.uint8)
    got = native_loader.transform_batch(imgs, out_size, flips)
    assert got.shape == (4, 3, out_size, out_size)
    for i in range(4):
        want = pil_reference(imgs[i], out_size, bool(flips[i]))
        # PIL quantizes the horizontal pass to uint8; allow ~1 LSB in [-1,1]
        np.testing.assert_allclose(got[i], want, atol=2.5 / 127.5)


def test_identity_resize_exact(lib):
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    got = native_loader.transform_batch(imgs, 16, np.zeros(2, np.uint8))
    want = imgs.astype(np.float32).transpose(0, 3, 1, 2) / 127.5 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flip_is_exact_mirror(lib):
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (1, 16, 16, 3), dtype=np.uint8)
    a = native_loader.transform_batch(imgs, 16, np.zeros(1, np.uint8))
    b = native_loader.transform_batch(imgs, 16, np.ones(1, np.uint8))
    np.testing.assert_allclose(a[0], b[0][:, :, ::-1], atol=1e-5)


def test_loader_uses_native_and_shapes_ok(lib, tmp_path):
    from content_aware_gan_compression_tpu.data import FFHQDataset, data_loader

    rng = np.random.RandomState(3)
    for i in range(8):
        Image.fromarray(
            rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
        ).save(tmp_path / f"{i}.png")
    ds = FFHQDataset(str(tmp_path), size=16)
    loader = data_loader(ds, batch_size=4, seed=0)
    batch = next(loader)
    loader.close()
    assert batch.shape == (4, 3, 16, 16)
    assert batch.dtype == np.float32
    assert -1.0 <= batch.min() and batch.max() <= 1.0

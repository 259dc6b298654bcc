"""generate.py CLI end-to-end (reference Miscellaneous/generate.py): drives
the real executable on a synthetic .npz checkpoint and asserts the packed
trunk (--packed, default) produces the identical grid to --no-packed."""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax

from content_aware_gan_compression_tpu.models import (
    GeneratorConfig, generator_init,
)
from content_aware_gan_compression_tpu.utils import save_checkpoint

SIZE = 64
NET_SHAPE = (48, 48, 48, 32, 32, 24, 24, 12, 12, 8)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_generate(ckpt, out_dir, extra):
    argv = ["generate.py", "--ckpt", str(ckpt), "--size", str(SIZE),
            "--latent", "16", "--n_mlp", "1", "--sample", "4",
            "--truncation", "1", "--seed", "7",
            "--out_dir", str(out_dir)] + extra
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "jax.config.update('jax_compilation_cache_dir', "
            "'/root/.cache/jax_test_cache'); "
            f"import sys, runpy; sys.argv = {argv!r}; "
            "runpy.run_path('generate.py', run_name='__main__')")
    proc = subprocess.run([sys.executable, "-c", code], text=True,
                          capture_output=True, timeout=500, cwd=_REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    path = os.path.join(str(out_dir), "000000.png")
    assert os.path.exists(path), os.listdir(str(out_dir))
    return path


def test_generate_cli_packed_matches_unpacked(tmp_path):
    cfg = GeneratorConfig(size=SIZE, style_dim=16, n_mlp=1,
                          net_shape=NET_SHAPE)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "tiny.npz"
    save_checkpoint(str(ckpt), {"g_ema": params})

    # --packed_min_res 64 forces packing at this tiny size (the CLI's
    # default 512 is the fwd-throughput gate and would pack nothing here)
    p_pk = _run_generate(ckpt, tmp_path / "pk",
                         ["--packed", "--packed_min_res", "64"])
    p_un = _run_generate(ckpt, tmp_path / "unpk", ["--no-packed"])

    from PIL import Image

    a = np.asarray(Image.open(p_pk))
    b = np.asarray(Image.open(p_un))
    assert a.shape[-1] == 3 and a.size > 0
    np.testing.assert_array_equal(a, b)

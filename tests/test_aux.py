"""Aux-subsystem tests: FLOPs calculators, log analysis, data loader,
projector, sparsity trainer pieces, TF-var converter."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from content_aware_gan_compression_tpu.models import (
    GeneratorConfig, generator_init, default_net_shape, net_shape_from_params,
)
from content_aware_gan_compression_tpu.utils.calculators import (
    styled_conv_flops, to_rgb_flops, mapping_network_flops,
    style_modulation_flops, stylegan2_flops,
    GENERATOR_FLOPS_256PX, GENERATOR_FLOPS_1024PX,
)


def test_full_size_flops_match_reference_constants():
    """Our calculator on the unpruned net_shape must reproduce the exact
    constants the reference hardcodes (Util/Calculators.py:13-14) — the
    constants there are conv+toRGB+mapping+modulation totals of the default
    architecture."""
    for size, want in ((256, GENERATOR_FLOPS_256PX),
                       (1024, GENERATOR_FLOPS_1024PX)):
        cfg = GeneratorConfig(size=size)
        params = generator_init(jax.random.PRNGKey(0), cfg)
        got = stylegan2_flops(params)
        assert got == want, (size, got, want)


def test_aux_net_flops_calculators():
    """vgg16_lpips_flops must reproduce the published VGG16 conv-trunk MAC
    count at 224px (15.35 GMACs); bisenet_flops must scale ~quadratically
    with resolution (it's all convs)."""
    from content_aware_gan_compression_tpu.utils.calculators import (
        vgg16_lpips_flops, bisenet_flops)

    # conv trunk 15,346,630,656 + five 1x1 heads (published VGG16 number)
    assert abs(vgg16_lpips_flops(224) - 15.35e9) < 0.01e9
    assert 4.2 > bisenet_flops(512) / bisenet_flops(256) > 3.8


def test_pruned_flops_ratio_for_07_prune():
    full = default_net_shape(256)
    pruned = tuple(c - int(0.7 * c) for c in full)
    ratio = (styled_conv_flops(pruned, False)
             / styled_conv_flops(full, False))
    assert 0.05 < ratio < 0.12  # ~9% FLOPs => ~11x (reference README.md:81-88)


def test_log_analysis_roundtrip(tmp_path):
    from content_aware_gan_compression_tpu.utils.analysis import (
        extract_training_log, extract_training_kd_loss, extract_metrics_jsonl)
    from content_aware_gan_compression_tpu.utils.logging import (
        ExperimentLogger)

    logger = ExperimentLogger(str(tmp_path), name="exp")
    logger.log_iteration(0, 1.0, {"d": 0.5, "g": 1.25, "kd_l1_loss": 2.0,
                                  "kd_lpips_loss": 0.75, "r1": 0.1,
                                  "path": 0.2, "mean_path_avg": 0.3})
    logger.log_fid(12.34)
    logger.write("FLOPs %: 9.11\n")
    logger.close()

    flops, fids = extract_training_log(logger.exp_dir)
    assert fids == [12.34] and flops == [9.11]
    l1s, lpipss = extract_training_kd_loss(logger.exp_dir)
    assert l1s == [2.0] and lpipss == [0.75]
    assert extract_metrics_jsonl(logger.exp_dir, "fid") == [12.34]


def test_data_loader_shapes_and_normalization(tmp_path):
    from PIL import Image

    from content_aware_gan_compression_tpu.data import (
        FFHQDataset, data_loader)

    for i in range(10):
        arr = (np.random.RandomState(i).rand(12, 12, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.png")
    ds = FFHQDataset(str(tmp_path), size=8)
    assert len(ds) == 10
    loader = data_loader(ds, batch_size=4, seed=0)
    batch = next(loader)
    loader.close()
    assert batch.shape == (4, 3, 8, 8)
    assert batch.min() >= -1.0 and batch.max() <= 1.0


def test_uint8_cache_dataset_matches_decode_path(tmp_path):
    """build_uint8_cache + Uint8CacheDataset must be byte-identical to the
    decode-per-read uint8 wire (no flip), open_dataset must auto-prefer the
    cache, and the loader's batch fast path must deliver [B,H,W,3] uint8."""
    from PIL import Image

    from content_aware_gan_compression_tpu.data import (
        FFHQDataset, Uint8CacheDataset, build_uint8_cache, cache_path_for,
        data_loader, open_dataset)

    for i in range(10):
        arr = (np.random.RandomState(i).rand(12, 12, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.png")

    cache = build_uint8_cache(str(tmp_path), 8)
    assert cache == cache_path_for(str(tmp_path), 8)

    plain = FFHQDataset(str(tmp_path), size=8, random_flip=False)
    cached = Uint8CacheDataset(cache, random_flip=False)
    assert len(cached) == len(plain) == 10
    rng = np.random.default_rng(0)
    for i in range(10):
        np.testing.assert_array_equal(cached.load_uint8(i, rng),
                                      plain.load_uint8(i, rng))

    ds = open_dataset(str(tmp_path), 8)
    assert isinstance(ds, Uint8CacheDataset)  # cache auto-preferred
    assert isinstance(open_dataset(str(tmp_path), 9), FFHQDataset)

    loader = data_loader(ds, batch_size=4, seed=0, uint8_hwc=True)
    batch = next(loader)
    loader.close()
    assert batch.shape == (4, 8, 8, 3) and batch.dtype == np.uint8

    # float path parity too (the reference train-transform semantics)
    f_cache = cached.load(3, np.random.default_rng(1))
    f_plain = plain.load(3, np.random.default_rng(1))
    np.testing.assert_allclose(f_cache, f_plain)


def test_projector_reduces_loss():
    from content_aware_gan_compression_tpu.projector import image_projector

    cfg = GeneratorConfig(size=16, style_dim=16, n_mlp=1,
                          net_shape=(8, 8, 8, 8, 6, 6))
    params = generator_init(jax.random.PRNGKey(0), cfg)
    # target = an actual model sample => projectable
    from content_aware_gan_compression_tpu.models import generator_apply
    target = generator_apply(
        params, cfg, [jax.random.normal(jax.random.PRNGKey(1), (1, 16))],
        rng=jax.random.PRNGKey(2))
    out, latent, noises, losses = image_projector(
        params, cfg, target, opt="Adam", num_iters=30, optimize_noise=True,
        rng=jax.random.PRNGKey(3))
    assert latent.shape == (1, cfg.n_latent, 16)
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])


def test_projector_lbfgs_runs():
    from content_aware_gan_compression_tpu.projector import image_projector

    cfg = GeneratorConfig(size=16, style_dim=16, n_mlp=1,
                          net_shape=(8, 8, 8, 8, 6, 6))
    params = generator_init(jax.random.PRNGKey(0), cfg)
    target = jnp.zeros((1, 3, 16, 16))
    out, latent, _, losses = image_projector(
        params, cfg, target, opt="LBFGS", num_iters=10, optimize_noise=False,
        rng=jax.random.PRNGKey(3))
    assert np.isfinite(losses).all()
    assert losses[-1] <= losses[0]


def test_sparse_loss_and_global_mask():
    from content_aware_gan_compression_tpu.train.sparsity import (
        l1_style_sparse_loss, get_network_prune_mask)

    styles = [jnp.ones((4, 8)), 2 * jnp.ones((4, 6))]
    loss = float(l1_style_sparse_loss(styles, eta=0.1))
    np.testing.assert_allclose(loss, 0.1 * (8 + 12), rtol=1e-6)

    scores = [np.array([0.1, 0.9, 0.8]), np.array([0.05, 0.7])]
    masks = get_network_prune_mask(
        scores, [3, 2], pruning_mode="Global_Number", lay_rmve_ratio=0.0,
        num_rmve_channel=2)
    # reference semantics (train_sparsity.py:417-419): threshold is the
    # (num_rmve)-th smallest score and channels must be strictly ABOVE it,
    # so the tied 0.7 is dropped too.
    np.testing.assert_array_equal(masks[0], [False, True, True])
    np.testing.assert_array_equal(masks[1], [False, False])


def test_tf_var_converter_roundtrip():
    """Build fake TF-style vars with the official naming, convert, and check
    the tree loads into a working generator with the right widths."""
    from convert_weight import generator_tree_from_tf_vars

    size, style_dim, n_mlp = 16, 512, 8
    ch = {4: 512, 8: 512, 16: 512}
    rng = np.random.RandomState(0)
    vars = {}
    for i in range(n_mlp):
        vars[f"G_mapping/Dense{i}/weight"] = rng.randn(512, 512).astype("f")
        vars[f"G_mapping/Dense{i}/bias"] = rng.randn(512).astype("f")
    vars["G_synthesis/4x4/Const/const"] = rng.randn(1, 512, 4, 4).astype("f")

    def conv_vars(name, cin, cout, k):
        vars[f"{name}/weight"] = rng.randn(k, k, cin, cout).astype("f")
        vars[f"{name}/mod_weight"] = rng.randn(style_dim, cin).astype("f")
        vars[f"{name}/mod_bias"] = rng.randn(cin).astype("f")
        vars[f"{name}/noise_strength"] = np.float32(0.1)
        vars[f"{name}/bias"] = rng.randn(cout).astype("f")

    def torgb_vars(name, cin):
        vars[f"{name}/weight"] = rng.randn(1, 1, cin, 3).astype("f")
        vars[f"{name}/mod_weight"] = rng.randn(style_dim, cin).astype("f")
        vars[f"{name}/mod_bias"] = rng.randn(cin).astype("f")
        vars[f"{name}/bias"] = rng.randn(3).astype("f")

    conv_vars("G_synthesis/4x4/Conv", 512, 512, 3)
    torgb_vars("G_synthesis/4x4/ToRGB", 512)
    for reso in (8, 16):
        conv_vars(f"G_synthesis/{reso}x{reso}/Conv0_up", 512, 512, 3)
        conv_vars(f"G_synthesis/{reso}x{reso}/Conv1", 512, 512, 3)
        torgb_vars(f"G_synthesis/{reso}x{reso}/ToRGB", 512)
    for i in range(5):
        res = 2 ** ((i + 5) // 2)
        vars[f"G_synthesis/noise{i}"] = rng.randn(1, 1, res, res).astype("f")

    tree = generator_tree_from_tf_vars(vars, size, n_mlp=n_mlp)
    assert net_shape_from_params(tree) == (512,) * 6
    from content_aware_gan_compression_tpu.models import generator_apply
    cfg = GeneratorConfig(size=size, style_dim=512, n_mlp=8,
                          net_shape=(512,) * 6)
    img = generator_apply(tree, cfg, [jnp.asarray(rng.randn(1, 512), jnp.float32)],
                          randomize_noise=False)
    assert img.shape == (1, 3, 16, 16)
    assert np.isfinite(np.asarray(img)).all()


def test_cli_str2bool_accepts_false():
    """`--content_aware_KD False` must parse to False (the reference's
    type=bool declaration parses every non-empty string truthy — a
    deliberately-fixed footgun, docs/PARITY.md)."""
    import argparse
    import sys

    sys.path.insert(0, "/root/repo")
    from train import str2bool

    assert str2bool("False") is False
    assert str2bool("false") is False
    assert str2bool("0") is False
    assert str2bool("True") is True
    assert str2bool("1") is True
    import pytest as _pytest
    with _pytest.raises(argparse.ArgumentTypeError):
        str2bool("maybe")


def test_enable_compilation_cache_respects_existing_config(tmp_path):
    """Every CLI calls enable_compilation_cache() before jax work; it must
    (a) set a cache dir when none is configured and (b) never override a
    user-configured one (utils/runtime.py)."""
    from content_aware_gan_compression_tpu.utils import (
        enable_compilation_cache)

    prev = jax.config.jax_compilation_cache_dir
    try:
        # (b) pre-configured (conftest sets the test cache): no-op
        enable_compilation_cache(str(tmp_path / "ignored"))
        assert jax.config.jax_compilation_cache_dir == prev
        # (a) unset: picks the given path and creates it
        jax.config.update("jax_compilation_cache_dir", None)
        target = tmp_path / "cache"
        enable_compilation_cache(str(target))
        assert jax.config.jax_compilation_cache_dir == str(target)
        assert target.is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_trace_op_time_json_fallback(tmp_path, capsys):
    """tools/trace_op_time.py must read the chrome JSON trace directly when
    the xprof hlo_stats converter is unavailable (the shipped converter
    can't parse the axon relay's xplane), attribute device time to source
    lines, and exclude container events (while/conditional bodies) so the
    per-category times sum to device-busy, not 4x it."""
    import gzip
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "trace_op_time",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "trace_op_time.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        # container: must be EXCLUDED from totals
        {"ph": "X", "pid": 3, "tid": 1, "ts": 0, "dur": 1000,
         "name": "while.1", "args": {"hlo_category": "while"}},
        {"ph": "X", "pid": 3, "tid": 1, "ts": 0, "dur": 600,
         "name": "fusion.1",
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "1200000", "bytes_accessed": "3000",
                  "source": "/root/repo/content_aware_gan_compression_tpu/"
                            "ops/packed.py:223"}},
        {"ph": "X", "pid": 3, "tid": 1, "ts": 600, "dur": 400,
         "name": "copy.2",
         "args": {"hlo_category": "data formatting",
                  "bytes_accessed": "8000",
                  "source": "/root/repo/content_aware_gan_compression_tpu/"
                            "models/stylegan2.py:341"}},
        # host event: excluded (wrong pid)
        {"ph": "X", "pid": 9, "tid": 1, "ts": 0, "dur": 999,
         "name": "hostloop", "args": {"hlo_category": "convolution fusion"}},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    ev = mod.load_json_events(str(tmp_path))
    assert {e["name"] for e in ev} == {"fusion.1", "copy.2"}

    mod.report_json(str(tmp_path), top_n=5, iters=2)
    out = capsys.readouterr().out
    # busy = 600 + 400 us = 1.0 ms (container and host excluded)
    assert "device busy: 1.0 ms" in out
    assert "= 0.5 ms/iter" in out         # 1.0 ms over --iters 2
    assert "0.30 ms/it" in out            # fusion.1's 600 us / 2 iters
    assert "ops/packed.py:223" in out     # source attribution, shortened
    assert "convolution fusion" in out
    # achieved rate: 1.2 MFLOP / 600 us = 2.0 GFLOP/s = 0.0 TF/s -> printed
    assert "data formatting" in out


def test_trace_multi_file_merge_and_bench_flops(tmp_path, capsys):
    """Advisor r4: load_json_events must merge ALL *.trace.json.gz under the
    dir (not just paths[0]) and report the excluded container duration; and
    bench._trace_flops_per_iter must sum model_flops over the merged events
    per iteration with a clean stdout (the ONE-json-line contract)."""
    import gzip
    import importlib.util
    import io
    import contextlib
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "trace_op_time",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "trace_op_time.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    meta = {"ph": "M", "pid": 3, "name": "process_name",
            "args": {"name": "/device:TPU:0"}}

    def write(sub, events):
        d = tmp_path / "plugins" / "profile" / sub
        d.mkdir(parents=True)
        with gzip.open(d / "vm.trace.json.gz", "wt") as f:
            json.dump({"traceEvents": [meta] + events}, f)

    write("a", [
        {"ph": "X", "pid": 3, "tid": 1, "ts": 0, "dur": 100,
         "name": "while.1", "args": {"hlo_category": "while"}},
        {"ph": "X", "pid": 3, "tid": 1, "ts": 0, "dur": 60,
         "name": "fusion.1",
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "1000000"}},
    ])
    write("b", [
        {"ph": "X", "pid": 3, "tid": 1, "ts": 0, "dur": 40,
         "name": "fusion.2",
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "3000000"}},
    ])

    ev = mod.load_json_events(str(tmp_path))
    assert {e["name"] for e in ev} == {"fusion.1", "fusion.2"}
    out = capsys.readouterr().out
    assert "merging 2 trace files" in out
    assert "excluded container" in out and "while: 0.1 ms" in out

    spec_b = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec_b)
    spec_b.loader.exec_module(bench)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fl = bench._trace_flops_per_iter(str(tmp_path), 2)
    assert fl == (1000000 + 3000000) / 2
    assert buf.getvalue() == ""   # nothing may leak onto bench's stdout

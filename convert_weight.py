#!/usr/bin/env python
"""Official TF-StyleGAN2 weight converter (reference
Miscellaneous/convert_weight.py): maps the TF variable names/layouts into
this framework's param schema, then runs a fixed-seed numerical parity check
and saves a side-by-side comparison grid.

The reference evaluates live TF graphs (needs dnnlib + TF1); this converter
instead consumes a *numpy dict* of the TF variables — produce one with the
official repo via:

    import pickle, numpy as np, dnnlib, dnnlib.tflib as tflib
    tflib.init_tf()
    g, d, g_ema = pickle.load(open('stylegan2-ffhq-config-f.pkl', 'rb'))
    np.savez('ffhq_vars.npz', **{k: v.eval() for k, v in g_ema.vars.items()})

(and analogously for g/d). The name mapping and tensor transposes below are
identical to the reference's convert_modconv/convert_torgb/convert_dense/
convert_conv (convert_weight.py:14-92); the parity check compares against a
reference image tensor dumped from TF (--tf_output) instead of running TF.
"""

import argparse
import math
import os

import numpy as np


def convert_modconv(vars, source, flip=False):
    """TF conv vars -> StyledConv subtree (reference convert_weight.py:14-39)."""
    weight = np.asarray(vars[source + "/weight"])
    out = {
        "conv": {
            "weight": np.expand_dims(weight.transpose(3, 2, 0, 1), 0),
            "modulation": {
                "weight": np.asarray(vars[source + "/mod_weight"]).transpose(1, 0),
                "bias": np.asarray(vars[source + "/mod_bias"]) + 1,
            },
        },
        "noise": {"weight": np.array(
            [np.asarray(vars[source + "/noise_strength"])]).reshape(1)},
        "activate": {"bias": np.asarray(vars[source + "/bias"])},
    }
    if flip:
        out["conv"]["weight"] = out["conv"]["weight"][:, :, :, ::-1, ::-1].copy()
    return out


def convert_torgb(vars, source):
    """TF ToRGB vars -> ToRGB subtree (reference convert_weight.py:60-79)."""
    weight = np.asarray(vars[source + "/weight"])
    return {
        "conv": {
            "weight": np.expand_dims(weight.transpose(3, 2, 0, 1), 0),
            "modulation": {
                "weight": np.asarray(vars[source + "/mod_weight"]).transpose(1, 0),
                "bias": np.asarray(vars[source + "/mod_bias"]) + 1,
            },
        },
        "bias": np.asarray(vars[source + "/bias"]).reshape(1, 3, 1, 1),
    }


def convert_dense(vars, source):
    return {"weight": np.asarray(vars[source + "/weight"]).transpose(1, 0),
            "bias": np.asarray(vars[source + "/bias"])}


def convert_conv(vars, source, bias=True, start=0):
    out = {str(start): {"weight": np.asarray(
        vars[source + "/weight"]).transpose(3, 2, 0, 1)}}
    if bias:
        out[str(start + 1)] = {"bias": np.asarray(vars[source + "/bias"])}
    return out


def generator_tree_from_tf_vars(vars, size, n_mlp=8):
    """Full generator pytree (reference fill_statedict,
    convert_weight.py:141-200)."""
    log_size = int(math.log2(size))
    tree = {"style": {}, "convs": {}, "to_rgbs": {}, "noises": {}}
    for i in range(n_mlp):
        tree["style"][str(i + 1)] = convert_dense(vars, f"G_mapping/Dense{i}")
    tree["input"] = {"input": np.asarray(vars["G_synthesis/4x4/Const/const"])}
    tree["to_rgb1"] = convert_torgb(vars, "G_synthesis/4x4/ToRGB")
    tree["conv1"] = convert_modconv(vars, "G_synthesis/4x4/Conv")
    for i in range(log_size - 2):
        reso = 4 * 2 ** (i + 1)
        tree["to_rgbs"][str(i)] = convert_torgb(
            vars, f"G_synthesis/{reso}x{reso}/ToRGB")
        tree["convs"][str(2 * i)] = convert_modconv(
            vars, f"G_synthesis/{reso}x{reso}/Conv0_up", flip=True)
        tree["convs"][str(2 * i + 1)] = convert_modconv(
            vars, f"G_synthesis/{reso}x{reso}/Conv1")
    for i in range((log_size - 2) * 2 + 1):
        tree["noises"][f"noise_{i}"] = np.asarray(vars[f"G_synthesis/noise{i}"])
    return tree


def discriminator_tree_from_tf_vars(vars, size):
    """Discriminator pytree (reference discriminator_fill_statedict,
    convert_weight.py:109-138)."""
    log_size = int(math.log2(size))
    tree = {"convs": {"0": convert_conv(vars, f"{size}x{size}/FromRGB")}}
    conv_i = 1
    for i in range(log_size - 2, 0, -1):
        reso = 4 * 2 ** i
        tree["convs"][str(conv_i)] = {
            "conv1": convert_conv(vars, f"{reso}x{reso}/Conv0"),
            "conv2": convert_conv(vars, f"{reso}x{reso}/Conv1_down", start=1),
            "skip": convert_conv(vars, f"{reso}x{reso}/Skip", start=1,
                                 bias=False),
        }
        conv_i += 1
    tree["final_conv"] = convert_conv(vars, "4x4/Conv")
    tree["final_linear"] = {"0": convert_dense(vars, "4x4/Dense0"),
                            "1": convert_dense(vars, "Output")}
    return tree


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gen", action="store_true",
                        help="also convert the training generator vars "
                             "(expects <path> with _g suffix convention)")
    parser.add_argument("--disc", action="store_true")
    parser.add_argument("--channel_multiplier", type=int, default=2)
    parser.add_argument("--size", type=int, default=None,
                        help="inferred from noise buffer shapes if omitted")
    parser.add_argument("--tf_output", type=str, default=None,
                        help=".npy of the TF model's images on seed-0 z for "
                             "the numerical parity check")
    parser.add_argument("path", metavar="PATH",
                        help=".npz of g_ema TF vars (see module docstring)")
    args = parser.parse_args()
    from content_aware_gan_compression_tpu.utils import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from content_aware_gan_compression_tpu.models import generator_apply
    from content_aware_gan_compression_tpu.utils import (
        save_checkpoint, build_generator_from_pytree)
    from content_aware_gan_compression_tpu.utils.checkpoint import (
        torch_state_dict_to_pytree)
    from content_aware_gan_compression_tpu.utils.logging import (
        save_image_grid)

    vars = dict(np.load(args.path))
    # infer size from the largest noise buffer
    noise_keys = [k for k in vars if k.startswith("G_synthesis/noise")]
    size = args.size or int(vars[max(
        noise_keys, key=lambda k: int(k.rsplit("noise", 1)[1]))].shape[-1])

    tree = generator_tree_from_tf_vars(vars, size)
    tree = torch_state_dict_to_pytree(  # normalize leaves to jnp via roundtrip
        {k: v for k, v in _flatten(tree).items()})
    ckpt = {"g_ema": tree}
    if "dlatent_avg" in vars:
        ckpt["latent_avg"] = {"latent_avg": np.asarray(vars["dlatent_avg"])}

    name = os.path.splitext(os.path.basename(args.path))[0]
    out_path = name + ".npz"

    if args.gen:
        g_vars_path = args.path.replace(".npz", "_g.npz")
        if os.path.exists(g_vars_path):
            ckpt["g"] = torch_state_dict_to_pytree(_flatten(
                generator_tree_from_tf_vars(dict(np.load(g_vars_path)), size)))
    if args.disc:
        d_vars_path = args.path.replace(".npz", "_d.npz")
        if os.path.exists(d_vars_path):
            ckpt["d"] = torch_state_dict_to_pytree(_flatten(
                discriminator_tree_from_tf_vars(dict(np.load(d_vars_path)), size)))

    save_checkpoint(out_path, ckpt, metadata={"size": size})
    print(f"saved {out_path}")

    # fixed-seed parity check (reference convert_weight.py:249-275)
    params, config = build_generator_from_pytree(tree, size=size)
    batch = {256: 16, 512: 9, 1024: 4}.get(size, 25)
    z = np.random.RandomState(0).randn(batch, 512).astype("float32")
    trunc_latent = (jnp.asarray(vars["dlatent_avg"])[None]
                    if "dlatent_avg" in vars else None)
    img = generator_apply(
        params, config, [jnp.asarray(z)],
        truncation=0.5 if trunc_latent is not None else 1,
        truncation_latent=trunc_latent, randomize_noise=False)
    if args.tf_output and os.path.exists(args.tf_output):
        img_tf = np.load(args.tf_output)
        diff = (np.clip((np.asarray(img) + 1) / 2, 0, 1)
                - np.clip((img_tf + 1) / 2, 0, 1))
        print(f"parity vs TF: max|diff| {np.abs(diff).max():.5f}, "
              f"mean|diff| {np.abs(diff).mean():.6f}")
        grid = np.concatenate([img_tf, np.asarray(img), diff], axis=0)
        save_image_grid(grid, name + ".png", nrow=batch)
    else:
        save_image_grid(np.asarray(img), name + ".png", nrow=batch)
    print(f"saved {name}.png")


def _flatten(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = v
    return flat


if __name__ == "__main__":
    main()

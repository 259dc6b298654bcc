"""Training-log analysis + channel visualization (reference
Util/analysis_util.py). Works on both the reference-format text log (which
our trainer also writes) and the structured metrics.jsonl."""

from __future__ import annotations

import json
import os

import numpy as np


def _find_log(exp_dir: str) -> str:
    for f in os.listdir(exp_dir):
        if f.endswith(".out"):
            return os.path.join(exp_dir, f)
    raise FileNotFoundError(f"no .out log in {exp_dir}")


def extract_training_log(exp_dir: str):
    """(FLOPs%, FID) lists from a text log (reference analysis_util.py:90-118)."""
    flops_list, fid_list = [], []
    for line in open(_find_log(exp_dir)):
        if "FLOPs %:" in line:
            flops_list.append(float(line.split("FLOPs %:")[1]))
        elif "Evaluated FID:" in line:
            fid_list.append(float(line.split("Evaluated FID:")[1]))
    return flops_list, fid_list


def extract_training_kd_loss(exp_dir: str):
    """(KD-L1, KD-LPIPS) series (reference analysis_util.py:119-149)."""
    l1s, lpipss = [], []
    for line in open(_find_log(exp_dir)):
        if "Iter #" in line:
            i0 = line.find("KD_L1_Loss:")
            i1 = line.find("KD_LPIPS_Loss:")
            i2 = line.find("D_Reg:")
            l1s.append(float(line[i0 + len("KD_L1_Loss:"):i1]))
            lpipss.append(float(line[i1 + len("KD_LPIPS_Loss:"):i2]))
    return l1s, lpipss


def extract_metrics_jsonl(exp_dir: str, key: str):
    """Series of `key` from metrics.jsonl (the structured twin of the log)."""
    path = os.path.join(exp_dir, "metrics.jsonl")
    out = []
    for line in open(path):
        rec = json.loads(line)
        if key in rec:
            out.append(rec[key])
    return out


def channel_activation_image(params, config, z, layer_id, *, rng, n_col=8):
    """Grid image of one layer's per-channel activations (the analogue of
    reference analysis_util.py:8-89's channel visualization). Returns a
    [H_grid, W_grid] float array normalized per channel."""
    import jax

    from ..models.stylegan2 import generator_feature_maps

    outs = generator_feature_maps(params, config, z, rng=rng)
    fmap = np.asarray(outs[layer_id])[0]  # [C, H, W]
    c, h, w = fmap.shape
    n_row = (c + n_col - 1) // n_col
    grid = np.zeros((n_row * h, n_col * w), np.float32)
    for i in range(c):
        ch = fmap[i]
        lo, hi = ch.min(), ch.max()
        ch = (ch - lo) / (hi - lo + 1e-8)
        r, col = divmod(i, n_col)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = ch
    return grid

"""Checkpoint surgery: slice a generator param pytree down to a pruned one.

The JAX-native analogue of Mask_the_Generator (reference Util/mask_util.py:
11-48): a pure pytree -> pytree transform. Because our param tree mirrors the
torch key paths, the slicing rules are one-to-one with the reference:

  * input.input             [1, C, 4, 4]      -> channel dim by mask[0]
  * conv_i.conv.weight      [1, out, in, k, k]-> out by mask[i+1], in by mask[i]
  * conv_i.conv.modulation  [in, style]/[in]  -> rows by mask[i]
  * conv_i.activate.bias    [out]             -> by mask[i+1]
  * to_rgb_j (j-th RGB head, fed by layer 2j+1):
      conv.weight [1, 3, in, 1, 1] -> in by mask[2j+1]; modulation by mask[2j+1]
"""

from __future__ import annotations

import numpy as np

from ..models.stylegan2 import Params


def _conv_entries(params: Params):
    """[(styled conv dict, index)] in feed-forward order: conv1, convs.0, ..."""
    out = [params["conv1"]]
    for i in range(len(params["convs"])):
        out.append(params["convs"][str(i)])
    return out


def _to_rgb_entries(params: Params):
    out = [params["to_rgb1"]]
    for i in range(len(params["to_rgbs"])):
        out.append(params["to_rgbs"][str(i)])
    return out


def mask_the_generator(params: Params, net_mask_list) -> Params:
    """Produce the pruned generator pytree.

    Args:
      params: generator param pytree (reference-schema keys).
      net_mask_list: list of per-layer boolean keep-masks, len == n_convs + 1
        (mask[0] = conv1 input / constant input channels, mask[i+1] = conv_i
        output channels).
    """
    masks = [np.asarray(m, dtype=bool) for m in net_mask_list]
    convs = _conv_entries(params)
    if len(masks) != len(convs) + 1:
        raise ValueError(
            f"need {len(convs) + 1} masks (n_convs+1), got {len(masks)}")

    out = _copy_tree(params)

    # constant input
    out["input"]["input"] = np.asarray(params["input"]["input"])[:, masks[0]]

    # styled convs
    out_convs = _conv_entries(out)
    for i, (src, dst) in enumerate(zip(convs, out_convs)):
        in_m, out_m = masks[i], masks[i + 1]
        w = np.asarray(src["conv"]["weight"])          # [1, out, in, k, k]
        dst["conv"]["weight"] = w[:, out_m][:, :, in_m]
        dst["conv"]["modulation"]["weight"] = np.asarray(
            src["conv"]["modulation"]["weight"])[in_m]
        dst["conv"]["modulation"]["bias"] = np.asarray(
            src["conv"]["modulation"]["bias"])[in_m]
        dst["noise"]["weight"] = np.asarray(src["noise"]["weight"])
        dst["activate"]["bias"] = np.asarray(src["activate"]["bias"])[out_m]

    # RGB heads — head j reads the output of layer 2j+1
    rgbs = _to_rgb_entries(params)
    out_rgbs = _to_rgb_entries(out)
    for j, (src, dst) in enumerate(zip(rgbs, out_rgbs)):
        m = masks[2 * j + 1]
        w = np.asarray(src["conv"]["weight"])          # [1, 3, in, 1, 1]
        dst["conv"]["weight"] = w[:, :, m]
        dst["conv"]["modulation"]["weight"] = np.asarray(
            src["conv"]["modulation"]["weight"])[m]
        dst["conv"]["modulation"]["bias"] = np.asarray(
            src["conv"]["modulation"]["bias"])[m]

    return out


def _copy_tree(tree):
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return tree

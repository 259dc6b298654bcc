"""Channel-importance metrics (reference Util/pruning_metrics.py).

All metrics take NCHW activation stacks or OIHW effective kernels (the
layouts the reference's formulas are defined over) and return one score per
channel. They are plain jnp expressions — jit/vmap-able and runnable on
device, unlike the reference's host-side numpy loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def asv_score(fea_maps):
    """Across-sample std, averaged spatially. fea_maps: [N, C, H, W] -> [C]
    (reference Util/pruning_metrics.py:3-13)."""
    std_map = jnp.std(fea_maps, axis=0)
    return jnp.mean(std_map, axis=(1, 2))


def map_l1_norm(fea_maps):
    """Mean |activation| per channel (reference pruning_metrics.py:15-24)."""
    return jnp.mean(jnp.abs(fea_maps), axis=(0, 2, 3))


def map_l2_norm(fea_maps):
    """Root sum of squares per channel (reference pruning_metrics.py:26-35)."""
    return jnp.sqrt(jnp.sum(jnp.square(fea_maps), axis=(0, 2, 3)))


def l1_normalized_asv(fea_maps):
    """ASV / mean-|x| (reference pruning_metrics.py:38-49)."""
    return asv_score(fea_maps) / map_l1_norm(fea_maps)


def l2_normalized_asv(fea_maps):
    """ASV / l2-norm (reference pruning_metrics.py:52-63)."""
    return asv_score(fea_maps) / map_l2_norm(fea_maps)


def outgoing_l1_norm(filter_4d):
    """L1 norm of each INPUT channel's outgoing kernels. filter: [O, I, H, W]
    -> [I] (reference pruning_metrics.py:66-78)."""
    return jnp.sum(jnp.abs(filter_4d), axis=(0, 2, 3))


def incoming_l1_norm(filter_4d):
    """L1 norm of each OUTPUT channel's incoming kernels. filter: [O, I, H, W]
    -> [O] (reference pruning_metrics.py:81-93)."""
    return jnp.sum(jnp.abs(filter_4d), axis=(1, 2, 3))

"""Channel pruning: scoring metrics, schedulers, pytree mask surgery, and the
paper's content-aware gradient metric (reference Util/pruning_metrics.py,
Util/pruning_util.py, Util/mask_util.py, Util/content_aware_pruning.py)."""

from .metrics import (
    asv_score,
    map_l1_norm,
    map_l2_norm,
    l1_normalized_asv,
    l2_normalized_asv,
    outgoing_l1_norm,
    incoming_l1_norm,
)
from .schedule import (
    get_network_score_list,
    generate_prune_mask_list,
    get_uniform_remove_list,
    METRIC_LIST,
)
from .mask import mask_the_generator
from .content_aware import (
    get_content_aware_pruning_score,
    salt_pepper_noisy_images,
    get_masked_tensor,
    batch_img_parsing,
    coi_mask_from_parsing,
)

__all__ = [
    "asv_score", "map_l1_norm", "map_l2_norm", "l1_normalized_asv",
    "l2_normalized_asv", "outgoing_l1_norm", "incoming_l1_norm",
    "get_network_score_list", "generate_prune_mask_list",
    "get_uniform_remove_list", "METRIC_LIST",
    "mask_the_generator",
    "get_content_aware_pruning_score", "salt_pepper_noisy_images",
    "get_masked_tensor", "batch_img_parsing", "coi_mask_from_parsing",
]

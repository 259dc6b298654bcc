"""Evaluators: FID (reference Evaluation/fid.py) and PPL (Evaluation/ppl.py)."""

from .fid import (
    extract_feature_from_samples,
    calc_fid,
    get_model_fid_score,
    compute_real_stats_from_folder,
    OverlappedFIDEval,
)
from .ppl import get_ppl_score, lerp, slerp

__all__ = [
    "extract_feature_from_samples",
    "calc_fid",
    "get_model_fid_score",
    "compute_real_stats_from_folder",
    "OverlappedFIDEval",
    "get_ppl_score",
    "lerp",
    "slerp",
]

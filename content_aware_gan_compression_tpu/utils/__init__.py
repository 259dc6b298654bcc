"""Utilities: checkpoint import/export (torch <-> pytree), FLOPs accounting,
experiment config and structured logging."""

from .runtime import enable_compilation_cache
from .checkpoint import (
    torch_state_dict_to_pytree,
    pytree_to_torch_state_dict,
    load_torch_checkpoint,
    save_checkpoint,
    load_checkpoint,
    build_generator_from_pytree,
)

__all__ = [
    "enable_compilation_cache",
    "torch_state_dict_to_pytree",
    "pytree_to_torch_state_dict",
    "load_torch_checkpoint",
    "save_checkpoint",
    "load_checkpoint",
    "build_generator_from_pytree",
]

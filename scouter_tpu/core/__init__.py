"""Core: configuration, PRNG/mesh plumbing, checkpoint I/O."""

from .cache import setup_compilation_cache
from .config import (
    ScouterConfig,
    checkpoint_name,
    config_from_args,
    expand_sweep,
    get_args_parser,
)

__all__ = [
    "ScouterConfig",
    "checkpoint_name",
    "config_from_args",
    "expand_sweep",
    "get_args_parser",
    "setup_compilation_cache",
]

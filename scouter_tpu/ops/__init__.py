"""Numeric contracts of SCOUTER as pure JAX ops (+ Pallas TPU kernels)."""

from .gru import GRUParams, gru_cell, init_gru_params
from .losses import log_softmax_nll, scouter_loss
from .position import sine_position_embedding
from .slot_attention import (
    XSlotConfig,
    class_attention_maps,
    init_xslot_params,
    xslot_attention,
)

__all__ = [
    "GRUParams",
    "gru_cell",
    "init_gru_params",
    "log_softmax_nll",
    "scouter_loss",
    "sine_position_embedding",
    "XSlotConfig",
    "class_attention_maps",
    "init_xslot_params",
    "xslot_attention",
]

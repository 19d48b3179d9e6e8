"""Backbone zoo + SCOUTER SlotModel (Flax, NHWC)."""

from . import densenet, dla, dpn, hrnet, efficientnet, gluon_xception, inception_resnet_v2, inception_v3, inception_v4, nasnet, pnasnet, regnet, selecsls, senet, tresnet, vovnet, xception, zoo  # noqa: F401  (registers the entrypoints)
from .convert import (
    merge_variables,
    prepare_pretrained_state_dict,
    strip_prefix,
    torch_state_dict_to_variables,
)
from .registry import create_model, is_model, list_models, model_entrypoint, register_model
from .resnet import ResNet
from .slot_model import SlotModel, XSlot

__all__ = [
    "ResNet",
    "SlotModel",
    "XSlot",
    "auto_fused_slot",
    "build_slot_model",
    "create_model",
    "is_model",
    "list_models",
    "merge_variables",
    "model_entrypoint",
    "prepare_pretrained_state_dict",
    "register_model",
    "strip_prefix",
    "torch_state_dict_to_variables",
]


def auto_fused_slot(cfg, train: bool, batch_size=None) -> bool:
    """Serving-path slot-kernel selection hook.

    DECISION (2026-08-17, round 3): returns False for every config — the
    fused Pallas kernel stays OPT-IN. Round 2's op-level measurement showed a
    -23% win at S=1000/B=16 in isolation, but the round-3 END-TO-END serving
    measurement (``python bench.py --serving``, resnest50d + xSlot S=1000,
    260px, bf16) shows whole-model latency is NOT improved: bs=1 is 21%
    SLOWER fused (1.98 vs 1.64 ms) and bs=16 ties (3.87 vs 3.84 ms) — in
    context XLA fuses the jnp slot ops with their producers/consumers, which
    the Pallas call boundary prevents. The kernel remains available via
    ``build_slot_model(cfg, fused_slot=True)`` and stays parity-tested
    (tests/test_slot_pallas.py, ``bench.py --slot-kernel``); revisit only
    with an end-to-end measurement of a new config.
    """
    del cfg, train, batch_size
    return False


def build_slot_model(cfg, fused_slot: bool = False, interpret: bool = False,
                     dtype=None, backbone_kwargs=None) -> SlotModel:
    """Build the SlotModel from a ScouterConfig (load_backbone + SlotModel parity,
    ``sloter/slot_model.py:18-77``).

    - MNIST swaps the stem conv for Conv(1->64, 3x3, s2, p1) (:23-24)
    - slot mode consumes backbone features (head neutralization :35-51)
    - no-slot mode uses the backbone's own ``num_classes`` classifier head
    """
    mnist = cfg.dataset == "MNIST"
    backbone = create_model(
        cfg.model,
        num_classes=cfg.num_classes,
        in_chans=1 if mnist else 3,
        mnist_stem=mnist,
        dtype=dtype,
        **(backbone_kwargs or {}),
    )
    slot_dtype = None
    if getattr(cfg, "slot_head_dtype", "float32") == "float32" and dtype is not None:
        import jax.numpy as jnp

        slot_dtype = jnp.float32
    return SlotModel(
        backbone=backbone,
        use_slot=cfg.use_slot,
        num_classes=cfg.num_classes,
        hidden_dim=cfg.hidden_dim,
        slots_per_class=cfg.slots_per_class,
        loss_status=float(cfg.loss_status),
        power=float(cfg.power),
        to_k_layer=cfg.to_k_layer,
        lambda_value=float(cfg.lambda_value),
        fused_slot=fused_slot,
        interpret=interpret,
        dtype=dtype,
        slot_dtype=slot_dtype,
    )

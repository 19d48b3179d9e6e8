"""AOT export of the SCOUTER inference program (StableHLO via jax.export).

The exported program is the whole serving contract in one compiled unit:

    uint8 images (B, img_size, img_size, C)
      -> normalize (data/transforms.preprocess_batch, resize skipped: the
         client ships pre-sized images, standard fixed-shape serving)
      -> SlotModel forward (eval mode, running BN stats)
      -> logits (B, num_classes) float32
      -> rendered per-class slot maps (B, num_classes, fs, fs) uint8 — the
         same per-sample min-max render the reference's vis mode writes to
         slot_{id}.png (sloter/utils/slot_attention.py:68-85), here computed
         in-program so a serving stack never touches model code.

Weights are baked into the artifact as constants (what a deployment wants:
one file, no checkpoint plumbing at load time). The artifact records the
jax.export calling-convention version and target platforms; deserialization
refuses incompatible artifacts instead of miscomputing.

Batch polymorphism: ``batch=None`` exports with a symbolic batch dimension
("b"), so ONE artifact serves any batch size; pass an int to pin it (slightly
faster compiled code, useful for bucketed engines).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "make_serving_fn",
    "export_serving",
    "save_artifact",
    "load_artifact",
]


def _render_slot_maps(attn, num_classes: int, slots_per_class: int):
    """Batched in-program form of explain.vis.attention_to_maps: (B, S, N)
    final-iteration attention -> (B, C, side, side) uint8, min-max scaled per
    sample over the whole map set (slot_attention.py:78-79 semantics)."""
    import jax.numpy as jnp

    b, s, n = attn.shape
    attn = attn.astype(jnp.float32)
    if slots_per_class > 1:
        attn = attn.reshape(b, num_classes, slots_per_class, n).sum(axis=2)
    amin = attn.min(axis=(1, 2), keepdims=True)
    amax = attn.max(axis=(1, 2), keepdims=True)
    scaled = (attn - amin) / (amax - amin + 1e-12) * 255.0
    side = int(round(n ** 0.5))
    return scaled.reshape(b, num_classes, side, side).astype(jnp.uint8)


def make_serving_fn(cfg, variables, *, compute_dtype=None, include_maps: bool = True,
                    quant: Optional[str] = None):
    """Build the pure serving function ``fn(images_u8) -> dict`` with weights
    closed over. The model is built on the portable jnp slot path
    (``fused_slot=False``): a Pallas call would pin the artifact to one
    backend, and the jnp path is the measured end-to-end serving winner
    anyway (PARITY.md, dated 2026-08-17 decision).

    ``quant='int8'`` activates the hybrid int8 policy (serve/quant.py):
    pointwise backbone convs run s8xs8->s32 on the MXU with dynamic
    activation scales; everything else stays in ``compute_dtype``."""
    import contextlib

    import jax.numpy as jnp

    from ..data.transforms import preprocess_batch
    from ..models import build_slot_model

    model = build_slot_model(cfg, fused_slot=False, dtype=compute_dtype)

    def fn(images_u8):
        from .quant import quantized_convs

        x = preprocess_batch(images_u8, dataset=cfg.dataset, img_size=cfg.img_size)
        ctx = quantized_convs(quant) if quant else contextlib.nullcontext()
        with ctx:
            out = model.apply(variables, x)
        result = {"logits": out["logits"].astype(jnp.float32)}
        if cfg.use_slot and include_maps:
            result["slot_maps"] = _render_slot_maps(
                out["attn"], cfg.num_classes, cfg.slots_per_class
            )
        return result

    return fn


def _input_spec(cfg, batch):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    channels = 1 if cfg.dataset == "MNIST" else 3
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    return jax.ShapeDtypeStruct((b, cfg.img_size, cfg.img_size, channels), jnp.uint8)


def export_serving(
    cfg,
    variables,
    *,
    batch: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    compute_dtype=None,
    include_maps: bool = True,
):
    """Export the serving program. Returns a ``jax.export.Exported``.

    platforms: e.g. ("tpu", "cpu") for a multi-platform artifact; None
    exports for the default backend only.
    """
    import jax
    from jax import export as jexport

    fn = make_serving_fn(
        cfg, variables, compute_dtype=compute_dtype, include_maps=include_maps
    )
    spec = _input_spec(cfg, batch)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    return jexport.export(jax.jit(fn), **kwargs)(spec)


def save_artifact(exported, path: str) -> int:
    """Serialize an Exported to ``path``; returns the byte size."""
    blob = exported.serialize()
    with open(path, "wb") as fh:
        fh.write(blob)
    return len(blob)


def load_artifact(path: str):
    """Load a serialized artifact; returns a callable ``fn(images_u8)``.

    The callable runs under jit on the current default backend (the artifact
    must have been exported for it — jax.export checks and raises otherwise).
    """
    from jax import export as jexport

    with open(path, "rb") as fh:
        exported = jexport.deserialize(fh.read())

    def call(images_u8):
        return exported.call(np.asarray(images_u8, np.uint8))

    call.exported = exported
    return call

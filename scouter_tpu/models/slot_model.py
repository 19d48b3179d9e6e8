"""SCOUTER SlotModel: backbone -> conv1x1 -> +sine PE -> xSlot -> class scores.

Behavioral contract from ``sloter/slot_model.py:55-127``:
- backbone features reshaped to the (B, channel, fs, fs) spatial map (:108); in
  NHWC we simply keep the backbone's (B, fs, fs, channel) output
- 1x1 conv (with bias) to hidden_dim + ReLU (:68,108-109)
- add sine position embedding (:73,110-111); keys see PE, values do not (:116)
- flatten to (B, N, hidden) in row-major spatial order (:113-115)
- xSlot attention (ops/slot_attention.py) -> per-class confidences + area loss
- the reference applies log_softmax and composes the loss inside forward
  (:117-125); here the module returns raw class scores plus auxiliary outputs
  and the loss lives in ``scouter_tpu.ops.losses`` — same numbers, jit-friendly
  boundaries, and no PNG writes inside the model (the reference writes
  visualization files in forward, ``sloter/utils/slot_attention.py:71-83``).

In no-slot mode the model is just the backbone with its own classifier head
(used for the MNIST pre-training recipe, README.md:84-88).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.position import sine_position_embedding
from ..ops.slot_attention import XSlotConfig, xslot_attention

__all__ = ["XSlot", "SlotModel", "SlotModelOutput"]

SlotModelOutput = Dict[str, jnp.ndarray]


class XSlot(nn.Module):
    """Flax wrapper declaring the xSlot parameters (torch layout) and calling
    the functional core. Param names mirror the torch module
    (``initial_slots``, ``to_k_0``/``to_k_2``..., ``gru``)."""

    num_classes: int
    slots_per_class: int = 1
    dim: int = 64
    iters: int = 3
    loss_status: float = 1.0
    power: float = 1.0
    to_k_layer: int = 1
    fused: bool = False
    interpret: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs_pe: jnp.ndarray, inputs_x: jnp.ndarray):
        cfg = XSlotConfig(
            num_classes=self.num_classes,
            slots_per_class=self.slots_per_class,
            dim=self.dim,
            iters=self.iters,
            loss_status=self.loss_status,
            power=self.power,
            to_k_layer=self.to_k_layer,
        )
        d = self.dim

        def slots_init(key, shape):
            # N(mu, |sigma|) with per-feature standard-normal mu/sigma
            # (slot_attention.py:20-25)
            k1, k2, k3 = jax.random.split(key, 3)
            mu = jax.random.normal(k1, (1, 1, d))
            sigma = jax.random.normal(k2, (1, 1, d))
            return (mu + jnp.abs(sigma) * jax.random.normal(k3, shape)).astype(jnp.float32)

        initial_slots = self.param("initial_slots", slots_init, (1, cfg.num_slots, d))

        bound = 1.0 / (d**0.5)
        uniform = nn.initializers.uniform(scale=2 * bound)

        def u_init(key, shape, dtype=jnp.float32):
            return uniform(key, shape, dtype) - bound

        to_k = []
        for i in range(self.to_k_layer):
            # torch Sequential indices: Linear at 0, 2, 4... (ReLU between)
            w = self.param(f"to_k_{2*i}_weight", u_init, (d, d))
            b = self.param(f"to_k_{2*i}_bias", u_init, (d,))
            to_k.append({"weight": w, "bias": b})

        gru = {
            "w_ih": self.param("gru_w_ih", u_init, (3 * d, d)),
            "w_hh": self.param("gru_w_hh", u_init, (3 * d, d)),
            "b_ih": self.param("gru_b_ih", u_init, (3 * d,)),
            "b_hh": self.param("gru_b_hh", u_init, (3 * d,)),
        }

        params = {"initial_slots": initial_slots, "to_k": to_k, "gru": gru}
        if self.dtype is not None and self.dtype != jnp.float32:
            # honor an explicit low-precision slot head (--slot_head_dtype
            # compute under bf16): params are stored fp32 (master copies) and
            # cast for compute — without this the fp32 params promote every
            # op back to fp32 and the request is silently inert
            params = jax.tree_util.tree_map(
                lambda p: p.astype(self.dtype), params)
            inputs_pe = inputs_pe.astype(self.dtype)
            inputs_x = inputs_x.astype(self.dtype)
        return xslot_attention(
            params, cfg, inputs_pe, inputs_x, fused=self.fused, interpret=self.interpret
        )


class SlotModel(nn.Module):
    """Full SCOUTER model. ``backbone`` is any registered zoo module."""

    backbone: nn.Module
    use_slot: bool = True
    num_classes: int = 10
    hidden_dim: int = 64
    slots_per_class: int = 1
    loss_status: float = 1.0
    power: float = 1.0
    to_k_layer: int = 1
    lambda_value: float = 1.0
    iters: int = 3
    fused_slot: bool = False
    interpret: bool = False
    dtype: Optional[jnp.dtype] = None
    # dtype of the slot head (conv1x1 + PE + xSlot). None follows ``dtype``.
    # Under bf16 training the default config keeps this fp32: the head is <1%
    # of model FLOPs but negative-mode (loss_status=-1) logits are small
    # differences of attended-feature sums, and bf16 rounding there costs ~4
    # val points on the negative recipe (docs/RESULTS_round3_bf16_negative.md).
    slot_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> SlotModelOutput:
        """x: (B, H, W, C) NHWC image batch. Returns dict with:
        - 'logits' (B, num_classes): raw class scores (pre-log_softmax)
        - 'area_loss' scalar, 'attn' (B, S, N): slot-mode extras
        """
        if not self.use_slot:
            logits = self.backbone(x, train=train)
            return {"logits": logits}

        feats = self.backbone(x, train=train, features_only=True)  # (B, fs, fs, C)
        head_dtype = self.slot_dtype if self.slot_dtype is not None else self.dtype
        feats = feats.astype(head_dtype or jnp.float32)
        b, fh, fw, _ = feats.shape
        feats = nn.Conv(self.hidden_dim, (1, 1), use_bias=True, dtype=head_dtype,
                        name="conv1x1")(feats)
        feats = jax.nn.relu(feats)
        pe = sine_position_embedding(fh, fw, self.hidden_dim, dtype=feats.dtype)
        feats_pe = feats + pe[None]

        inputs_x = feats.reshape(b, fh * fw, self.hidden_dim)
        inputs_pe = feats_pe.reshape(b, fh * fw, self.hidden_dim)
        logits, area, attn = XSlot(
            num_classes=self.num_classes,
            slots_per_class=self.slots_per_class,
            dim=self.hidden_dim,
            iters=self.iters,
            loss_status=self.loss_status,
            power=self.power,
            to_k_layer=self.to_k_layer,
            fused=self.fused_slot,
            interpret=self.interpret,
            dtype=head_dtype,
            name="slot",
        )(inputs_pe, inputs_x)
        return {"logits": logits, "area_loss": area, "attn": attn}

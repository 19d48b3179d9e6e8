"""Train state: params + BN stats + optimizer, with reference freeze semantics.

Optimizer parity notes (``train.py:146-148``):
- torch ``AdamW(params, lr=args.lr)`` keeps AdamW *defaults* for everything else
  — betas (0.9, 0.999), eps 1e-8, and notably weight_decay=0.01 (the reference's
  ``--weight_decay`` flag is parsed but never passed to the optimizer).
- only ``requires_grad`` params are given to the optimizer; frozen params get
  neither updates nor weight decay. We reproduce that with an optax
  multi_transform over a trainable/frozen label tree.
- StepLR(step_size=lr_drop, gamma 0.1) steps per *epoch* (``train.py:179``);
  we inject the lr each epoch via optax.inject_hyperparams.

Freeze-mask parity (``sloter/slot_model.py:79-94`` dfs_freeze): when
``pre_trained`` and ``freeze_layers > 0``, every backbone param whose top-level
module name does not contain one of ['layer4','layer3','layer2','layer1'][:4 -
freeze_layers] is frozen. The slot head (conv1x1, slot) is always trainable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "create_train_state", "make_freeze_labels", "step_lr",
           "sync_batch_stats"]


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def _kept_layer_names(freeze_layers: int):
    return ["layer4", "layer3", "layer2", "layer1"][: 4 - freeze_layers]


def make_freeze_labels(params: Any, freeze_layers: int, pre_trained: bool) -> Any:
    """Label tree: 'trainable' / 'frozen' per param leaf (dfs_freeze parity).

    The reference walks children recursively and skips any subtree whose name
    contains a kept layer name; at the top level of the backbone that means
    conv1/bn1 and the frozen stages. Non-backbone params are never frozen.
    """
    if not pre_trained or freeze_layers <= 0:
        return jax.tree_util.tree_map(lambda _: "trainable", params)

    kept = _kept_layer_names(freeze_layers)

    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for path, _ in flat.items():
        if path[0] == "backbone":
            module = path[1] if len(path) > 1 else ""
            unfrozen = any(k in module for k in kept)
            labels[path] = "trainable" if unfrozen else "frozen"
        else:
            labels[path] = "trainable"
    return flax.traverse_util.unflatten_dict(labels)


def step_lr(base_lr: float, epoch: int, lr_drop: int, gamma: float = 0.1) -> float:
    """torch StepLR schedule value at a given epoch."""
    return base_lr * (gamma ** (epoch // lr_drop))


def make_optimizer(base_lr: float) -> optax.GradientTransformation:
    """AdamW with torch defaults; lr injected per epoch."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=base_lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
    )


def create_train_state(
    variables: Dict[str, Any],
    base_lr: float,
    freeze_layers: int = 0,
    pre_trained: bool = False,
):
    """Returns (state, tx). tx is kept outside the pytree; pass it to the step
    builders in train/steps.py (it is stateless — all state is in opt_state)."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    labels = make_freeze_labels(params, freeze_layers, pre_trained)
    tx = optax.multi_transform(
        {"trainable": make_optimizer(base_lr), "frozen": optax.set_to_zero()}, labels
    )
    opt_state = tx.init(params)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx


def restore_inference_state(cfg, *, fused_slot: bool = False, require: bool = False):
    """Rebuild the model + TrainState from the config-derived checkpoint name
    (the reference's test.py re-derivation flow, ``test.py:59-62``). Returns
    ``(model, state, restored_path_or_None)``. Shared by the inference and
    serving CLIs so the restore recipe cannot diverge between them."""
    import os

    from ..core.checkpoint import checkpoint_path, restore_checkpoint
    from ..models import build_slot_model

    model = build_slot_model(cfg, fused_slot=fused_slot)
    channels = 1 if cfg.dataset == "MNIST" else 3
    sample = jnp.zeros((1, cfg.img_size, cfg.img_size, channels), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample)
    state, _ = create_train_state(variables, cfg.lr)
    path = checkpoint_path(cfg.output_dir, cfg)
    if not os.path.exists(path):
        if require:
            raise FileNotFoundError(f"no checkpoint at {path}")
        return model, state, None
    state, _, _ = restore_checkpoint(path, state)
    return model, state, path


def sync_batch_stats(state: TrainState, mesh=None) -> TrainState:
    """Cross-replica BN statistics averaging — timm ``distribute_bn``
    (``timm/utils.py:214-231``) capability.

    With replicated params under jit sharding, per-replica BN stats are already
    identical (each device computed them from its own shard but the state is
    replicated post-step); this helper exists for pmap-style setups and
    multi-host EMA reduction: it averages the batch_stats pytree across
    processes via a tiny all-reduce program.
    """
    import jax

    if state.batch_stats is None or jax.process_count() == 1:
        return state
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    synced = jax.tree_util.tree_map(
        lambda x: multihost_utils.process_allgather(x).mean(axis=0),
        state.batch_stats,
    )
    return state.replace(batch_stats=synced)

"""Jitted train/eval steps — the engine (engine.py:6-52 equivalent), TPU-first.

One compiled function per mode; the whole forward+backward+optimizer+metrics
computation runs on device. Under a data-sharded batch with replicated params,
XLA inserts the gradient all-reduce over the mesh — the DDP bucket all-reduce
(``engine.py:33`` backward) becomes a compiler-scheduled psum on ICI.

Metrics parity (``engine.py:26-52`` + ``tools/calculate_tool.py:4-9``): each
step returns loss / CE loss / area loss and top-1 fraction for the global batch;
the epoch driver averages over batches, matching the reference's bookkeeping.

Setting the learning rate per epoch (StepLR semantics) is done by overwriting
``opt_state.inner_states['trainable'].inner_state.hyperparams['learning_rate']``
— see :func:`set_learning_rate`.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.losses import scouter_loss
from .state import TrainState

__all__ = ["make_train_step", "make_eval_step", "set_learning_rate"]

Batch = Dict[str, jnp.ndarray]


def _forward(model, variables, images, train: bool, dropout_rng=None):
    if train:
        # the 'dropout' rng feeds timm-style head dropout (models/layers.py
        # head_dropout); unused rngs are harmless when drop_rate == 0
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        out, mutated = model.apply(variables, images, train=True,
                                   mutable=["batch_stats"], rngs=rngs)
        return out, mutated.get("batch_stats")
    return model.apply(variables, images, train=False), None


def _metrics(out, losses, labels, mask=None) -> Dict[str, jnp.ndarray]:
    pred = jnp.argmax(out["logits"], axis=1)
    correct = (pred == labels).astype(jnp.float32)
    if mask is not None:
        acc = jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    else:
        acc = jnp.mean(correct)
    m = {
        "loss": losses["loss"],
        "acc": acc,
        "log_loss": losses.get("log_loss", losses["loss"]),
        "att_loss": losses.get("att_loss", jnp.zeros(())),
    }
    return m


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    lambda_value: float,
    donate: bool = True,
    clip_grad: Optional[float] = None,
    mesh=None,
    sync_bn: bool = True,
    state_shardings=None,
    auto_layout: bool = False,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step. ``model`` is the SlotModel module.

    ``clip_grad`` reproduces the reference's (commented-out) clip_gradient
    helper (engine.py:55-65): elementwise clamp of gradients to [-c, c].

    ``state_shardings`` (tensor-parallel / ZeRO-1 path, parallel/tp.py): a
    NamedSharding pytree matching TrainState; when given, the step's output
    state is pinned to it so TP/optimizer-shard placements are stable across
    steps (matching the donated input — no second-call recompile).

    BN semantics under the data mesh (SURVEY §7 hard part 5):

    - ``sync_bn=True`` (default): the step is a plain jit over the sharded
      batch, so batch-norm statistics are computed over the GLOBAL batch —
      sync-BN behavior, usually better numerics.
    - ``sync_bn=False`` (requires ``mesh``): the step runs under shard_map on
      the 'data' axis; each replica normalizes with its LOCAL batch statistics
      — exactly what the reference's DDP does (BN never synced,
      ``train.py:139-141``). Gradients are pmean'd (the DDP all-reduce), and
      the replicated running stats take replica 0's update (rank 0 is what
      ``save_on_master`` checkpoints, ``tools/prepare_things.py:73-75``).
    """

    def step_body(state: TrainState, batch: Batch, per_replica: bool):
        # deterministic per-step dropout stream (only consumed when the model
        # has drop_rate > 0): folded from the step counter so resume replays
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(17), state.step)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            out, new_stats = _forward(model, variables, batch["image"], train=True,
                                      dropout_rng=dropout_rng)
            _, losses = scouter_loss(
                out["logits"], batch["label"], out.get("area_loss"), lambda_value
            )
            return losses["loss"], (losses, out, new_stats)

        grads, (losses, out, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        if per_replica:
            grads = jax.lax.pmean(grads, "data")
        if clip_grad is not None:
            grads = jax.tree_util.tree_map(
                lambda g: jnp.clip(g, -clip_grad, clip_grad), grads
            )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if per_replica and new_stats is not None:
            # keep the state replicated: running stats follow replica 0
            new_stats = jax.tree_util.tree_map(
                lambda s: jax.lax.all_gather(s, "data")[0], new_stats
            )
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats if new_stats is not None else state.batch_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        mask = batch.get("mask")
        metrics = _metrics(out, losses, batch["label"], mask)
        if per_replica:
            # acc is a masked ratio: psum numerator and denominator separately
            # so an unevenly-masked shard (padded tail) isn't over-weighted by
            # an unweighted pmean of per-shard ratios
            pred = jnp.argmax(out["logits"], axis=1)
            correct = (pred == batch["label"]).astype(jnp.float32)
            m = mask if mask is not None else jnp.ones_like(correct)
            num = jax.lax.psum(jnp.sum(correct * m), "data")
            den = jax.lax.psum(jnp.sum(m), "data")
            metrics = jax.lax.pmean(metrics, "data")
            metrics["acc"] = num / jnp.maximum(den, 1.0)
        return new_state, metrics

    if sync_bn or mesh is None:
        def train_step(state: TrainState, batch: Batch):
            return step_body(state, batch, per_replica=False)
    else:
        from jax.sharding import PartitionSpec as P

        sharded = jax.shard_map(
            functools.partial(step_body, per_replica=True),
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        )

        def train_step(state: TrainState, batch: Batch):
            return sharded(state, batch)

    jit_kwargs = {}
    if state_shardings is not None:
        if not sync_bn:
            raise ValueError(
                "state_shardings (TP/ZeRO-1) requires sync_bn=True — the "
                "per-replica shard_map path is data-axis-only")
        from jax.sharding import NamedSharding, PartitionSpec
        mesh_for_out = jax.tree_util.tree_leaves(state_shardings)[0].mesh
        jit_kwargs["out_shardings"] = (
            state_shardings, NamedSharding(mesh_for_out, PartitionSpec()))
    elif auto_layout:
        # Let XLA choose the ENTRY layout of the donated TrainState instead of
        # forcing row-major: the round-4 xprof profile showed ~2 ms of the
        # 13.35 ms step in layout copies — conv kernels stored {3,2,1,0} were
        # copied to the conv-preferred {2,3,1,0} on the way in and copied back
        # on the way out (donation aliasing requires matching layouts), plus
        # exposed VMEM prefetch waits on the fp32 master params. With AUTO
        # layouts the state round-trips step-to-step in XLA's preferred
        # layout; the one-time relayout happens on the first call (jax
        # device_puts mismatched-layout args automatically).
        from jax.experimental.layout import Format, Layout

        # Format(Layout.AUTO), NOT Format(): a bare Format() means
        # "unconstrained = default layout" and silently compiles the
        # identical executable (round-4 review finding, verified).
        auto = Format(Layout.AUTO)
        jit_kwargs["in_shardings"] = (auto, None)
        jit_kwargs["out_shardings"] = (auto, None)
    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   **jit_kwargs)


def make_eval_step(
    model, lambda_value: float
) -> Callable[[TrainState, Batch], Dict[str, jnp.ndarray]]:
    """Jitted eval step. With a padded batch ('mask' present), EVERY loss
    component is computed over the real samples only — the reference's tail
    val batch is simply smaller (engine.py:17-52), so its per-batch loss
    averages real samples; an unmasked mean here would be dominated by the
    pad duplicates. The area loss is re-derived per-sample from the attention
    (mean of relu(attn) over (S, N), masked batch mean, then ^power — the
    batch-global form of slot_attention.py:93-96)."""
    power = float(getattr(model, "power", 1.0))

    def eval_step(state: TrainState, batch: Batch):
        out, _ = _forward(model, state.variables(), batch["image"], train=False)
        mask = batch.get("mask")
        if mask is None:
            _, losses = scouter_loss(
                out["logits"], batch["label"], out.get("area_loss"), lambda_value
            )
            return _metrics(out, losses, batch["label"], None)
        mask = mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        log_probs = jax.nn.log_softmax(out["logits"].astype(jnp.float32), axis=1)
        per_nll = -jnp.take_along_axis(log_probs, batch["label"][:, None], axis=1)[:, 0]
        nll = jnp.sum(per_nll * mask) / denom
        if out.get("area_loss") is not None and "attn" in out:
            per_area = jnp.mean(
                jax.nn.relu(out["attn"].astype(jnp.float32)), axis=(1, 2))
            area = (jnp.sum(per_area * mask) / denom) ** power
            losses = {"loss": nll + lambda_value * area,
                      "log_loss": nll, "att_loss": area}
        else:
            losses = {"loss": nll}
        return _metrics(out, losses, batch["label"], mask)

    return jax.jit(eval_step)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Overwrite the injected lr (StepLR-per-epoch, train.py:179 semantics)."""
    # opt_state structure: MultiTransformState(inner_states={'trainable':
    # MaskedState(inner_state=InjectHyperparamsState(hyperparams={'learning_rate': ...}))})
    opt_state = state.opt_state
    inner = opt_state.inner_states["trainable"]
    hp_state = inner.inner_state
    new_hp = dict(hp_state.hyperparams)
    new_hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.asarray(new_hp["learning_rate"]).dtype)
    new_hp_state = hp_state._replace(hyperparams=new_hp)
    new_inner = inner._replace(inner_state=new_hp_state)
    new_opt_state = opt_state._replace(
        inner_states={**opt_state.inner_states, "trainable": new_inner}
    )
    return state.replace(opt_state=new_opt_state)

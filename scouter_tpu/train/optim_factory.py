"""Optimizer factory — timm ``create_optimizer`` (``timm/optim/optim_factory.py:11-103``)
capability on optax.

Includes the BN/bias weight-decay exclusion (``add_weight_decay``): parameters
with ndim <= 1 (biases, norm scales) get no weight decay.
Supported: sgd/nesterov, adam, adamw, nadam, radam, rmsprop (+rmsprop_tf
semantics via optax.rmsprop), novograd, adadelta, adagrad, lamb, lars,
lookahead wrapper (``lookahead_<opt>``).
"""

from __future__ import annotations

from typing import Any, Optional

import optax

__all__ = ["create_optimizer", "no_decay_mask"]


def no_decay_mask(params: Any) -> Any:
    """True where weight decay applies (ndim > 1) — add_weight_decay parity."""
    import jax

    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def _base(opt: str, lr: float, weight_decay: float, momentum: float, eps: float,
          params: Optional[Any]):
    mask = no_decay_mask(params) if params is not None else None

    if opt in ("sgd", "nesterov"):
        tx = optax.sgd(lr, momentum=momentum, nesterov=True)
    elif opt == "momentum":
        tx = optax.sgd(lr, momentum=momentum, nesterov=False)
    elif opt == "adam":
        tx = optax.adam(lr, eps=eps)
    elif opt == "adamw":
        tx = optax.adamw(lr, eps=eps, weight_decay=weight_decay, mask=mask)
        return tx, True
    elif opt == "nadam":
        tx = optax.nadam(lr, eps=eps)
    elif opt == "radam":
        tx = optax.radam(lr, eps=eps)
    elif opt in ("rmsprop", "rmsproptf"):
        # rmsprop_tf: eps inside sqrt, grad-averaging momentum (optax centered form)
        tx = optax.rmsprop(lr, decay=0.9, eps=eps, momentum=momentum,
                           initial_scale=1.0 if opt == "rmsproptf" else 0.0)
    elif opt == "novograd":
        tx = optax.novograd(lr, eps=eps, weight_decay=weight_decay)
        return tx, True
    elif opt == "adadelta":
        tx = optax.adadelta(lr, eps=eps)
    elif opt == "adagrad":
        tx = optax.adagrad(lr, eps=eps)
    elif opt == "lamb":
        tx = optax.lamb(lr, eps=eps, weight_decay=weight_decay, mask=mask)
        return tx, True
    elif opt == "lars":
        tx = optax.lars(lr, weight_decay=weight_decay,
                        weight_decay_mask=mask if mask is not None else True)
        return tx, True
    else:
        raise ValueError(f"unknown optimizer {opt!r}")
    return tx, False


def create_optimizer(
    opt: str = "adamw",
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    eps: float = 1e-8,
    params: Optional[Any] = None,
    lookahead_sync_period: int = 6,
    lookahead_slow_step: float = 0.5,
) -> optax.GradientTransformation:
    """Build an optax transformation by timm-style name.

    ``lookahead_<name>`` wraps the base optimizer in optax.lookahead semantics
    (implemented as a simple slow/fast interpolation wrapper).
    """
    opt = opt.lower()
    use_lookahead = opt.startswith("lookahead_")
    if use_lookahead:
        opt = opt[len("lookahead_"):]

    tx, decay_included = _base(opt, lr, weight_decay, momentum, eps, params)
    if weight_decay > 0 and not decay_included:
        mask = no_decay_mask(params) if params is not None else None
        tx = optax.chain(optax.add_decayed_weights(weight_decay, mask), tx)

    if use_lookahead:
        tx = _lookahead(tx, lookahead_sync_period, lookahead_slow_step)
    return tx


def _lookahead(tx: optax.GradientTransformation, k: int, alpha: float):
    """Lookahead wrapper (timm/optim/lookahead.py capability): every k steps the
    slow weights move toward the fast weights by alpha, and the fast weights
    reset to the slow ones. Implemented over update deltas."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return {
            "inner": tx.init(params),
            "slow": jax.tree_util.tree_map(jnp.asarray, params),
            "count": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params=None):
        updates, inner = tx.update(grads, state["inner"], params)
        count = state["count"] + 1
        sync = (count % k) == 0

        def on_sync(u, s, p):
            fast = p + u  # params after applying the fast update
            new_slow = s + alpha * (fast - s)
            return new_slow - p, new_slow  # jump to new slow weights

        def no_sync(u, s, p):
            return u, s

        new_updates = jax.tree_util.tree_map(
            lambda u, s, p: jnp.where(sync, on_sync(u, s, p)[0], u),
            updates, state["slow"], params,
        )
        new_slow = jax.tree_util.tree_map(
            lambda u, s, p: jnp.where(sync, on_sync(u, s, p)[1], s),
            updates, state["slow"], params,
        )
        return new_updates, {"inner": inner, "slow": new_slow, "count": count}

    return optax.GradientTransformation(init, update)

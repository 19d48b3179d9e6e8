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


def _wd_tree(params: Any, weight_decay: float, mask: Any):
    """Per-leaf decay coefficients honoring the add_weight_decay grouping
    (timm/optim/optim_factory.py:11-24): ndim<=1 leaves (biases, norm scales)
    get wd=0 — timm passes wd per param GROUP, so optimizers that fold decay
    into the gradient must respect the mask too."""
    import jax

    if params is None:
        return None
    if mask is None:
        return jax.tree_util.tree_map(lambda _: weight_decay, params)
    return jax.tree_util.tree_map(
        lambda mk: weight_decay if mk else 0.0, mask)


def _timm_nadam(lr: float, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                weight_decay: float = 0.0, schedule_decay: float = 4e-3,
                wd_tree: Any = None):
    """timm Nadam (``timm/optim/nadam.py:34-92``): Nesterov-Adam with the 0.96
    momentum warm-up schedule. Trajectory-parity tested vs the reference."""
    import jax
    import jax.numpy as jnp

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"step": jnp.zeros((), jnp.int32),
                "m_schedule": jnp.ones(()),
                "exp_avg": zeros,
                "exp_avg_sq": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update(grads, state, params=None):
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        mc_t = b1 * (1.0 - 0.5 * 0.96 ** (tf * schedule_decay))
        mc_t1 = b1 * (1.0 - 0.5 * 0.96 ** ((tf + 1.0) * schedule_decay))
        msched_new = state["m_schedule"] * mc_t
        msched_next = msched_new * mc_t1

        if weight_decay and params is not None:
            wds = wd_tree if wd_tree is not None else jax.tree_util.tree_map(
                lambda _: weight_decay, params)
            grads = jax.tree_util.tree_map(
                lambda g, p, w: g + w * p, grads, params, wds)

        exp_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state["exp_avg"], grads)
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state["exp_avg_sq"], grads)

        def upd(g, m, v):
            denom = jnp.sqrt(v / (1.0 - b2**tf)) + eps
            return (-lr * (1.0 - mc_t) / (1.0 - msched_new) * g / denom
                    - lr * mc_t1 / (1.0 - msched_next) * m / denom)

        updates = jax.tree_util.tree_map(upd, grads, exp_avg, exp_avg_sq)
        return updates, {"step": t, "m_schedule": msched_new,
                         "exp_avg": exp_avg, "exp_avg_sq": exp_avg_sq}

    return optax.GradientTransformation(init, update)


def _timm_novograd(lr: float, b1: float = 0.95, b2: float = 0.98, eps: float = 1e-8,
                   weight_decay: float = 0.0, grad_averaging: bool = False,
                   wd_tree: Any = None):
    """timm NovoGrad (``timm/optim/novograd.py:12-77``), including its init
    quirk: the first gradient seeds v/m before the regular step runs on it."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return {"step": jnp.zeros((), jnp.int32),
                "v": jax.tree_util.tree_map(lambda p: jnp.zeros(()), params),
                "m": jax.tree_util.tree_map(jnp.zeros_like, params),
                "grad_ema": jax.tree_util.tree_map(lambda p: jnp.zeros(()), params)}

    def update(grads, state, params=None):
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        first = state["step"] == 0

        def leaf(g, p, w, v, m, gema):
            g2_raw = jnp.sum(g * g)
            # init pass on the first step (novograd.py:31-46)
            v0 = g2_raw
            m0 = g / (jnp.sqrt(v0) + eps) + w * p
            v_in = jnp.where(first, v0, v)
            m_in = jnp.where(first, m0, m)
            gema_new = jnp.where(first, g2_raw, b2 * gema + (1.0 - b2) * g2_raw)
            gn = g / (jnp.sqrt(gema_new) + eps)
            if grad_averaging:
                gn = gn * (1.0 - b1)
            g2 = jnp.sum(gn * gn)
            v_new = b2 * v_in + (1.0 - b2) * g2
            m_new = b1 * m_in + (gn / (jnp.sqrt(v_new) + eps) + w * p)
            step_size = lr * jnp.sqrt(1.0 - b2**tf) / (1.0 - b1**tf)
            return -step_size * m_new, v_new, m_new, gema_new

        wds = wd_tree if wd_tree is not None else jax.tree_util.tree_map(
            lambda _: weight_decay, params)
        flat = jax.tree_util.tree_map(
            leaf, grads, params, wds, state["v"], state["m"], state["grad_ema"])
        updates = jax.tree_util.tree_map(lambda r: r[0], flat,
                                         is_leaf=lambda x: isinstance(x, tuple))
        v = jax.tree_util.tree_map(lambda r: r[1], flat,
                                   is_leaf=lambda x: isinstance(x, tuple))
        m = jax.tree_util.tree_map(lambda r: r[2], flat,
                                   is_leaf=lambda x: isinstance(x, tuple))
        gema = jax.tree_util.tree_map(lambda r: r[3], flat,
                                      is_leaf=lambda x: isinstance(x, tuple))
        return updates, {"step": t, "v": v, "m": m, "grad_ema": gema}

    return optax.GradientTransformation(init, update)


def _timm_nvnovograd(lr: float, b1: float = 0.95, b2: float = 0.98, eps: float = 1e-8,
                     weight_decay: float = 0.0, grad_averaging: bool = False,
                     wd_tree: Any = None):
    """timm NvNovoGrad (``timm/optim/nvnovograd.py:30-118``): per-tensor scalar
    second moment seeded by the first gradient norm."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return {"step": jnp.zeros((), jnp.int32),
                "exp_avg": jax.tree_util.tree_map(jnp.zeros_like, params),
                "exp_avg_sq": jax.tree_util.tree_map(lambda p: jnp.zeros(()), params)}

    def update(grads, state, params=None):
        t = state["step"] + 1
        first = state["step"] == 0

        def leaf(g, p, w, m, vsq):
            norm = jnp.sum(g * g)
            vsq_new = jnp.where(first, norm, b2 * vsq + (1.0 - b2) * norm)
            gn = g / (jnp.sqrt(vsq_new) + eps)
            gn = gn + w * p
            if grad_averaging:
                gn = gn * (1.0 - b1)
            m_new = b1 * m + gn
            return -lr * m_new, m_new, vsq_new

        wds = wd_tree if wd_tree is not None else jax.tree_util.tree_map(
            lambda _: weight_decay, params)
        flat = jax.tree_util.tree_map(leaf, grads, params, wds,
                                      state["exp_avg"], state["exp_avg_sq"])
        updates = jax.tree_util.tree_map(lambda r: r[0], flat,
                                         is_leaf=lambda x: isinstance(x, tuple))
        m = jax.tree_util.tree_map(lambda r: r[1], flat,
                                   is_leaf=lambda x: isinstance(x, tuple))
        vsq = jax.tree_util.tree_map(lambda r: r[2], flat,
                                     is_leaf=lambda x: isinstance(x, tuple))
        return updates, {"step": t, "exp_avg": m, "exp_avg_sq": vsq}

    return optax.GradientTransformation(init, update)


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
        # timm's Nadam with the 0.96 momentum warm-up schedule (trajectory
        # parity vs the reference; optax.nadam implements a different variant)
        tx = _timm_nadam(lr, eps=eps, weight_decay=weight_decay,
                         wd_tree=_wd_tree(params, weight_decay, mask))
        return tx, True
    elif opt == "radam":
        tx = optax.radam(lr, eps=eps)
    elif opt in ("rmsprop", "rmsproptf"):
        # rmsprop_tf: eps inside sqrt, grad-averaging momentum (optax centered form)
        tx = optax.rmsprop(lr, decay=0.9, eps=eps, momentum=momentum,
                           initial_scale=1.0 if opt == "rmsproptf" else 0.0)
    elif opt == "novograd":
        tx = _timm_novograd(lr, eps=eps, weight_decay=weight_decay,
                            wd_tree=_wd_tree(params, weight_decay, mask))
        return tx, True
    elif opt == "nvnovograd":
        tx = _timm_nvnovograd(lr, eps=eps, weight_decay=weight_decay,
                              wd_tree=_wd_tree(params, weight_decay, mask))
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

"""Excitation backprop (+ contrastive) — capability of
``torchray/attribution/excitation_backprop.py``.

EBP rule for a linear layer f (conv / dense / avg pool), cited from the
reference (:60-105, :254-354):

    p' = x * f*(x, w+, p / (f(x, w+) + 1e-20))

i.e. re-run the layer with clamped-positive weights and no bias, normalize the
incoming relevance by that output, backprop it, and multiply by the input.
Normalization layers pass relevance through unchanged (:412-459); element-wise
sums split relevance proportionally to each addend (:459-502 — applied to
ResNet skip connections, mirroring the reference's resnet-specific rewrite
:182-252). Saliency is the channel-sum of the propagated relevance (:579-600);
the contrastive variant subtracts the relevance computed with negated
classifier weights at a contrast layer and clamps at zero (:603-624, :647-760).

JAX mechanism: trace-scoped monkeypatches of ``jax.lax.conv_general_dilated``
and ``jax.lax.dot_general`` with custom-vjp EBP versions, a straight-through
BatchNorm wrapper, and the overridable residual add in models/act.py — the
functional replacement for torchray's Patch machinery.
"""

from __future__ import annotations

import contextlib
import functools
import jax
import jax.numpy as jnp

from ..models.act import override_residual_add

__all__ = ["ebp_rules", "excitation_backprop", "contrastive_excitation_backprop"]

_PLAIN_CONV = jax.lax.conv_general_dilated
_PLAIN_DOT = jax.lax.dot_general


def _ebp_linear_call(plain_fn, lhs, rhs, args, kwargs):
    """Wrap one linear-layer call with the EBP backward rule."""

    @jax.custom_vjp
    def f(lhs, rhs):
        return plain_fn(lhs, rhs, *args, **kwargs)

    def fwd(lhs, rhs):
        return plain_fn(lhs, rhs, *args, **kwargs), (lhs, rhs)

    def bwd(res, g):
        lhs, rhs = res
        w_pos = jnp.maximum(rhs, 0.0)
        out_pos, vjp = jax.vjp(lambda l: plain_fn(l, w_pos, *args, **kwargs), lhs)
        ghat = g / (out_pos + 1e-20)
        (gl,) = vjp(ghat)
        return gl * lhs, jnp.zeros_like(rhs)

    f.defvjp(fwd, bwd)
    return f(lhs, rhs)


def _ebp_conv(lhs, rhs, *args, **kwargs):
    return _ebp_linear_call(_PLAIN_CONV, lhs, rhs, args, kwargs)


def _ebp_dot(lhs, rhs, *args, **kwargs):
    return _ebp_linear_call(_PLAIN_DOT, lhs, rhs, args, kwargs)


@jax.custom_vjp
def _straight_through(x, y):
    return y


def _st_fwd(x, y):
    return y, None


def _st_bwd(_, g):
    return g, None


_straight_through.defvjp(_st_fwd, _st_bwd)


def _ebp_add(a, b):
    @jax.custom_vjp
    def f(a, b):
        return a + b

    def fwd(a, b):
        return a + b, (a, b)

    def bwd(res, g):
        a, b = res
        total = a + b
        return (a / total * g, b / total * g)

    f.defvjp(fwd, bwd)
    return f(a, b)


def ebp_mean(x, axis):
    """EBP-rule global average pooling (all-positive weights)."""

    @jax.custom_vjp
    def f(x):
        return x.mean(axis=axis)

    def fwd(x):
        return x.mean(axis=axis), x

    def bwd(x, g):
        out, vjp = jax.vjp(lambda v: v.mean(axis=axis), x)
        (gl,) = vjp(g / (out + 1e-20))
        return (gl * x,)

    f.defvjp(fwd, bwd)
    return f(x)


@contextlib.contextmanager
def ebp_rules():
    """Trace-scoped activation of the EBP backward rules."""
    from flax import linen as nn

    orig_bn_call = nn.BatchNorm.__call__

    @functools.wraps(orig_bn_call)
    def bn_call(self, x, *a, **k):
        y = orig_bn_call(self, x, *a, **k)
        return _straight_through(x, y)

    jax.lax.conv_general_dilated = _ebp_conv
    jax.lax.dot_general = _ebp_dot
    nn.BatchNorm.__call__ = bn_call
    try:
        with override_residual_add(_ebp_add):
            yield
    finally:
        jax.lax.conv_general_dilated = _PLAIN_CONV
        jax.lax.dot_general = _PLAIN_DOT
        nn.BatchNorm.__call__ = orig_bn_call


def _head_from(model, variables, saliency_layer, class_sign=1.0):
    from .cam import fc_params

    kernel, bias = fc_params(variables)

    def rest(feats):
        f = model.apply(variables, feats, start_from=saliency_layer, features_only=True)
        pooled = ebp_mean(f, (1, 2))
        # resolve jax.lax.dot_general at CALL time so the ebp_rules patch
        # applies (jnp.matmul binds the internal dot_general and would bypass
        # the EBP w+ rule on the classifier)
        out = jax.lax.dot_general(pooled, class_sign * kernel,
                                  (((1,), (0,)), ((), ())))
        return out + bias

    return rest


def excitation_backprop(model, variables, x, class_idx: int,
                        saliency_layer: str = "layer3") -> jnp.ndarray:
    """EBP saliency at a stage boundary. Returns (h, w) channel-summed relevance."""
    feats = model.apply(variables, x, stop_after=saliency_layer)
    rest = _head_from(model, variables, saliency_layer)
    with ebp_rules():
        g = jax.grad(lambda f: rest(f)[0, class_idx])(feats)
    return g[0].sum(axis=-1)


def contrastive_excitation_backprop(
    model, variables, x, class_idx: int,
    saliency_layer: str = "layer2",
    contrast_layer: str = "layer4",
) -> jnp.ndarray:
    """Contrastive EBP (:647-760): relevance at the contrast layer computed
    with w and -w classifier weights, subtracted, then propagated to the
    saliency layer; the result is clamped at zero (channel-sum first)."""
    feats_s = model.apply(variables, x, stop_after=saliency_layer)
    feats_c = model.apply(variables, feats_s, start_from=saliency_layer,
                          stop_after=contrast_layer)

    rest_pos = _head_from(model, variables, contrast_layer, 1.0)
    rest_neg = _head_from(model, variables, contrast_layer, -1.0)
    with ebp_rules():
        g_pos = jax.grad(lambda f: rest_pos(f)[0, class_idx])(feats_c)
        g_neg = jax.grad(lambda f: rest_neg(f)[0, class_idx])(feats_c)
        contrast = g_pos - g_neg

        def mid(f):
            out = model.apply(variables, f, start_from=saliency_layer,
                              stop_after=contrast_layer)
            return jnp.sum(out * jax.lax.stop_gradient(contrast))

        g = jax.grad(mid)(feats_s)
    return jnp.clip(g[0].sum(axis=-1), min=0.0)

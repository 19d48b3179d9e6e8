"""Activation indirection for backprop-modifying attribution methods.

The torchray backprop family (deconvnet, guided backprop —
``torchray/attribution/deconvnet.py:58-86``, ``guided_backprop.py``) works by
rewriting the ReLU autograd rule. The JAX equivalent: backbones call
:func:`relu` below instead of ``jax.nn.relu``; attribution code swaps in a
``jax.custom_vjp`` ReLU for the duration of a trace via :func:`override_relu`.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional

import jax

_RELU_OVERRIDE: Optional[Callable] = None
_ADD_OVERRIDE: Optional[Callable] = None


def relu(x):
    f = _RELU_OVERRIDE
    return jax.nn.relu(x) if f is None else f(x)


def residual_add(a, b):
    """Skip-connection add — overridable for excitation backprop's eltwise rule
    (``torchray/attribution/excitation_backprop.py:459-502``)."""
    f = _ADD_OVERRIDE
    return a + b if f is None else f(a, b)


@contextlib.contextmanager
def override_residual_add(fn: Callable):
    global _ADD_OVERRIDE
    prev = _ADD_OVERRIDE
    _ADD_OVERRIDE = fn
    try:
        yield
    finally:
        _ADD_OVERRIDE = prev


@contextlib.contextmanager
def override_relu(fn: Callable):
    """Swap the backbone ReLU during tracing (trace-scoped, not thread-safe)."""
    global _RELU_OVERRIDE
    prev = _RELU_OVERRIDE
    _RELU_OVERRIDE = fn
    try:
        yield
    finally:
        _RELU_OVERRIDE = prev


# ---- modified-backward ReLUs ------------------------------------------------

@jax.custom_vjp
def deconvnet_relu(x):
    return jax.nn.relu(x)


def _deconv_fwd(x):
    return jax.nn.relu(x), None


def _deconv_bwd(_, g):
    # deconvnet: pass back the positive part of the output gradient,
    # ignoring the input sign (torchray deconvnet.py:58-86)
    return (jax.nn.relu(g),)


deconvnet_relu.defvjp(_deconv_fwd, _deconv_bwd)


@jax.custom_vjp
def guided_relu(x):
    return jax.nn.relu(x)


def _guided_fwd(x):
    return jax.nn.relu(x), x


def _guided_bwd(x, g):
    # guided backprop: standard ReLU gate AND positive-gradient gate
    return (jax.nn.relu(g) * (x > 0),)


guided_relu.defvjp(_guided_fwd, _guided_bwd)

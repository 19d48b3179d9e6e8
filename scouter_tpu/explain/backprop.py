"""Backprop attribution family — the capability of torchray's
``attribution/{gradient,deconvnet,guided_backprop,linear_approx}.py`` and the
generic ``saliency()`` pipeline (``torchray/attribution/common.py:429-583``).

The autograd rewrites (deconvnet/guided ReLU) are jax.custom_vjp activations
swapped in during tracing via ``models.act.override_relu`` — no Probe/Patch
machinery needed. Saliency conversion matches ``gradient_to_saliency``
(``common.py:351-371``): channel-max of |grad|.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.act import deconvnet_relu, guided_relu, override_relu
from .cam import backbone_split

__all__ = ["gradient_saliency", "deconvnet", "guided_backprop", "linear_approx"]


def _input_grad(forward: Callable, x: jnp.ndarray, class_idx: int) -> jnp.ndarray:
    return jax.grad(lambda inp: forward(inp)[0, class_idx])(x)


def _to_saliency(grad: jnp.ndarray) -> jnp.ndarray:
    """max over channels of |grad| (common.py:351-371). grad: (1, H, W, C)."""
    return jnp.abs(grad[0]).max(axis=-1)


def gradient_saliency(model, variables, x, class_idx: int) -> jnp.ndarray:
    """Plain input-gradient saliency (torchray gradient.py)."""
    _, _, forward = backbone_split(model, variables)
    return _to_saliency(_input_grad(forward, x, class_idx))


def deconvnet(model, variables, x, class_idx: int) -> jnp.ndarray:
    """DeConvNet: ReLU backward passes the positive output-gradient
    (deconvnet.py:58-86)."""
    _, _, forward = backbone_split(model, variables)
    with override_relu(deconvnet_relu):
        g = _input_grad(forward, x, class_idx)
    return _to_saliency(g)


def guided_backprop(model, variables, x, class_idx: int) -> jnp.ndarray:
    """Guided backprop: ReLU backward gates on input>0 AND grad>0."""
    _, _, forward = backbone_split(model, variables)
    with override_relu(guided_relu):
        g = _input_grad(forward, x, class_idx)
    return _to_saliency(g)


def linear_approx(model, variables, x, class_idx: int,
                  saliency_layer: Optional[str] = None) -> jnp.ndarray:
    """Linear approximation: activation * gradient, summed over channels
    (torchray linear_approx.py). With ``saliency_layer`` ('layer1'..'layer4')
    the product is taken at that stage's output; default is the input."""
    if saliency_layer is None:
        _, _, forward = backbone_split(model, variables)
        g = _input_grad(forward, x, class_idx)
        return (x * g)[0].sum(axis=-1)

    feats = model.apply(variables, x, stop_after=saliency_layer)

    def head_from(f):
        out = model.apply(variables, f, start_from=saliency_layer)
        return out[0, class_idx]

    g = jax.grad(head_from)(feats)
    return (feats * g)[0].sum(axis=-1)

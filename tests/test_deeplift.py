"""DeepLift rescale-rule tests: completeness property + layer attribution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.explain.deeplift import deeplift, layer_deeplift
from scouter_tpu.models import create_model


def test_rescale_completeness_on_relu_mlp():
    """For a ReLU network with zero baseline, DeepLift-rescale attributions sum
    to f(x) - f(x0) (the completeness axiom)."""
    key = jax.random.PRNGKey(0)
    w1 = jax.random.normal(key, (6, 8))
    w2 = jax.random.normal(jax.random.fold_in(key, 1), (8, 3))

    from scouter_tpu.models.act import override_relu, relu
    from scouter_tpu.explain.deeplift import _paired_rescale_relu

    def net(s):
        return relu(s @ w1) @ w2

    x = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (1, 6))) + 0.1
    x0 = jnp.zeros_like(x)
    stacked = jnp.concatenate([x, x0])

    def score(s):
        with override_relu(_paired_rescale_relu):
            return net(s)[0, 1] - net(s)[1, 1]

    g = jax.grad(score)(stacked)
    attr = (x[0] - x0[0]) * g[0]
    expected = float(net(jnp.concatenate([x, x0]))[0, 1] - net(jnp.concatenate([x, x0]))[1, 1])
    np.testing.assert_allclose(float(attr.sum()), expected, rtol=1e-4)


def test_layer_deeplift_shapes_and_finiteness():
    model = create_model("resnet10", num_classes=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    attr = layer_deeplift(model, variables, x, 2, layer="layer4")
    assert attr.shape == (2, 2, 512)
    assert np.all(np.isfinite(np.asarray(attr)))
    attr_in = deeplift(model, variables, x, 2)
    assert attr_in.shape == (64, 64, 3)
    assert np.all(np.isfinite(np.asarray(attr_in)))

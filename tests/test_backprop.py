"""Backprop attribution variants: relu-override mechanics + saliency outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.explain.backprop import (
    deconvnet,
    gradient_saliency,
    guided_backprop,
    linear_approx,
)
from scouter_tpu.models import create_model
from scouter_tpu.models.act import deconvnet_relu, guided_relu, override_relu, relu


class TestModifiedRelus:
    def test_forward_identical(self):
        x = jnp.asarray([-1.0, 0.0, 2.0])
        np.testing.assert_array_equal(deconvnet_relu(x), jax.nn.relu(x))
        np.testing.assert_array_equal(guided_relu(x), jax.nn.relu(x))

    def test_deconvnet_backward(self):
        # d/dx sum(relu(x)) with deconvnet rule: passes relu(g)=1 regardless of x sign
        g = jax.grad(lambda x: deconvnet_relu(x).sum())(jnp.asarray([-1.0, 2.0]))
        np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0])
        g2 = jax.grad(lambda x: (-deconvnet_relu(x)).sum())(jnp.asarray([2.0]))
        np.testing.assert_array_equal(np.asarray(g2), [0.0])  # negative grads blocked

    def test_guided_backward(self):
        g = jax.grad(lambda x: guided_relu(x).sum())(jnp.asarray([-1.0, 2.0]))
        np.testing.assert_array_equal(np.asarray(g), [0.0, 1.0])  # input gate too

    def test_override_context(self):
        x = jnp.asarray([-3.0, 3.0])
        g_plain = jax.grad(lambda v: relu(v).sum())(x)
        with override_relu(deconvnet_relu):
            g_over = jax.grad(lambda v: relu(v).sum())(x)
        np.testing.assert_array_equal(np.asarray(g_plain), [0.0, 1.0])
        np.testing.assert_array_equal(np.asarray(g_over), [1.0, 1.0])


@pytest.fixture(scope="module")
def setup():
    model = create_model("resnet10", num_classes=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


class TestSaliencyMethods:
    def test_gradient(self, setup):
        model, variables, x = setup
        s = gradient_saliency(model, variables, x, 1)
        assert s.shape == (64, 64)
        assert np.all(np.asarray(s) >= 0)

    def test_deconvnet_and_guided_differ_from_gradient(self, setup):
        model, variables, x = setup
        s0 = np.asarray(gradient_saliency(model, variables, x, 1))
        s1 = np.asarray(deconvnet(model, variables, x, 1))
        s2 = np.asarray(guided_backprop(model, variables, x, 1))
        assert s1.shape == s2.shape == (64, 64)
        assert np.abs(s0 - s1).max() > 0
        assert np.abs(s1 - s2).max() > 0

    def test_linear_approx_input_and_layer(self, setup):
        model, variables, x = setup
        s = linear_approx(model, variables, x, 0)
        assert s.shape == (64, 64)
        s4 = linear_approx(model, variables, x, 0, saliency_layer="layer4")
        assert s4.shape == (2, 2)

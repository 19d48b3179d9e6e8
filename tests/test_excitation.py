"""Excitation backprop tests: EBP rule math + end-to-end on a tiny backbone."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.explain.excitation import (
    _ebp_add,
    _ebp_linear_call,
    _straight_through,
    contrastive_excitation_backprop,
    ebp_mean,
    ebp_rules,
    excitation_backprop,
)
from scouter_tpu.models import create_model


class TestRules:
    def test_linear_rule_matches_formula(self):
        # f(x) = x @ W with mixed-sign W; EBP: p' = x * (W+ @ (p / (x @ W+)))
        x = jnp.asarray([[1.0, 2.0, 3.0]])
        w = jnp.asarray([[1.0, -1.0], [0.5, 2.0], [-2.0, 1.0]])
        dn = (((1,), (0,)), ((), ()))

        def f(x, w):
            return _ebp_linear_call(jax.lax.dot_general, x, w, (dn,), {})

        p = jnp.asarray([[1.0, 1.0]])
        g = jax.grad(lambda x_: jnp.sum(f(x_, w) * p))(x)
        w_pos = jnp.maximum(w, 0)
        z = x @ w_pos
        expected = x * ((p / (z + 1e-20)) @ w_pos.T)
        np.testing.assert_allclose(np.asarray(g), np.asarray(expected), rtol=1e-5)
        # relevance is conserved: sum(p') == sum(p) when all inputs positive
        np.testing.assert_allclose(float(g.sum()), float(p.sum()), rtol=1e-5)

    def test_eltwise_rule_splits_by_contribution(self):
        a, b = jnp.asarray([3.0]), jnp.asarray([1.0])
        ga, gb = jax.grad(lambda a_, b_: (_ebp_add(a_, b_) * 4.0).sum(), argnums=(0, 1))(a, b)
        np.testing.assert_allclose(np.asarray(ga), [3.0])  # 3/4 * 4
        np.testing.assert_allclose(np.asarray(gb), [1.0])

    def test_straight_through_bn(self):
        g = jax.grad(lambda x: _straight_through(x, x * 5.0).sum())(jnp.ones((3,)))
        np.testing.assert_allclose(np.asarray(g), 1.0)  # identity, not 5

    def test_ebp_mean_conserves(self):
        x = jnp.asarray([[1.0, 3.0]])
        g = jax.grad(lambda x_: (ebp_mean(x_, (1,)) * 2.0).sum())(x)
        np.testing.assert_allclose(float(g.sum()), 2.0, rtol=1e-5)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def setup(self):
        model = create_model("resnet10", num_classes=4)
        x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)))
        variables = model.init(jax.random.PRNGKey(0), x)
        return model, variables, x

    def test_excitation_backprop(self, setup):
        model, variables, x = setup
        sal = excitation_backprop(model, variables, x, 1, saliency_layer="layer3")
        assert sal.shape == (4, 4)
        assert np.all(np.isfinite(np.asarray(sal)))

    def test_contrastive(self, setup):
        model, variables, x = setup
        sal = contrastive_excitation_backprop(
            model, variables, x, 0, saliency_layer="layer2", contrast_layer="layer4"
        )
        assert sal.shape == (8, 8)
        assert np.all(np.asarray(sal) >= 0)  # clamped

    def test_context_restores_primitives(self, setup):
        import jax.lax as lax

        plain = lax.conv_general_dilated
        with ebp_rules():
            assert lax.conv_general_dilated is not plain
        assert lax.conv_general_dilated is plain


class TestResidualHookCoverage:
    """The EBP eltwise-sum rule (excitation_backprop.py:459-502) requires skip
    connections to route through models/act.residual_add. Verify the hook is
    engaged across families, not just ResNet."""

    @pytest.mark.parametrize("name,size", [
        ("efficientnet_b0", 64), ("dla34", 64), ("seresnet18", 64),
        ("xception", 96), ("gluon_xception65", 96),
    ])
    def test_families_route_skips_through_hook(self, name, size):
        import jax
        import jax.numpy as jnp

        from scouter_tpu.models import create_model
        from scouter_tpu.models.act import override_residual_add

        model = create_model(name, num_classes=3)
        x = jnp.zeros((1, size, size, 3))
        variables = model.init(jax.random.PRNGKey(0), x)

        calls = []

        def recording_add(a, b):
            calls.append(a.shape)
            return a + b

        with override_residual_add(recording_add):
            model.apply(variables, x)
        assert len(calls) > 0, f"{name} skips bypass the residual_add hook"

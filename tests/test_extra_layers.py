"""Remaining timm layer-library members (no entrypoint exercises them;
VERDICT round-1 missing item 5): CBAM, circular ECA, MedianPool,
SplitBatchNorm, test-time pool — each parity-tested against the reference's
own vendored layer classes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.models import create_model, torch_state_dict_to_variables
from scouter_tpu.models.extra_layers import (
    CbamModule,
    Ceca,
    LightCbamModule,
    SplitBatchNorm,
    adaptive_avgmax_pool,
    create_attn,
    median_pool2d,
    test_time_pool as _test_time_pool,
)

from test_models import install_reference_stubs, _make_ref_model


@pytest.fixture(scope="module", autouse=True)
def stubs():
    install_reference_stubs()


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


class TestCbam:
    @pytest.mark.parametrize("light", [False, True])
    def test_matches_reference(self, light):
        import torch
        from timm.models.layers.cbam import CbamModule as RefCbam
        from timm.models.layers.cbam import LightCbamModule as RefLightCbam

        torch.manual_seed(0)
        ref = (RefLightCbam if light else RefCbam)(32)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        mod = (LightCbamModule if light else CbamModule)(32)
        x = np.random.RandomState(0).randn(2, 32, 10, 10).astype(np.float32)
        with torch.no_grad():
            want = _nhwc(ref(torch.from_numpy(x)))
        got = np.asarray(mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestCeca:
    def test_matches_reference(self):
        import torch
        from timm.models.layers.eca import CecaModule as RefCeca

        torch.manual_seed(1)
        ref = RefCeca(64)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        mod = Ceca(64)
        x = np.random.RandomState(1).randn(2, 64, 6, 6).astype(np.float32)
        with torch.no_grad():
            want = _nhwc(ref(torch.from_numpy(x)))
        got = np.asarray(mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


class TestMedianPool:
    @pytest.mark.parametrize("kwargs", [
        dict(kernel_size=3, stride=1, padding=1),
        dict(kernel_size=3, stride=2, same=True),
        dict(kernel_size=5, stride=1, same=True),
    ])
    def test_matches_reference(self, kwargs):
        import torch
        from timm.models.layers.median_pool import MedianPool2d

        ref = MedianPool2d(**kwargs)
        x = np.random.RandomState(2).randn(1, 3, 9, 11).astype(np.float32)
        with torch.no_grad():
            want = _nhwc(ref(torch.from_numpy(x)))
        got = np.asarray(median_pool2d(jnp.asarray(x.transpose(0, 2, 3, 1)), **kwargs))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


class TestSplitBatchNorm:
    def test_training_forward_matches_reference(self):
        import torch
        from timm.models.layers.split_batchnorm import SplitBatchNorm2d

        torch.manual_seed(3)
        ref = SplitBatchNorm2d(8, num_splits=2)
        ref.train()
        # randomize affine so the check is non-trivial
        ref.weight.data.normal_(1.0, 0.2)
        ref.bias.data.normal_(0, 0.1)
        for aux in ref.aux_bn:
            aux.weight.data.normal_(1.0, 0.2)
            aux.bias.data.normal_(0, 0.1)

        # variables: main BN params flat (bn), aux under aux_bn_i
        def bn_vars(m):
            return (dict(scale=m.weight.detach().numpy(), bias=m.bias.detach().numpy()),
                    dict(mean=m.running_mean.numpy().copy(), var=m.running_var.numpy().copy()))
        p0, s0 = bn_vars(ref)
        p1, s1 = bn_vars(ref.aux_bn[0])
        variables = {"params": {"bn": p0, "aux_bn_0": p1},
                     "batch_stats": {"bn": s0, "aux_bn_0": s1}}

        x = np.random.RandomState(3).randn(4, 8, 5, 5).astype(np.float32)
        want = _nhwc(ref(torch.from_numpy(x)))
        mod = SplitBatchNorm(num_splits=2)
        got, mutated = mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
        # running stats updated per split (torch momentum 0.1 == flax 0.9)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["bn"]["mean"]),
            ref.running_mean.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["aux_bn_0"]["mean"]),
            ref.aux_bn[0].running_mean.numpy(), rtol=1e-4, atol=1e-5)

    def test_eval_uses_main_bn_only(self):
        mod = SplitBatchNorm(num_splits=2)
        x = jnp.asarray(np.random.RandomState(4).randn(4, 5, 5, 8), jnp.float32)
        v = mod.init(jax.random.PRNGKey(0), x, train=True)
        out = mod.apply(v, x, train=False)
        assert out.shape == x.shape


class TestTestTimePool:
    def test_matches_reference_head(self):
        import torch
        from timm.models.layers.test_time_pool import TestTimePoolHead

        torch.manual_seed(5)
        base = _make_ref_model("resnet18", num_classes=6)
        base.eval()
        variables = torch_state_dict_to_variables(base.state_dict())
        model = create_model("resnet18", num_classes=6)
        head = TestTimePoolHead(base, original_pool=7)
        head.eval()
        x = np.random.RandomState(5).randn(1, 256, 256, 3).astype(np.float32)
        with torch.no_grad():
            want = head(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(_test_time_pool(model, variables, jnp.asarray(x), 6,
                                        original_pool=7))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestCreateAttnInResNet:
    def test_cbam_resnet_runs(self):
        model = create_model("resnet10", num_classes=4, attn="cbam")
        x = jnp.zeros((1, 64, 64, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        assert model.apply(v, x).shape == (1, 4)

    def test_invalid_attn_raises(self):
        with pytest.raises(ValueError):
            create_attn("nope", 8)

    def test_avgmax_pool(self):
        x = jnp.asarray(np.random.RandomState(6).randn(2, 4, 4, 3), jnp.float32)
        out = np.asarray(adaptive_avgmax_pool(x))
        want = 0.5 * (np.mean(np.asarray(x), (1, 2)) + np.max(np.asarray(x), (1, 2)))
        np.testing.assert_allclose(out, want, rtol=1e-6)


class TestSpaceToDepthStem:
    """SpaceToDepthStemConv must be arithmetically exact vs the strided conv."""

    def _compare(self, k, h, cin=3):
        import jax
        import jax.numpy as jnp

        from scouter_tpu.models.layers import SpaceToDepthStemConv

        rng = np.random.RandomState(k)
        x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32))
        mod = SpaceToDepthStemConv(16, k)
        variables = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(variables, x)
        p = (k - 1) // 2
        ref = jax.lax.conv_general_dilated(
            x, variables["params"]["kernel"], (2, 2), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_k3_even(self):
        self._compare(3, 32)

    def test_k7_even(self):
        self._compare(7, 32)

    def test_k3_odd_falls_back(self):
        self._compare(3, 33)

    def test_whole_model_equivalence(self):
        import jax
        import jax.numpy as jnp

        from scouter_tpu.models import create_model

        x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32))
        plain = create_model("resnest26d", num_classes=5)
        s2d = create_model("resnest26d", num_classes=5, s2d_stem=True)
        variables = plain.init(jax.random.PRNGKey(0), x)
        a = plain.apply(variables, x)
        b = s2d.apply(variables, x)  # same params by construction
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

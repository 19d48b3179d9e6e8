"""Backprop-family parity against the reference's own vendored torchray
implementations (gradient/deconvnet/guided_backprop/linear_approx/grad_cam/
excitation_backprop) run on the converted torch model."""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.models import create_model, torch_state_dict_to_variables
from test_models import _make_ref_model

REFERENCE = "/root/reference"


def _stub_torchvision_models():
    """torchray.excitation_backprop imports torchvision ResNet classes for its
    (torchvision-only) isinstance checks; stub them with never-matching types."""
    tvm = sys.modules.setdefault("torchvision.models",
                                 types.ModuleType("torchvision.models"))
    if "torchvision.models.resnet" in sys.modules:
        return
    tvr = types.ModuleType("torchvision.models.resnet")

    class _Never:
        pass

    tvr.ResNet = tvr.Bottleneck = tvr.BasicBlock = _Never
    tvm.resnet = tvr
    sys.modules["torchvision.models.resnet"] = tvr
    sys.modules["torchvision"].models = tvm


@pytest.fixture(scope="module")
def setup():
    import torch

    torch.manual_seed(3)
    ref = _make_ref_model("resnet18", num_classes=6)
    ref.eval()
    # Perturb BN stats so no activation is exactly zero at init: EBP's
    # proportional relevance split hits 0/0 on degenerate random-init nets
    # (the reference NaNs identically there, which is a vacuous comparison).
    with torch.no_grad():
        g = torch.Generator().manual_seed(7)
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.bias.uniform_(0.05, 0.2, generator=g)
                m.running_mean.uniform_(-0.1, 0.1, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)
    variables = torch_state_dict_to_variables(ref.state_dict())
    model = create_model("resnet18", num_classes=6)
    x = np.random.RandomState(3).randn(1, 64, 64, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    _stub_torchvision_models()
    return ref, model, variables, x, xt


def _relmax(want, got):
    want, got = np.asarray(want, np.float64), np.asarray(got, np.float64)
    assert not np.isnan(want).any() and not np.isnan(got).any()
    return np.abs(want - got).max() / (np.abs(want).max() + 1e-12)


class TestBackpropParity:
    def test_gradient(self, setup):
        import torch
        from torchray.attribution.gradient import gradient as tr_gradient

        from scouter_tpu.explain.backprop import gradient_saliency

        ref, model, variables, x, xt = setup
        want = tr_gradient(ref, xt.clone().requires_grad_(True), 2).detach().numpy()[0, 0]
        got = gradient_saliency(model, variables, jnp.asarray(x), 2)
        assert _relmax(want, got) < 1e-4

    def test_deconvnet(self, setup):
        from torchray.attribution.deconvnet import deconvnet as tr_deconvnet

        from scouter_tpu.explain.backprop import deconvnet

        ref, model, variables, x, xt = setup
        want = tr_deconvnet(ref, xt.clone().requires_grad_(True), 2).detach().numpy()[0, 0]
        got = deconvnet(model, variables, jnp.asarray(x), 2)
        assert _relmax(want, got) < 1e-4

    def test_guided_backprop(self, setup):
        from torchray.attribution.guided_backprop import guided_backprop as tr_guided

        from scouter_tpu.explain.backprop import guided_backprop

        ref, model, variables, x, xt = setup
        want = tr_guided(ref, xt.clone().requires_grad_(True), 2).detach().numpy()[0, 0]
        got = guided_backprop(model, variables, jnp.asarray(x), 2)
        assert _relmax(want, got) < 1e-4

    def test_linear_approx(self, setup):
        from torchray.attribution.linear_approx import linear_approx as tr_linear

        from scouter_tpu.explain.backprop import linear_approx

        ref, model, variables, x, xt = setup
        want = tr_linear(ref, xt.clone().requires_grad_(True), 2,
                         saliency_layer="layer4").detach().numpy()[0, 0]
        got = linear_approx(model, variables, jnp.asarray(x), 2, saliency_layer="layer4")
        assert _relmax(want, got) < 1e-4

    def test_grad_cam(self, setup):
        from torchray.attribution.grad_cam import grad_cam as tr_gradcam

        from scouter_tpu.explain.cam import gradcam

        ref, model, variables, x, xt = setup
        want = tr_gradcam(ref, xt, 2, saliency_layer="layer4").detach().numpy()[0, 0]
        got = np.maximum(np.asarray(
            gradcam(model, variables, jnp.asarray(x), 2, normalized=False)), 0)
        assert _relmax(want, got) < 1e-4


def _rewrite_timm_resnet(ref):
    """update_resnet (excitation_backprop.py:182-252) adapted to the vendored
    timm BasicBlock attribute names (act1/act2 instead of relu) so the skip
    connection routes through the patched EltwiseSum."""
    from torchray.attribution import excitation_backprop as tr_mod
    from timm.models.resnet import BasicBlock as TimmBasic

    def timm_basic_forward(self, x):
        out = self.conv1(x)
        out = self.bn1(out)
        out = self.act1(out)
        out = self.conv2(out)
        out = self.bn2(out)
        residual = self.downsample(x) if self.downsample is not None else x
        out = self.skip(out, residual)
        return self.act2(out)

    for m in ref.modules():
        if isinstance(m, TimmBasic):
            m.skip = tr_mod.EltwiseSum()
            m.forward = timm_basic_forward.__get__(m)


class TestExcitationParity:
    def test_excitation_backprop(self, setup):
        from torchray.attribution import excitation_backprop as tr_mod

        from scouter_tpu.explain.excitation import excitation_backprop

        ref, model, variables, x, xt = setup
        _rewrite_timm_resnet(ref)
        for layer in ("layer4", "layer3"):
            want = tr_mod.excitation_backprop(
                ref, xt, 2, saliency_layer=layer).detach().numpy()[0, 0]
            got = excitation_backprop(model, variables, jnp.asarray(x), 2,
                                      saliency_layer=layer)
            assert _relmax(want, got) < 1e-4, layer

    def test_contrastive_excitation_backprop(self, setup):
        from torchray.attribution import excitation_backprop as tr_mod

        from scouter_tpu.explain.excitation import contrastive_excitation_backprop

        ref, model, variables, x, xt = setup
        _rewrite_timm_resnet(ref)
        want = tr_mod.contrastive_excitation_backprop(
            ref, xt, 2, saliency_layer="layer2",
            contrast_layer="layer4").detach().numpy()[0, 0]
        got = contrastive_excitation_backprop(
            model, variables, jnp.asarray(x), 2,
            saliency_layer="layer2", contrast_layer="layer4")
        assert _relmax(want, got) < 1e-3

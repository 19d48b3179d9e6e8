"""Zoo completeness (round 2): every reference timm entrypoint exists, and the
newly added families match the reference's own vendored models numerically.

Covers VERDICT.md round-1 item 2 ("close the 174 missing timm entrypoints"):
MixedConv/MixNet, CondConv, MobileNetV2, MNASNet/FBNet/SPNASNet, EfficientNet
edge/lite/B6-B8, tf_ SAME-pad twins, MobileNetV3 small/minimal/rw, BlurPool
(resnetblur/densenetblur), tiered stems, gluon/senet154 on the universal
ResNet, ResNeSt ablations (radix 1/4, cardinality 2/4), VoVNet eca/evos/iabn,
DLA-X, RegNet 040-320, SelecSLS42, gluon_xception71, and the weight-alias
entrypoints (tv_/ig_/ssl_/swsl_/...).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from scouter_tpu.models import create_model, list_models, torch_state_dict_to_variables

from test_models import _make_ref_model, install_reference_stubs


def _patch_condconv_forward():
    """The vendored CondConv2d.forward uses .view() on a tensor layout modern
    torch rejects (cond_conv2d.py:94 under torch>=1.7). Replace with the same
    math via .reshape() so the REFERENCE model can run; our implementation is
    unaffected."""
    import torch
    import torch.nn.functional as F
    from timm.models.layers import cond_conv2d as cc

    def fwd(self, x, routing_weights):
        B, C, H, W = x.shape
        weight = torch.matmul(routing_weights, self.weight)
        weight = weight.reshape(
            (B * self.out_channels, self.in_channels // self.groups) + self.kernel_size)
        x = x.reshape(1, B * C, H, W)
        if self.dynamic_padding:
            out = cc.conv2d_same(x, weight, None, stride=self.stride, padding=self.padding,
                                 dilation=self.dilation, groups=self.groups * B)
        else:
            out = F.conv2d(x, weight, None, stride=self.stride, padding=self.padding,
                           dilation=self.dilation, groups=self.groups * B)
        return out.permute([1, 0, 2, 3]).reshape(
            B, self.out_channels, out.shape[-2], out.shape[-1])

    cc.CondConv2d.forward = fwd


def test_registry_superset_of_reference():
    """list_models() must contain every one of the reference's 295 entrypoints
    (timm/models/registry.py registry, VERDICT round-1 gap)."""
    install_reference_stubs()
    import timm.models  # noqa: F401  (registers reference entrypoints)
    import timm.models.registry as ref_registry

    ref = set(ref_registry._model_entrypoints.keys())
    ours = set(list_models())
    missing = sorted(ref - ours)
    assert not missing, f"missing {len(missing)} entrypoints: {missing[:20]}"


# one representative per new mechanism introduced in round 2
NEW_FAMILY_CASES = [
    "mnasnet_100",               # plain mnasnet-b1 arch
    "semnasnet_100",             # mnasnet-a1 with SE
    "mobilenetv2_110d",          # fix_stem_head + depth scaling + relu6
    "fbnetc_100",                # multi-def stages
    "spnasnet_100",
    "efficientnet_es",           # EdgeResidual ('er') blocks + fake_in_chs
    "efficientnet_lite0",        # fix_first_last + relu6, no SE
    "efficientnet_b6",           # large-multiplier scaling path
    "mixnet_s",                  # MixedConv2d dw + grouped 1x1 (a1.1/p1.1)
    "tf_efficientnet_b0",        # SAME padding + bn_eps 1e-3 twin
    "tf_mixnet_m",               # SAME + mixed conv + depth_trunc='round'
    "mobilenetv3_rw",            # head_bias=False, SE divisor 1 / block act
    "mobilenetv3_small_100",     # small arch, num_features 1024
    "tf_mobilenetv3_large_minimal_100",  # relu minimal arch, SAME
    "resnetblur18",              # BlurPool anti-aliasing (stem + blocks)
    "seresnext26tn_32x4d",       # deep_tiered_narrow stem
    "gluon_senet154",            # reduce_first=2 + 3x3 downsample convs
    "resnest50d_1s4x24d",        # radix-1 sigmoid split-attn, cardinality 4
    "resnest50d_4s2x40d",        # radix-4 softmax with cardinality 2
    "eca_vovnet39b",             # eca attention in OSA blocks
    "ese_vovnet19b_slim_dw",     # depthwise OSA + slim widths
    "ese_vovnet39b_evos",        # EvoNormSample2d norm-act
    "gluon_xception71",          # deep entry flow (block2 Sequential)
    "selecsls42",                # non-b head config
    "densenetblur121d",          # deep stem + BlurPool stem pool
    "dla46x_c",                  # DLA-X cardinality blocks
    "regnetx_040",               # larger width schedule entries
    "seresnext101_32x4d",        # SENet-family addition
]


class TestNewFamilyTorchParity:
    @pytest.mark.parametrize("name", NEW_FAMILY_CASES)
    def test_forward_matches_torch(self, name):
        import torch

        torch.manual_seed(11)
        ref = _make_ref_model(name, num_classes=6)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        model = create_model(name, num_classes=6)
        x = np.random.RandomState(11).randn(1, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(model.apply(variables, jnp.asarray(x)))
        rel = np.abs(out - ref_out) / (np.abs(ref_out) + 1e-3)
        assert rel.max() < 1e-3, f"{name}: rel {rel.max():.2e}"

    def test_condconv_matches_torch(self):
        """CondConv routing + expert-mixed kernels (cond_conv2d.py:34-106,
        efficientnet_blocks.py:285-339)."""
        import torch

        install_reference_stubs()
        _patch_condconv_forward()
        torch.manual_seed(12)
        ref = _make_ref_model("efficientnet_cc_b0_4e", num_classes=6)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        model = create_model("efficientnet_cc_b0_4e", num_classes=6)
        x = np.random.RandomState(12).randn(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(model.apply(variables, jnp.asarray(x)))
        rel = np.abs(out - ref_out) / (np.abs(ref_out) + 1e-3)
        assert rel.max() < 1e-3, rel.max()


class TestAliasEntrypoints:
    """Weight-alias entrypoints must build the same architecture as the base
    model (identical param tree shapes)."""

    @pytest.mark.parametrize("alias,base", [
        ("tv_resnet50", "resnet50"),
        ("ssl_resnext50_32x4d", "resnext50_32x4d"),
        ("swsl_resnet18", "resnet18"),
        ("ig_resnext101_32x8d", "resnext101_32x8d"),
        ("tv_densenet121", "densenet121"),
        ("gluon_inception_v3", "inception_v3"),
        ("tresnet_m_448", "tresnet_m"),
        ("mnasnet_b1", "mnasnet_100"),
        ("mnasnet_a1", "semnasnet_100"),
        ("efficientnet_b2a", "efficientnet_b2"),
    ])
    def test_alias_same_architecture(self, alias, base):
        import jax

        a = create_model(alias, num_classes=5)
        b = create_model(base, num_classes=5)
        x = jnp.zeros((1, 64, 64, 3))
        va = jax.eval_shape(lambda: a.init(jax.random.PRNGKey(0), x))
        vb = jax.eval_shape(lambda: b.init(jax.random.PRNGKey(0), x))
        sa = jax.tree_util.tree_map(lambda t: t.shape, va)
        sb = jax.tree_util.tree_map(lambda t: t.shape, vb)
        assert sa == sb

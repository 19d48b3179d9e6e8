"""Backbone zoo tests: shapes, feature-map sizes, and torch-weight parity.

The parity tests build the *reference's own* vendored timm model (imported from
/root/reference at test time), convert its random-init state_dict with
models/convert.py, and require matching forward outputs — the strongest
correctness check available without network access.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.models import (
    SlotModel,
    create_model,
    list_models,
    torch_state_dict_to_variables,
)

REFERENCE = "/root/reference"


def _stub_module(name, **attrs):
    import types

    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def install_reference_stubs():
    """Install EVERY dependency stub the vendored reference needs, so any test
    importing reference modules (timm/torchcam/torchray) is order-independent.

    Critical: ``timm/models/layers/inplace_abn.py`` binds its function at first
    import — if the inplace_abn stub isn't present THEN, a raising placeholder
    is cached for the whole session and later tresnet parity tests fail. Always
    call this before importing anything from /root/reference.
    """
    import collections.abc

    tv = _stub_module("torchvision")
    tf = _stub_module("torchvision.transforms")
    _stub_module("torchvision.transforms.functional")
    tf.Normalize = getattr(tf, "Normalize", object)
    tf.Compose = getattr(tf, "Compose", object)
    tv.transforms = tf
    ds = _stub_module("torchvision.datasets",
                      VOCDetection=type("V", (object,), {}),
                      CocoDetection=type("C", (object,), {}),
                      ImageFolder=type("IF", (object,), {}))
    tv.datasets = ds
    # torch 1.6-era shim removed from modern torch
    _stub_module("torch._six", container_abcs=collections.abc,
                 int_classes=int, string_classes=str)
    # external inplace_abn package (used by tresnet): eval-mode python equivalent
    import torch.nn.functional as F

    def _iabn(x, weight, bias, running_mean, running_var, training=True,
              momentum=0.1, eps=1e-5, activation="leaky_relu", activation_param=0.01):
        y = F.batch_norm(x, running_mean, running_var, weight, bias, training, momentum, eps)
        if activation == "leaky_relu":
            y = F.leaky_relu(y, activation_param)
        elif activation == "elu":
            y = F.elu(y, activation_param)
        return y

    fns = _stub_module("inplace_abn.functions", inplace_abn=_iabn, inplace_abn_sync=_iabn)
    _stub_module("inplace_abn", functions=fns)
    # skimage used by torchcam.IBA.utils
    sk = _stub_module("skimage")
    skt = _stub_module("skimage.transform", resize=lambda *a, **k: a[0])
    sk.transform = skt
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def _make_ref_model(name, num_classes=10, **kw):
    """Instantiate the vendored timm model from the reference repo.

    The environment has no torchvision; the vendored timm only touches it in its
    (unused-by-SCOUTER) data pipeline, so a stub suffices for model creation.
    """
    install_reference_stubs()
    from timm.models import create_model as ref_create  # noqa

    return ref_create(name, pretrained=False, num_classes=num_classes, **kw)


class TestZoo:
    def test_registry_lists_reference_backbones(self):
        names = list_models()
        for required in ("resnet18", "resnest26d", "resnest50d"):
            assert required in names

    @pytest.mark.parametrize(
        "name,expansion", [("resnet18", 1), ("resnet50", 4), ("resnest26d", 4)]
    )
    def test_forward_shapes(self, name, expansion):
        model = create_model(name, num_classes=7)
        x = jnp.zeros((2, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        logits = model.apply(variables, x)
        assert logits.shape == (2, 7)
        feats = model.apply(variables, x, features_only=True)
        assert feats.shape == (2, 2, 2, 512 * expansion)

    def test_260px_gives_9x9_features(self):
        # The slot head depends on the 9x9 map at 260px (slot_model.py:61-64)
        model = create_model("resnet18", num_classes=10)
        x = jnp.zeros((1, 260, 260, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x, features_only=True)
        assert feats.shape == (1, 9, 9, 512)

    def test_mnist_stem(self):
        model = create_model("resnet18", num_classes=10, mnist_stem=True, in_chans=1)
        x = jnp.zeros((1, 260, 260, 1))
        variables = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x, features_only=True)
        assert feats.shape == (1, 9, 9, 512)


class TestTorchParity:
    @pytest.mark.parametrize("name,size", [("resnet18", 64), ("resnet26d", 64)])
    def test_backbone_forward_matches_torch(self, name, size):
        import torch

        torch.manual_seed(0)
        ref = _make_ref_model(name, num_classes=10)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        model = create_model(name, num_classes=10)

        x = np.random.RandomState(0).randn(2, size, size, 3).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        out = model.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=1e-3, atol=1e-3)

    def test_resnest26d_forward_matches_torch(self):
        import torch

        torch.manual_seed(1)
        ref = _make_ref_model("resnest26d", num_classes=5)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        model = create_model("resnest26d", num_classes=5)

        x = np.random.RandomState(1).randn(2, 96, 96, 3).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        out = model.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("name", ["efficientnet_b0", "mobilenetv3_large_100",
                                      "seresnet18", "seresnext26_32x4d",
                                      "res2net50_26w_4s", "skresnet18",
                                      "seresnext26d_32x4d", "ecaresnet18"])
    def test_efficientnet_family_matches_torch(self, name):
        import torch

        torch.manual_seed(5)
        ref = _make_ref_model(name, num_classes=6)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        model = create_model(name, num_classes=6)
        x = np.random.RandomState(5).randn(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        out = model.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("name", ["xception", "ese_vovnet19b_dw", "inception_v3",
                                      "selecsls42b", "dpn68b", "regnety_004",
                                      "inception_v4", "gluon_xception65", "dla34",
                                      "hrnet_w18_small", "tresnet_m"])
    def test_other_families_match_torch(self, name):
        import torch

        torch.manual_seed(6)
        ref = _make_ref_model(name, num_classes=6)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        model = create_model(name, num_classes=6)
        size = 299 if name == "inception_v3" else 96
        x = np.random.RandomState(6).randn(1, size, size, 3).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(model.apply(variables, jnp.asarray(x)))
        # untrained deep nets can have huge activation magnitudes; compare
        # relative error
        rel = np.abs(out - ref_out) / (np.abs(ref_out) + 1e-3)
        assert rel.max() < 1e-3, rel.max()

    def test_densenet121_matches_torch(self):
        import torch

        torch.manual_seed(4)
        ref = _make_ref_model("densenet121", num_classes=7)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        model = create_model("densenet121", num_classes=7)
        x = np.random.RandomState(4).randn(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        out = model.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=1e-3, atol=1e-3)

    def test_features_match_torch_resnet18(self):
        import torch

        torch.manual_seed(2)
        ref = _make_ref_model("resnet18", num_classes=10)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        model = create_model("resnet18", num_classes=10)

        x = np.random.RandomState(2).randn(1, 65, 65, 3).astype(np.float32)  # odd size
        with torch.no_grad():
            ref_feats = ref.forward_features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        feats = model.apply(variables, jnp.asarray(x), features_only=True)
        np.testing.assert_allclose(
            np.asarray(feats), ref_feats.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-3
        )

class TestPrunedModels:
    """timm adapt_model_from_file capability (helpers.py:146-196): pruned
    variants rebuilt from the conv out-channel tables in models/pruned_data."""

    @pytest.mark.parametrize("name", ["ecaresnet50d_pruned", "efficientnet_b1_pruned"])
    def test_pruned_forward_matches_torch(self, name):
        import torch

        torch.manual_seed(7)
        ref = _make_ref_model(name, num_classes=6)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        model = create_model(name, num_classes=6)
        x = np.random.RandomState(7).randn(1, 96, 96, 3).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(model.apply(variables, jnp.asarray(x)))
        rel = np.abs(out - ref_out) / (np.abs(ref_out) + 1e-3)
        assert rel.max() < 1e-3, rel.max()

    def test_pruned_param_shapes(self):
        model = create_model("ecaresnet101d_pruned", num_classes=3)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        # widths from the public pruning table; fc in-features follows
        assert v["params"]["fc"]["kernel"].shape[0] != 2048

class TestPretrainedAdjustments:
    """timm load_pretrained weight adjustments (helpers.py:68-101)."""

    def test_one_channel_collapse_and_classifier_discard(self):
        import torch

        torch.manual_seed(9)
        ref = _make_ref_model("resnet18", num_classes=1000)
        ref.eval()
        from scouter_tpu.models import merge_variables, prepare_pretrained_state_dict

        sd = prepare_pretrained_state_dict(
            ref.state_dict(), in_chans=1, num_classes=7,
            pretrained_classes=1000, first_conv="conv1", classifier="fc")
        assert "fc.weight" not in sd
        loaded = torch_state_dict_to_variables(sd)

        model = create_model("resnet18", num_classes=7, in_chans=1)
        x = np.random.RandomState(9).randn(1, 64, 64, 1).astype(np.float32)
        init = model.init(jax.random.PRNGKey(3), jnp.asarray(x))
        variables = merge_variables(init, loaded)
        # fc kept from init (shape 7), conv1 collapsed to 1 channel
        assert variables["params"]["fc"]["kernel"].shape == (512, 7)
        assert variables["params"]["conv1"]["kernel"].shape[2] == 1

        # parity vs torch: same collapse, same head re-init copied over
        ref.conv1 = torch.nn.Conv2d(1, 64, 7, 2, 3, bias=False)
        missing = ref.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, strict=False)
        ref.fc = torch.nn.Linear(512, 7)
        with torch.no_grad():
            ref.fc.weight.copy_(torch.from_numpy(
                np.array(variables["params"]["fc"]["kernel"]).T))
            ref.fc.bias.copy_(torch.from_numpy(
                np.array(variables["params"]["fc"]["bias"])))
            ref.eval()
            ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(model.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-4)

    def test_background_class_strip(self):
        from scouter_tpu.models import prepare_pretrained_state_dict

        sd = {"fc.weight": np.ones((1001, 8)), "fc.bias": np.arange(1001.0)}
        out = prepare_pretrained_state_dict(
            sd, num_classes=1000, pretrained_classes=1001, classifier="fc")
        assert out["fc.weight"].shape == (1000, 8)
        assert out["fc.bias"][0] == 1.0

class TestPoolGradients:
    """Regression: avg_pool_ceil_exclude_pad must be reverse-differentiable
    (ResNeSt/ResNet-D downsample path during training)."""

    def test_ceil_pool_grad(self):
        from scouter_tpu.models.layers import avg_pool_ceil_exclude_pad

        x = jnp.arange(2 * 7 * 7 * 3, dtype=jnp.float32).reshape(2, 7, 7, 3)
        g = jax.grad(lambda v: (avg_pool_ceil_exclude_pad(v, 2, 2) ** 2).sum())(x)
        assert g.shape == x.shape
        assert bool(jnp.isfinite(g).all())

    def test_resnest_backward(self):
        model = create_model("resnest26d", num_classes=4)
        x = jnp.ones((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)

        def loss_fn(params):
            out = model.apply({**variables, "params": params}, x)
            return (out ** 2).sum()

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.isfinite(g).all()) for g in leaves)


class TestDilatedOutputStride:
    """output_stride 8/16 parity: dilated stages keep the 2x2 stride-1 avg
    pool in avg_down skips (downsample_avg, timm/models/resnet.py:292-306)
    and the conv-path downsample honors first_dilation — the round-3 review
    found both dropped when dilation > 1."""

    @pytest.mark.parametrize("name,output_stride", [("resnest26d", 8),
                                                    ("resnet50", 16)])
    def test_dilated_features_match_torch(self, name, output_stride):
        import torch

        torch.manual_seed(9)
        ref = _make_ref_model(name, num_classes=5, output_stride=output_stride)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        model = create_model(name, num_classes=5, output_stride=output_stride)
        x = np.random.RandomState(9).randn(1, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            ref_feats = ref.forward_features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        feats = model.apply(variables, jnp.asarray(x), features_only=True)
        assert feats.shape[1] == 64 // output_stride
        np.testing.assert_allclose(
            np.asarray(feats), ref_feats.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-3)


class TestHeadDropout:
    """drop_rate was accepted but silently ignored by every shell (round-3
    review): timm applies F.dropout before the classifier in training."""

    def test_dropout_active_in_training(self):
        model = create_model("resnet10", num_classes=8, drop_rate=0.5)
        x = jnp.asarray(np.random.RandomState(0).rand(4, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        eval_out = model.apply(variables, x)
        # training with two different dropout rngs -> different logits
        t1 = model.apply(variables, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})[0]
        t2 = model.apply(variables, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})[0]
        assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 1e-4
        # eval is deterministic and needs no rng
        np.testing.assert_array_equal(np.asarray(eval_out),
                                      np.asarray(model.apply(variables, x)))

    def test_train_step_supplies_dropout_rng(self):
        """The jitted train step must feed the 'dropout' rng so drop_rate
        models train without a missing-rng error."""
        from scouter_tpu.core import ScouterConfig
        from scouter_tpu.models import build_slot_model
        from scouter_tpu.train import create_train_state, make_train_step

        cfg = ScouterConfig(model="resnet10", dataset="MNIST", num_classes=5,
                            channel=512, use_slot=False, img_size=64,
                            batch_size=4, pre_trained=False, freeze_layers=0)
        model = build_slot_model(cfg, backbone_kwargs={"drop_rate": 0.3})
        x = jnp.zeros((4, 64, 64, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        state, tx = create_train_state(variables, 1e-3)
        step = make_train_step(model, tx, 1.0)
        batch = {"image": x, "label": jnp.zeros((4,), jnp.int32)}
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_pretrained_true_raises(self):
        with pytest.raises(ValueError, match="pretrained"):
            create_model("resnet18", pretrained=True)

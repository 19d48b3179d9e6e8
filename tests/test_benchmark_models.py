"""Pointing-game reference models (torchray/benchmark/models.py capability).

The published caffe checkpoints can't be downloaded in this environment, so
the oracle is a torch model built exactly as the reference patches torchvision
(ceil-mode pools, VGG classifier layout, biased conv1 + padding-0 stem pool +
stride-on-1x1 bottlenecks for resnet50 — models.py:50-151), fed a synthetic
checkpoint written in the caffe key layout that the converter must remap.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.explain.benchmark_models import (
    CaffeResNet50,
    CaffeVGG16,
    convert_caffe_checkpoint,
    get_model,
    get_transform,
)


def _torch_caffe_vgg16(num_classes=20):
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2, ceil_mode=True))  # caffe fixup
        else:
            layers += [nn.Conv2d(in_c, v, 3, padding=1), nn.ReLU()]
            in_c = v
    model = nn.Sequential()
    model.features = nn.Sequential(*layers)
    model.classifier = nn.Sequential(
        nn.Linear(512 * 7 * 7, 4096), nn.ReLU(), nn.Dropout(),
        nn.Linear(4096, 4096), nn.ReLU(), nn.Dropout(),
        nn.Linear(4096, num_classes))

    def forward(x):
        x = model.features(x)
        return model.classifier(x.flatten(1))

    model.forward = forward
    return model


def _torch_caffe_resnet50(num_classes=20):
    import torch
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, in_c, planes, stride=1, downsample=None):
            super().__init__()
            # caffe stride placement: on conv1 (models.py:119-121)
            self.conv1 = nn.Conv2d(in_c, planes, 1, stride=stride, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU()
            self.downsample = downsample

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + r)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=True)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, padding=0, ceil_mode=True)
            in_c = 64
            for i, (planes, blocks) in enumerate(
                    [(64, 3), (128, 4), (256, 6), (512, 3)], start=1):
                stride = 1 if i == 1 else 2
                ds = nn.Sequential(
                    nn.Conv2d(in_c, planes * 4, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(planes * 4))
                layer = [Bottleneck(in_c, planes, stride, ds)]
                layer += [Bottleneck(planes * 4, planes) for _ in range(1, blocks)]
                setattr(self, f"layer{i}", nn.Sequential(*layer))
                in_c = planes * 4
            self.fc = nn.Linear(2048, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for i in range(1, 5):
                x = getattr(self, f"layer{i}")(x)
            x = x.mean(dim=(2, 3))
            return self.fc(x)

    torch.manual_seed(0)
    net = Net()
    # randomize BN stats so conversion is non-trivially checked
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.normal_(0.5, 1.0)  # mixed signs for bn-fold tests
            m.bias.data.normal_(0, 0.1)
    return net


def _vgg_checkpoint(model):
    """state dict re-keyed the way the published caffe checkpoint is
    (classifier indices skip the dropouts; first conv stored BGR)."""
    remap = {"classifier.3": "classifier.2", "classifier.6": "classifier.4"}
    ckpt = {}
    for k, v in model.state_dict().items():
        for new, old in remap.items():
            if k.startswith(new):
                k = old + k[len(new):]
                break
        ckpt[k] = v.clone()
    ckpt["features.0.weight"] = ckpt["features.0.weight"][:, [2, 1, 0]]
    return ckpt


def _resnet_checkpoint(model):
    """state dict re-keyed like the caffe resnet dump: bn and downsample
    entries carry an extra Sequential index (undone by the reference's
    rename regexes, models.py:124-127); first conv stored BGR."""
    import re

    ckpt = {}
    for k, v in model.state_dict().items():
        if "num_batches_tracked" in k:
            continue
        m = re.match(r"(.*bn\d)\.(weight|bias|running_mean|running_var)$", k)
        if m:
            idx = "0" if m.group(2) in ("weight", "bias") else "1"
            k = f"{m.group(1)}.{idx}.{m.group(2)}"
        m = re.match(r"(.*downsample\.\d)\.(weight|bias|running_mean|running_var)$", k)
        if m:
            idx = "0" if m.group(2) in ("weight", "bias") else "1"
            k = f"{m.group(1)}.{idx}.{m.group(2)}"
        ckpt[k] = v.clone()
    ckpt["conv1.weight"] = ckpt["conv1.weight"][:, [2, 1, 0]]
    return ckpt


class TestCaffeVGG16:
    def test_matches_torch_oracle(self):
        import torch

        torch.manual_seed(1)
        ref = _torch_caffe_vgg16()
        ref.eval()
        variables = convert_caffe_checkpoint("vgg16", _vgg_checkpoint(ref))
        model = CaffeVGG16(num_classes=20)
        x = np.random.RandomState(1).randn(1, 224, 224, 3).astype(np.float32)
        with torch.no_grad():
            want = ref.forward(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_fully_conv_equals_dense_at_224(self):
        """_caffe_vgg16_to_fc parity: at 224px the 7x7 VALID conv classifier
        must reproduce flatten+Linear exactly."""
        import torch

        torch.manual_seed(2)
        ref = _torch_caffe_vgg16()
        variables = convert_caffe_checkpoint("vgg16", _vgg_checkpoint(ref))
        dense = CaffeVGG16(num_classes=20)
        fc = CaffeVGG16(num_classes=20, fully_conv=True)
        x = jnp.asarray(np.random.RandomState(2).randn(1, 224, 224, 3), jnp.float32)
        a = np.asarray(dense.apply(variables, x))
        b = np.asarray(fc.apply(variables, x))
        assert b.shape == (1, 1, 1, 20)
        np.testing.assert_allclose(a, b.reshape(1, 20), rtol=1e-4, atol=1e-4)

    def test_fully_conv_gives_spatial_map(self):
        model = CaffeVGG16(num_classes=20, fully_conv=True)
        x = jnp.zeros((1, 288, 288, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(v, x)
        assert out.shape[-1] == 20 and out.shape[1] > 1  # spatial class map


class TestCaffeResNet50:
    def test_matches_torch_oracle(self):
        import torch

        ref = _torch_caffe_resnet50()
        ref.eval()
        variables = convert_caffe_checkpoint("resnet50", _resnet_checkpoint(ref))
        model = CaffeResNet50(num_classes=20)
        # odd size exercises the ceil-mode padding-0 stem pool
        x = np.random.RandomState(3).randn(1, 225, 225, 3).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(x)))
        rel = np.abs(got - want) / (np.abs(want) + 1e-3)
        assert rel.max() < 1e-3, rel.max()

    def test_make_bn_positive_preserves_output_and_signs(self):
        """Sign folding (models.py:137-150) flips bn scales positive while
        leaving the function unchanged (s^2 == 1 in the normalized product)."""
        import torch

        ref = _torch_caffe_resnet50()
        ref.eval()
        ckpt = _resnet_checkpoint(ref)
        plain = convert_caffe_checkpoint("resnet50", ckpt)
        folded = convert_caffe_checkpoint("resnet50", ckpt, make_bn_positive=True)
        # all BN scales positive after folding
        def bn_scales(tree, path=()):
            for k, v in tree.items():
                if isinstance(v, dict):
                    yield from bn_scales(v, path + (k,))
                elif k == "scale":
                    yield path, v
        assert any((s < 0).any() for _, s in bn_scales(plain["params"]))
        for p, s in bn_scales(folded["params"]):
            assert (s >= 0).all(), p
        model = CaffeResNet50(num_classes=20)
        x = jnp.asarray(np.random.RandomState(4).randn(1, 224, 224, 3), jnp.float32)
        a = np.asarray(model.apply(plain, x))
        b = np.asarray(model.apply(folded, x))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)

    def test_fully_conv_output_shape(self):
        model = CaffeResNet50(num_classes=80, fully_conv=True)
        x = jnp.zeros((1, 224, 224, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        assert model.apply(v, x).shape == (1, 1, 1, 80)

    def test_stage_slicing_roundtrip(self):
        """stop_after + start_from compose to the plain forward (the zoo
        ResNet.__call__ contract, needed for layer-targeted attribution on
        the benchmark models)."""
        model = CaffeResNet50(num_classes=20)
        x = jnp.asarray(np.random.RandomState(5).randn(1, 224, 224, 3),
                        jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x)
        want = np.asarray(model.apply(v, x))
        for layer in ("layer1", "layer3"):
            mid = model.apply(v, x, stop_after=layer)
            got = np.asarray(model.apply(v, mid, start_from=layer))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_layer_targeted_attribution_runs(self):
        """grad_cam / guided backprop / EBP / contrastive EBP produce finite
        2-D maps on the caffe resnet50 (the pointing-game method grid)."""
        from scouter_tpu.explain import backprop as bp
        from scouter_tpu.explain import cam as cam_mod
        from scouter_tpu.explain import excitation as ebp

        model = CaffeResNet50(num_classes=20)
        x = jnp.asarray(np.random.RandomState(6).rand(1, 224, 224, 3),
                        jnp.float32)
        v = model.init(jax.random.PRNGKey(1), x)
        for fn, kw in ((cam_mod.gradcam, {}), (bp.guided_backprop, {}),
                       (bp.deconvnet, {}),
                       (ebp.excitation_backprop, {"saliency_layer": "layer3"}),
                       (ebp.contrastive_excitation_backprop, {})):
            out = np.asarray(fn(model, v, x, 3, **kw))
            assert out.ndim == 2 and np.isfinite(out).all(), fn.__name__


class TestGetModel:
    def test_builds_and_loads_local_checkpoint(self, tmp_path):
        import torch

        ref = _torch_caffe_vgg16()
        path = tmp_path / "vgg16_voc.pth.tar"
        torch.save(_vgg_checkpoint(ref), str(path))
        module, variables = get_model("vgg16", "voc", weights_path=str(path))
        assert variables is not None
        out = module.apply(variables, jnp.zeros((1, 224, 224, 3)))
        assert out.shape == (1, 20)

    def test_dataset_classes(self):
        m, _ = get_model("resnet50", "coco_2014")
        assert m.num_classes == 80
        with pytest.raises(ValueError):
            get_model("vgg16", "cifar")

    def test_transform_caffe_normalization(self):
        t = get_transform("voc", size=8)
        img = np.full((8, 8, 3), 0.5, np.float32)
        out = np.asarray(t(img))
        want = 0.5 * 255.0 - np.array([123.68, 116.779, 103.939], np.float32)
        np.testing.assert_allclose(out[0, 0], want, rtol=1e-5)

    def test_transform_shorter_side_resize(self):
        t = get_transform("imagenet", size=16)
        out = np.asarray(t(np.zeros((32, 64, 3), np.float32)))
        assert out.shape == (16, 32, 3)

"""Pointing-game reference models — capability of
``torchray/benchmark/models.py:36-434``.

The reference serves caffe-converted VGG16 / ResNet50 classifiers fine-tuned
on VOC-2007 (20 classes) / COCO-2014 (80 classes) — the exact models the
pointing-game numbers in [EBP] are computed with — applying three fixups to
the torchvision graphs:

- all max-pools switch to ceil_mode (``_fix_caffe_maxpool``, models.py:50-53)
- VGG16: checkpoint classifier keys remapped around the dropout layers,
  first conv converted BGR->RGB, classifier weights flattened
  (``_load_caffe_vgg16``, models.py:56-82)
- ResNet50: conv1 gains a bias, the stem max-pool loses its padding, the
  stride moves from each stage's first 3x3 onto its 1x1
  (``_load_caffe_resnet50``, models.py:113-151), with bn/downsample key
  renames and BGR->RGB; optional ``make_bn_positive`` sign-folding for EBP
  (models.py:137-150)

Zero-egress: :func:`get_model` loads the checkpoint from a LOCAL ``.pth.tar``
path (the files behind ``dl.fbaipublicfiles.com/torchray``) instead of
``torch.hub``; without a path it returns the randomly initialized module (for
structure tests / later weight loading). ``convert_to_fully_convolutional``
mirrors ``_caffe_vgg16_to_fc`` / ``_caffe_resnet50_to_fc`` (models.py:85-110,
154-186) by reshaping the stored Dense kernels into convolutions at call time.

:func:`get_transform` is the caffe preprocessing (models.py:337-434): bilinear
shorter-side resize (align_corners=False) and per-channel x*255 - mean with
the BGR means reversed into RGB order.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.act import relu as _act_relu
from ..models.act import residual_add as _residual_add
from ..models.convert import torch_state_dict_to_variables
from ..models.layers import batch_norm, conv2d, global_avg_pool

__all__ = ["CaffeVGG16", "CaffeResNet50", "get_model", "get_transform",
           "convert_caffe_checkpoint", "NUM_CLASSES"]

NUM_CLASSES = {"voc": 20, "coco": 80}  # models.py:277-281

# caffe BGR channel means (models.py:365)
_BGR_MEAN = (103.939, 116.779, 123.68)


def _max_pool_ceil(x, k: int, s: int, p: int = 0):
    """torch MaxPool2d(..., ceil_mode=True): implicit -inf bottom/right pad so
    partial windows are kept (the caffe pooling grid)."""
    h, w = x.shape[1:3]
    out_h = -(-(h + 2 * p - k) // s) + 1
    out_w = -(-(w + 2 * p - k) // s) + 1
    pad_h = max((out_h - 1) * s + k - h - p, p)
    pad_w = max((out_w - 1) * s + k - w - p, p)
    return nn.max_pool(x, (k, k), strides=(s, s), padding=[(p, pad_h), (p, pad_w)])


# torchvision vgg16 'D' configuration (13 convs; torch module indices of the
# conv layers inside `features`, relu/pool interleaved)
_VGG16_CONVS = ((0, 64), (2, 64), (5, 128), (7, 128), (10, 256), (12, 256),
                (14, 256), (17, 512), (19, 512), (21, 512), (24, 512),
                (26, 512), (28, 512))
_VGG16_POOL_AFTER = {2, 7, 14, 21, 28}


class CaffeVGG16(nn.Module):
    """torchvision VGG16 with the caffe fixups applied structurally.

    Param names mirror the torch modules (features_0 ... features_28,
    classifier_0/3/6) so the generic converter lands the remapped checkpoint.
    Classifier kernels are stored in Dense layout (in,out) with the torch
    (C,H,W) flatten order; ``fully_conv`` reshapes them into 7x7/1x1 convs at
    call time (``_caffe_vgg16_to_fc``, models.py:85-110).
    """

    num_classes: int = 20
    fully_conv: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False, rngs=None):
        for idx, chs in _VGG16_CONVS:
            x = conv2d(chs, 3, padding=1, use_bias=True, dtype=self.dtype,
                       name=f"features_{idx}")(x)
            x = _act_relu(x)
            if idx in _VGG16_POOL_AFTER:
                x = _max_pool_ceil(x, 2, 2)  # ceil_mode fixup (models.py:50-53)
        if features_only:
            return x

        dims = [(512 * 7 * 7, 4096), (4096, 4096), (4096, self.num_classes)]
        kernels, biases = [], []
        for i, (din, dout) in zip((0, 3, 6), dims):
            kernels.append(self.param(f"classifier_{i}_kernel",
                                      nn.initializers.lecun_normal(), (din, dout)))
            biases.append(self.param(f"classifier_{i}_bias",
                                     nn.initializers.zeros, (dout,)))

        if self.fully_conv:
            # Linear -> Conv (7x7 then 1x1s), skipping the 7x7 avgpool
            for i, (kern, b) in enumerate(zip(kernels, biases)):
                if i == 0:
                    w = kern.reshape(512, 7, 7, -1).transpose(1, 2, 0, 3)  # HWIO
                else:
                    w = kern[None, None]
                x = jax.lax.conv_general_dilated(
                    x, jnp.asarray(w, x.dtype), (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                if i < 2:
                    x = _act_relu(x)
            return x

        # torchvision applies AdaptiveAvgPool2d((7,7)) before the classifier;
        # at the caffe 224px input the map is already 7x7 (identity)
        b_, h, w_, c = x.shape
        assert (h, w_) == (7, 7), "non-224 input requires fully_conv=True"
        x = x.transpose(0, 3, 1, 2).reshape(b_, -1)  # torch (C,H,W) flatten
        for i, (kern, b) in enumerate(zip(kernels, biases)):
            x = x @ jnp.asarray(kern, x.dtype) + b
            if i < 2:
                x = _act_relu(x)
        return x


class _CaffeDownsample(nn.Module):
    out_chs: int
    stride: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.out_chs, 1, stride=self.stride, padding=0,
                   dtype=self.dtype, name="downsample_0")(x)
        return batch_norm(train, dtype=self.dtype, name="downsample_1")(x)


class _CaffeBottleneck(nn.Module):
    """torchvision Bottleneck with the caffe stride placement: stride on the
    1x1 conv1, conv2 stride 1 (models.py:119-121)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(self.planes, 1, stride=self.stride, padding=0,
                     dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, dtype=self.dtype, name="bn1")(out)
        out = _act_relu(out)
        out = conv2d(self.planes, 3, padding=1, dtype=self.dtype, name="conv2")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn2")(out)
        out = _act_relu(out)
        out = conv2d(self.planes * 4, 1, padding=0, dtype=self.dtype, name="conv3")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn3")(out)
        if self.has_downsample:
            residual = _CaffeDownsample(self.planes * 4, self.stride,
                                        dtype=self.dtype, name="downsample")(x, train)
        return _act_relu(_residual_add(out, residual))


class CaffeResNet50(nn.Module):
    """torchvision resnet50 with the caffe patches (models.py:113-133):
    biased conv1, padding-0 ceil-mode stem pool, stride on block conv1."""

    num_classes: int = 20
    fully_conv: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False,
                 rngs=None, stop_after: Optional[str] = None,
                 start_from: Optional[str] = None):
        """``stop_after``/``start_from`` ('layer1'..'layer4') split the forward
        at a stage boundary — the same contract as the zoo's
        ``models.resnet.ResNet.__call__`` — so layer-targeted attribution
        (excitation backprop, IBA) runs on the benchmark models exactly as the
        reference's hook-based rewrites do on its caffe resnet50
        (``torchray/attribution/excitation_backprop.py:146-252``)."""
        resume_after = int(start_from[-1]) if start_from is not None else 0
        if start_from is None:
            x = conv2d(64, 7, stride=2, padding=3, use_bias=True, dtype=self.dtype,
                       name="conv1")(x)
            x = batch_norm(train, dtype=self.dtype, name="bn1")(x)
            x = _act_relu(x)
            x = _max_pool_ceil(x, 3, 2, 0)  # padding dropped + ceil (models.py:116-117)
        for stage, (planes, blocks) in enumerate(
                [(64, 3), (128, 4), (256, 6), (512, 3)], start=1):
            for b in range(blocks):
                if stage <= resume_after:
                    continue  # resuming mid-network: earlier stages not applied
                stride = 2 if (stage > 1 and b == 0) else 1
                x = _CaffeBottleneck(planes, stride=stride, has_downsample=(b == 0),
                                     dtype=self.dtype,
                                     name=f"layer{stage}_{b}")(x, train)
            if stop_after == f"layer{stage}":
                return x
        if features_only:
            return x
        kern = self.param("fc_kernel", nn.initializers.lecun_normal(),
                          (2048, self.num_classes))
        bias = self.param("fc_bias", nn.initializers.zeros, (self.num_classes,))
        if self.fully_conv:
            # fc -> 1x1 conv; the adaptive avg pool is kept (models.py:154-186)
            x = jnp.mean(x, axis=(1, 2), keepdims=True)
            return jax.lax.conv_general_dilated(
                x, jnp.asarray(kern[None, None], x.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        return global_avg_pool(x) @ jnp.asarray(kern, x.dtype) + bias


# --------------------------------------------------------------------------
# checkpoint conversion (the caffe fixups applied to the torch state dict)
# --------------------------------------------------------------------------

_VGG_CLASSIFIER_REMAP = {  # models.py:60-67
    "classifier.0.weight": "classifier.0.weight",
    "classifier.0.bias": "classifier.0.bias",
    "classifier.2.weight": "classifier.3.weight",
    "classifier.2.bias": "classifier.3.bias",
    "classifier.4.weight": "classifier.6.weight",
    "classifier.4.bias": "classifier.6.bias",
}


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def convert_caffe_checkpoint(arch: str, checkpoint: Mapping[str, Any],
                             make_bn_positive: bool = False) -> Dict[str, Dict]:
    """torch caffe-checkpoint -> flax variables, with the reference's fixups."""
    sd = {k: _np(v) for k, v in checkpoint.items()}
    if arch == "vgg16":
        sd = {_VGG_CLASSIFIER_REMAP.get(k, k): v for k, v in sd.items()}
        sd["features.0.weight"] = sd["features.0.weight"][:, [2, 1, 0]]  # BGR->RGB
        params: Dict[str, Any] = {}
        for k, v in sd.items():
            segs = k.split(".")
            if segs[0] == "features":
                name = f"features_{segs[1]}"
                if segs[2] == "weight":
                    params.setdefault(name, {})["kernel"] = v.reshape(
                        v.shape[0], -1, 3, 3).transpose(2, 3, 1, 0)
                else:
                    params.setdefault(name, {})["bias"] = v
            else:  # classifier.i.{weight,bias}
                i = segs[1]
                if segs[2] == "weight":
                    params[f"classifier_{i}_kernel"] = v.reshape(v.shape[0], -1).T
                else:
                    params[f"classifier_{i}_bias"] = v
        return {"params": params}

    if arch == "resnet50":
        def rename(name):  # models.py:124-127
            name = re.sub(r"bn(\d)\.(0|1)\.(.*)", r"bn\1.\3", name)
            name = re.sub(r"downsample\.(\d)\.(0|1)\.(.*)", r"downsample.\1.\3", name)
            return name

        sd = {rename(k): v for k, v in sd.items()}
        sd["conv1.weight"] = sd["conv1.weight"][:, [2, 1, 0]]  # BGR->RGB
        if make_bn_positive:  # EBP sign folding (models.py:137-150)
            # state-dict order pairs each BN with the conv just before it,
            # like the reference's modules() walk
            conv_key = None
            for k in list(sd):
                v = sd[k]
                if k.endswith(".weight") and v.ndim == 4:
                    conv_key = k
                    continue
                base = k[: -len(".weight")]
                if (k.endswith(".weight") and v.ndim == 1
                        and base + ".running_mean" in sd):
                    sign = np.sign(v)
                    sign[sign == 0] = 1.0
                    sd[k] = v * sign
                    sd[base + ".running_mean"] = sd[base + ".running_mean"] * sign
                    if conv_key is not None:
                        sd[conv_key] = sd[conv_key] * sign[:, None, None, None]
                        cb = conv_key[: -len(".weight")] + ".bias"
                        if cb in sd:
                            sd[cb] = sd[cb] * sign

        fc_w = sd.pop("fc.weight")
        fc_b = sd.pop("fc.bias")
        variables = torch_state_dict_to_variables(sd)
        variables["params"]["fc_kernel"] = _np(fc_w).T
        variables["params"]["fc_bias"] = _np(fc_b)
        return variables

    raise ValueError(f"unsupported arch {arch!r} (vgg16 | resnet50)")


def get_model(arch: str = "vgg16", dataset: str = "voc",
              convert_to_fully_convolutional: bool = False,
              weights_path: Optional[str] = None,
              make_bn_positive: bool = False):
    """``torchray.benchmark.models.get_model`` equivalent (models.py:251-334).

    Returns ``(module, variables)``. ``weights_path`` points at a local copy
    of the published ``.pth.tar`` checkpoint (zero-egress replacement for the
    torch.hub download); ``variables`` is None without one.
    """
    key = "voc" if "voc" in dataset else "coco" if "coco" in dataset else None
    if key is None:
        raise ValueError("dataset must contain 'voc' or 'coco' "
                         "(imagenet models come from the main zoo)")
    num_classes = NUM_CLASSES[key]
    if arch == "vgg16":
        module = CaffeVGG16(num_classes=num_classes,
                            fully_conv=convert_to_fully_convolutional)
    elif arch == "resnet50":
        module = CaffeResNet50(num_classes=num_classes,
                               fully_conv=convert_to_fully_convolutional)
    else:
        raise ValueError("only vgg16 / resnet50 have published caffe weights")

    variables = None
    if weights_path is not None:
        import torch

        checkpoint = torch.load(weights_path, map_location="cpu",
                                weights_only=False)
        if isinstance(checkpoint, dict) and "state_dict" in checkpoint:
            checkpoint = checkpoint["state_dict"]
        variables = convert_caffe_checkpoint(arch, checkpoint,
                                             make_bn_positive=make_bn_positive)
    return module, variables


def get_transform(dataset: str = "imagenet", size=224):
    """Preprocessing (models.py:337-434) on float RGB [0,1] HWC arrays.

    imagenet: shorter-side resize + standard normalization. voc/coco: shorter
    -side resize + caffe normalization x*255 - mean (BGR means reversed to RGB
    order). Bilinear, align_corners=False == jax.image.resize 'linear'.
    """
    imagenet = "imagenet" in dataset
    if imagenet:
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
    else:
        mean = np.array([m / 255.0 for m in reversed(_BGR_MEAN)], np.float32)
        std = np.array([1 / 255.0] * 3, np.float32)

    def transform(img: np.ndarray) -> jnp.ndarray:
        x = jnp.asarray(img, jnp.float32)
        h, w = x.shape[:2]
        if isinstance(size, int):
            if w < h:
                oh, ow = int(size * h / w), size
            else:
                oh, ow = size, int(size * w / h)
        else:
            oh, ow = size
        x = jax.image.resize(x, (oh, ow, x.shape[2]), method="linear")
        return (x - mean) / std

    return transform

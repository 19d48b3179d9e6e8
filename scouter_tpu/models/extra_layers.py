"""The remaining timm layer-library members no entrypoint exercises
(``timm/models/layers/``): CBAM, circular ECA, MedianPool, SplitBatchNorm,
and test-time pooling — completing the layer inventory (SURVEY §2b "layer
library"; VERDICT round-1 missing item 5).

All are reachable through the same switchboards the reference uses:
:func:`create_attn` mirrors ``layers/create_attn.py:11-37`` ('se' | 'ese' |
'eca' | 'ceca' | 'cbam' | 'lcbam') and is what the ResNet block consults;
:func:`split_batch_norm` is the AdvProp auxiliary-BN
(``layers/split_batchnorm.py:19-38``); :func:`median_pool2d` the reflect-pad
median filter (``layers/median_pool.py:8-49``); :func:`test_time_pool` the
avg-then-classify-then-avgmax head (``layers/test_time_pool.py:13-34``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .act import relu as _act_relu
from .layers import Eca, SqueezeExcite, avg_pool_include_pad, batch_norm, conv2d

__all__ = [
    "CbamModule", "LightCbamModule", "Ceca", "create_attn",
    "median_pool2d", "split_batch_norm", "adaptive_avgmax_pool",
    "test_time_pool",
]


class _ChannelAttn(nn.Module):
    """CBAM channel attention (``layers/cbam.py:16-33``): shared 1x1 MLP over
    avg- and max-pooled descriptors; ``light`` sums the pools first (:36-45)."""

    channels: int
    reduction: int = 16
    light: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fc1 = nn.Conv(self.channels // self.reduction, (1, 1), use_bias=False,
                      dtype=self.dtype, name="fc1")
        fc2 = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                      name="fc2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        if self.light:
            attn = fc2(_act_relu(fc1(0.5 * avg + 0.5 * mx)))
        else:
            attn = fc2(_act_relu(fc1(avg))) + fc2(_act_relu(fc1(mx)))
        return x * jax.nn.sigmoid(attn)


class _ConvBn(nn.Module):
    """ConvBnAct with act_layer=None (child names conv/bn match torch)."""

    features: int
    kernel_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.features, self.kernel_size, dtype=self.dtype, name="conv")(x)
        return batch_norm(train, dtype=self.dtype, name="bn")(x)


class _SpatialAttn(nn.Module):
    """CBAM spatial attention (``layers/cbam.py:48-76``): channel mean/max map
    -> ConvBn (no act) -> sigmoid gate; ``light`` averages the two maps."""

    kernel_size: int = 7
    light: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        attn = 0.5 * avg + 0.5 * mx if self.light else jnp.concatenate([avg, mx], -1)
        attn = _ConvBn(1, self.kernel_size, dtype=self.dtype, name="conv")(attn, train)
        return x * jax.nn.sigmoid(attn)


class CbamModule(nn.Module):
    """CBAM (``layers/cbam.py:79-88``): channel attention then spatial."""

    channels: int
    spatial_kernel_size: int = 7
    light: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ChannelAttn(self.channels, light=self.light, dtype=self.dtype,
                         name="channel")(x)
        return _SpatialAttn(self.spatial_kernel_size, light=self.light,
                            dtype=self.dtype, name="spatial")(x, train)


class LightCbamModule(CbamModule):
    """Light CBAM (``layers/cbam.py:91-100``)."""

    light: bool = True


class Ceca(nn.Module):
    """Circular-padding ECA (``layers/eca.py:75-131``): the 1-D conv over the
    channel descriptor wraps around instead of zero-padding."""

    channels: int
    gamma: float = 2.0
    beta: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        t = int(abs(math.log(self.channels, 2) + self.beta) / self.gamma)
        k = max(t if t % 2 else t + 1, 3)
        s = jnp.mean(x, axis=(1, 2))  # (B, C)
        p = (k - 1) // 2
        s = jnp.concatenate([s[:, -p:], s, s[:, :p]], axis=1)
        s = nn.Conv(1, (k,), padding="VALID", use_bias=False, dtype=self.dtype,
                    name="conv")(s[..., None])
        return x * jax.nn.sigmoid(s[..., 0])[:, None, None, :]


def create_attn(attn_type, channels: int, dtype=None, name: str = "se"):
    """``timm/models/layers/create_attn.py:11-37`` switchboard. Returns a
    module instance or None. The module is conventionally named 'se' like the
    torch blocks name their attention child."""
    if not attn_type:
        return None
    attn_type = attn_type.lower()
    if attn_type == "se":
        return SqueezeExcite(channels, dtype=dtype, name=name)
    if attn_type == "eca":
        return Eca(channels, dtype=dtype, name=name)
    if attn_type == "ceca":
        return Ceca(channels, dtype=dtype, name=name)
    if attn_type == "cbam":
        return CbamModule(channels, dtype=dtype, name=name)
    if attn_type == "lcbam":
        return LightCbamModule(channels, dtype=dtype, name=name)
    if attn_type == "ese":
        from .vovnet import _Ese

        return _Ese(channels, dtype=dtype, name=name)
    raise ValueError(f"invalid attn module {attn_type!r}")


def median_pool2d(x: jnp.ndarray, kernel_size=3, stride=1, padding=0,
                  same: bool = False) -> jnp.ndarray:
    """MedianPool2d (``layers/median_pool.py:8-49``): reflect-pad then the
    median over each window. ``padding`` is (l, r, t, b) like torch F.pad."""
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    b, h, w, c = x.shape
    if same:
        ph = max(kh - sh, 0) if h % sh == 0 else max(kh - (h % sh), 0)
        pw = max(kw - sw, 0) if w % sw == 0 else max(kw - (w % sw), 0)
        pl, pt = pw // 2, ph // 2
        pr, pb = pw - pl, ph - pt
    elif isinstance(padding, int):
        pl = pr = pt = pb = padding
    else:
        pl, pr, pt, pb = padding
    x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="reflect")
    # unfold the windows: (B, OH, OW, kh*kw, C)
    oh = (x.shape[1] - kh) // sh + 1
    ow = (x.shape[2] - kw) // sw + 1
    patches = jnp.stack([
        x[:, i:i + oh * sh:sh, j:j + ow * sw:sw, :]
        for i in range(kh) for j in range(kw)
    ], axis=3)
    return jnp.median(patches, axis=3)


class SplitBatchNorm(nn.Module):
    """AdvProp auxiliary BN (``layers/split_batchnorm.py:19-38``): in training
    the batch splits into ``num_splits`` equal parts, the first through the
    main BN (params named like a plain BN) and the rest through ``aux_bn_i``;
    eval uses the main BN only."""

    num_splits: int = 2
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        main = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=self.eps, dtype=self.dtype, name="bn")
        if not train:
            return main(x)
        n = x.shape[0]
        split = n // self.num_splits
        assert n == split * self.num_splits, "batch must divide num_splits"
        outs = [main(x[:split])]
        for i in range(self.num_splits - 1):
            aux = nn.BatchNorm(use_running_average=False, momentum=0.9,
                               epsilon=self.eps, dtype=self.dtype,
                               name=f"aux_bn_{i}")
            outs.append(aux(x[(i + 1) * split:(i + 2) * split]))
        return jnp.concatenate(outs, axis=0)


def adaptive_avgmax_pool(x: jnp.ndarray) -> jnp.ndarray:
    """0.5 * (global avg + global max) (``layers/adaptive_avgmax_pool.py:24-27``)."""
    return 0.5 * (jnp.mean(x, axis=(1, 2)) + jnp.max(x, axis=(1, 2)))


def test_time_pool(model, variables, x, num_classes: int,
                   original_pool: int = 7, classifier: str = "fc") -> jnp.ndarray:
    """TestTimePoolHead (``layers/test_time_pool.py:13-34``): at a larger test
    resolution, average-pool the feature map with the TRAINING pool size
    (stride 1), apply the classifier as a 1x1 conv over the remaining spatial
    positions, and avgmax-pool the class maps."""
    feats = model.apply(variables, x, features_only=True)
    feats = avg_pool_include_pad(feats, original_pool, 1, 0)
    head = variables["params"][classifier]
    kernel = jnp.asarray(head["kernel"])  # Dense layout (in, out)
    out = jax.lax.conv_general_dilated(
        feats, kernel[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in head:
        out = out + jnp.asarray(head["bias"])
    return adaptive_avgmax_pool(out)

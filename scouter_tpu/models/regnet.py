"""RegNet X/Y families — capability of ``timm/models/regnet.py``.

Width schedule generated from (w0, wa, wm, depth) with divisor-8 quantization
and group-width compatibility adjustment (regnet.py:98-122, 291-309); blocks
are grouped bottlenecks (bottle_ratio 1) with SE-after-conv2 for the Y variants
(:124-171); stem is a 3x3/2 ConvBnAct (:259).

Param paths mirror torch (stem/{conv,bn}, s1/b1/conv1/{conv,bn},
s1/b1/se/{fc1,fc2}, s1/b1/downsample/{conv,bn}, head/fc).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .act import relu
from .layers import batch_norm, conv2d, global_avg_pool, head_dropout
from .registry import register_model

__all__ = ["RegNet"]


def _generate_widths(w0: float, wa: float, wm: float, depth: int, q: int = 8):
    widths_cont = np.arange(depth) * wa + w0
    width_exps = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, width_exps)
    widths = (np.round(widths / q) * q).astype(int)
    return widths


def _stage_params(w0, wa, wm, depth, group_w, bottle_ratio=1.0):
    widths = _generate_widths(w0, wa, wm, depth)
    stage_widths, stage_depths = np.unique(widths, return_counts=True)
    # group compatibility adjustment (regnet.py:103-109)
    ws, gs = [], []
    for w in stage_widths:
        w_bot = int(w * bottle_ratio)
        g = min(group_w, w_bot)
        w_bot = int(round(w_bot / g) * g)
        ws.append(int(w_bot / bottle_ratio))
        gs.append(g)
    return list(zip(stage_depths.tolist(), ws, gs))


class _ConvBnAct(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.features, self.kernel_size, stride=self.stride,
                   groups=self.groups, dtype=self.dtype, name="conv")(x)
        x = batch_norm(train, dtype=self.dtype, name="bn")(x)
        return relu(x) if self.act else x


class _SE(nn.Module):
    channels: int
    reduction_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduction_channels, (1, 1), use_bias=True, dtype=self.dtype,
                    name="fc1")(s)
        s = relu(s)
        s = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class _Block(nn.Module):
    in_chs: int
    out_chs: int
    stride: int
    bottle_ratio: float
    group_width: int
    se_ratio: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        bottleneck = int(round(self.out_chs * self.bottle_ratio))
        groups = bottleneck // self.group_width
        shortcut = x
        out = _ConvBnAct(bottleneck, 1, dtype=d, name="conv1")(x, train)
        out = _ConvBnAct(bottleneck, 3, stride=self.stride, groups=groups, dtype=d,
                         name="conv2")(out, train)
        if self.se_ratio:
            se_chs = int(round(self.in_chs * self.se_ratio))
            out = _SE(bottleneck, se_chs, dtype=d, name="se")(out)
        out = _ConvBnAct(self.out_chs, 1, act=False, dtype=d, name="conv3")(out, train)
        if self.in_chs != self.out_chs or self.stride != 1:
            shortcut = _ConvBnAct(self.out_chs, 1, stride=self.stride, act=False,
                                  dtype=d, name="downsample")(x, train)
        return relu(out + shortcut)


class _Stage(nn.Module):
    in_chs: int
    out_chs: int
    depth: int
    group_width: int
    bottle_ratio: float
    se_ratio: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = _Block(
                self.in_chs if i == 0 else self.out_chs, self.out_chs,
                2 if i == 0 else 1, self.bottle_ratio, self.group_width,
                self.se_ratio, dtype=self.dtype, name=f"b{i + 1}",
            )(x, train)
        return x


class _Head(nn.Module):
    num_classes: int
    drop_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = head_dropout(global_avg_pool(x), self.drop_rate, train)
        return nn.Dense(self.num_classes, name="fc")(x)


class RegNet(nn.Module):
    w0: float = 24
    wa: float = 36.44
    wm: float = 2.49
    depth: int = 13
    group_w: int = 8
    se_ratio: float = 0.0
    bottle_ratio: float = 1.0
    stem_width: int = 32
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        x = _ConvBnAct(self.stem_width, 3, stride=2, dtype=self.dtype, name="stem")(x, train)
        prev = self.stem_width
        for i, (d, w, g) in enumerate(
            _stage_params(self.w0, self.wa, self.wm, self.depth, self.group_w,
                          self.bottle_ratio), start=1
        ):
            x = _Stage(prev, w, d, g, self.bottle_ratio, self.se_ratio,
                       dtype=self.dtype, name=f"s{i}")(x, train)
            prev = w
        if features_only:
            return x
        return _Head(self.num_classes, drop_rate=self.drop_rate, dtype=self.dtype, name="head")(x, train)


_REGNET_CFGS = {
    "regnetx_002": dict(w0=24, wa=36.44, wm=2.49, group_w=8, depth=13),
    "regnetx_004": dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22),
    "regnetx_006": dict(w0=48, wa=36.97, wm=2.24, group_w=24, depth=16),
    "regnetx_008": dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16),
    "regnetx_016": dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18),
    "regnetx_032": dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25),
    "regnetx_040": dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23),
    "regnetx_064": dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17),
    "regnetx_080": dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23),
    "regnetx_120": dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19),
    "regnetx_160": dict(w0=216, wa=55.59, wm=2.1, group_w=128, depth=22),
    "regnetx_320": dict(w0=320, wa=69.86, wm=2.0, group_w=168, depth=23),
    "regnety_002": dict(w0=24, wa=36.44, wm=2.49, group_w=8, depth=13, se_ratio=0.25),
    "regnety_004": dict(w0=48, wa=27.89, wm=2.09, group_w=8, depth=16, se_ratio=0.25),
    "regnety_006": dict(w0=48, wa=32.54, wm=2.32, group_w=16, depth=15, se_ratio=0.25),
    "regnety_008": dict(w0=56, wa=38.84, wm=2.4, group_w=16, depth=14, se_ratio=0.25),
    "regnety_016": dict(w0=48, wa=20.71, wm=2.65, group_w=24, depth=27, se_ratio=0.25),
    "regnety_032": dict(w0=80, wa=42.63, wm=2.66, group_w=24, depth=21, se_ratio=0.25),
    "regnety_040": dict(w0=96, wa=31.41, wm=2.24, group_w=64, depth=22, se_ratio=0.25),
    "regnety_064": dict(w0=112, wa=33.22, wm=2.27, group_w=72, depth=25, se_ratio=0.25),
    "regnety_080": dict(w0=192, wa=76.82, wm=2.19, group_w=56, depth=17, se_ratio=0.25),
    "regnety_120": dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19, se_ratio=0.25),
    "regnety_160": dict(w0=200, wa=106.23, wm=2.48, group_w=112, depth=18, se_ratio=0.25),
    "regnety_320": dict(w0=232, wa=115.89, wm=2.53, group_w=232, depth=20, se_ratio=0.25),
}


def _make_entry(name, cfg):
    def entry(num_classes=1000, in_chans=3, **kw):
        kw.pop("mnist_stem", None)
        return RegNet(num_classes=num_classes, in_chans=in_chans, **cfg, **kw)

    entry.__name__ = name
    return register_model(entry)


for _name, _cfg in _REGNET_CFGS.items():
    _make_entry(_name, _cfg)

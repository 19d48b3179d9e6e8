"""VoVNet v2 family — capability of ``timm/models/vovnet.py``.

Architecture facts (cited): OSA block = ``layer_per_block`` sequential 3x3
convs whose outputs (plus the input) are concatenated and fused by a 1x1 conv,
optionally with an identity residual and an Effective-SE attention
(vovnet.py:179-225, se.py:27-40); stages downsample with ceil-mode 3x3/2 max
pool (:227-251); 3-conv stem at stride 4 (:291-298).

Param paths mirror torch (stem/stem_0/conv, stages/stages_0/blocks_0/conv_mid_0/
conv, head/fc) via the converter's digit-merge rule.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .layers import batch_norm, conv2d, global_avg_pool
from .registry import register_model
from .senet import max_pool_3x3_s2_ceil

__all__ = ["VovNet"]


class _ConvBnAct(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.features, self.kernel_size, stride=self.stride,
                   dtype=self.dtype, name="conv")(x)
        x = batch_norm(train, dtype=self.dtype, name="bn")(x)
        return relu(x)


class _SepConvBnAct(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        x = conv2d(in_chs, self.kernel_size, stride=self.stride, groups=in_chs,
                   dtype=self.dtype, name="conv_dw")(x)
        x = conv2d(self.features, 1, padding=0, dtype=self.dtype, name="conv_pw")(x)
        x = batch_norm(train, dtype=self.dtype, name="bn")(x)
        return relu(x)


class _Ese(nn.Module):
    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype, name="fc")(s)
        gate = jax.nn.relu6(s + 3.0) / 6.0  # hard_sigmoid
        return x * gate


class _OsaBlock(nn.Module):
    mid_chs: int
    out_chs: int
    layer_per_block: int
    residual: bool = False
    depthwise: bool = False
    attn: str = ""
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        feats = [inp]  # original input joins the concat (vovnet.py:214-218)
        if self.depthwise and x.shape[-1] != self.mid_chs:
            x = _ConvBnAct(self.mid_chs, 1, dtype=self.dtype, name="conv_reduction")(x, train)
        conv_cls = _SepConvBnAct if self.depthwise else _ConvBnAct
        for i in range(self.layer_per_block):
            x = conv_cls(self.mid_chs, 3, dtype=self.dtype, name=f"conv_mid_{i}")(x, train)
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)
        x = _ConvBnAct(self.out_chs, 1, dtype=self.dtype, name="conv_concat")(x, train)
        if self.attn == "ese":
            x = _Ese(self.out_chs, dtype=self.dtype, name="attn")(x)
        if self.residual:
            x = x + inp
        return x


class _OsaStage(nn.Module):
    conv_chs: int
    out_chs: int
    block_per_stage: int
    layer_per_block: int
    downsample: bool
    residual: bool
    depthwise: bool
    attn: str
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.downsample:
            x = max_pool_3x3_s2_ceil(x)
        for b in range(self.block_per_stage):
            last = b == self.block_per_stage - 1
            x = _OsaBlock(
                self.conv_chs, self.out_chs, self.layer_per_block,
                residual=self.residual and b > 0, depthwise=self.depthwise,
                attn=self.attn if last else "", dtype=self.dtype,
                name=f"blocks_{b}",
            )(x, train)
        return x


class _Head(nn.Module):
    num_classes: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.num_classes, name="fc")(global_avg_pool(x))


class VovNet(nn.Module):
    stem_chs: Sequence[int] = (64, 64, 128)
    stage_conv_chs: Sequence[int] = (128, 160, 192, 224)
    stage_out_chs: Sequence[int] = (256, 512, 768, 1024)
    layer_per_block: int = 5
    block_per_stage: Sequence[int] = (1, 1, 2, 2)
    residual: bool = True
    depthwise: bool = False
    attn: str = "ese"
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False, rngs=None):
        conv_cls = _SepConvBnAct if self.depthwise else _ConvBnAct
        x = _ConvBnAct(self.stem_chs[0], 3, stride=2, dtype=self.dtype, name="stem_0")(x, train)
        x = conv_cls(self.stem_chs[1], 3, dtype=self.dtype, name="stem_1")(x, train)
        x = conv_cls(self.stem_chs[2], 3, stride=2, dtype=self.dtype, name="stem_2")(x, train)

        for i in range(4):
            x = _OsaStage(
                self.stage_conv_chs[i], self.stage_out_chs[i], self.block_per_stage[i],
                self.layer_per_block, downsample=i > 0, residual=self.residual,
                depthwise=self.depthwise, attn=self.attn, dtype=self.dtype,
                name=f"stages_{i}",
            )(x, train)
        if features_only:
            return x
        return _Head(self.num_classes, dtype=self.dtype, name="head")(x)


def _vov(num_classes, in_chans, **cfg):
    cfg.pop("mnist_stem", None)
    return VovNet(num_classes=num_classes, in_chans=in_chans, **cfg)


@register_model
def vovnet39a(num_classes=1000, in_chans=3, **kw):
    return _vov(num_classes, in_chans, residual=False, attn="", **kw)


@register_model
def vovnet57a(num_classes=1000, in_chans=3, **kw):
    return _vov(num_classes, in_chans, block_per_stage=(1, 1, 4, 3),
                residual=False, attn="", **kw)


@register_model
def ese_vovnet19b(num_classes=1000, in_chans=3, **kw):
    return _vov(num_classes, in_chans, layer_per_block=3,
                block_per_stage=(1, 1, 1, 1), **kw)


@register_model
def ese_vovnet19b_dw(num_classes=1000, in_chans=3, **kw):
    return _vov(num_classes, in_chans, stem_chs=(64, 64, 64), layer_per_block=3,
                block_per_stage=(1, 1, 1, 1), depthwise=True, **kw)


@register_model
def ese_vovnet39b(num_classes=1000, in_chans=3, **kw):
    return _vov(num_classes, in_chans, **kw)


@register_model
def ese_vovnet57b(num_classes=1000, in_chans=3, **kw):
    return _vov(num_classes, in_chans, block_per_stage=(1, 1, 4, 3), **kw)


@register_model
def ese_vovnet99b(num_classes=1000, in_chans=3, **kw):
    return _vov(num_classes, in_chans, block_per_stage=(1, 3, 9, 3), **kw)

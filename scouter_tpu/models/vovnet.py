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
from .layers import Eca, batch_norm, conv2d, global_avg_pool, head_dropout
from .registry import register_model
from .senet import max_pool_3x3_s2_ceil

__all__ = ["VovNet"]


class _EvoNormSample(nn.Module):
    """EvoNormSample2d (``timm/models/layers/evo_norm.py:53-85``): grouped
    sample statistics with a built-in sigmoid gate; faithfully reproduces the
    vendored version's quirk of normalizing sigmoid(x*v) (not x*sigmoid(x*v)).
    Params keep torch's (1,C,1,1) affine collapsed to (C,) by the converter."""

    groups: int = 8
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        v = self.param("v", nn.initializers.ones, (c,))
        b = x.shape[0]
        # group stats over (C/g, H, W) exactly as torch's view(B, g, -1) on NCHW
        xt = x.transpose(0, 3, 1, 2).reshape(b, self.groups, -1)
        std = jnp.sqrt(xt.var(axis=-1) + self.eps)  # (B, g)
        std_c = jnp.repeat(std, c // self.groups, axis=1)  # channel -> its group
        n = jax.nn.sigmoid(x * v)
        return (n / std_c[:, None, None, :]) * scale + bias


def _norm_act(kind: str, parent_scope_x, train: bool, name: str, dtype=None):
    """norm_layer choices of the vovnet entrypoints (vovnet.py:404-415):
    'bn' = BatchNormAct2d (bn+relu), 'evos' = EvoNormSample2d (own gate),
    'iabn' = InplaceAbn (bn + leaky_relu 0.01)."""
    x = parent_scope_x
    if kind == "evos":
        return _EvoNormSample(dtype=dtype, name=name)(x)
    x = batch_norm(train, dtype=dtype, name=name)(x)
    if kind == "iabn":
        return jnp.where(x >= 0, x, 0.01 * x)
    return relu(x)


class _ConvBnAct(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = "bn"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.features, self.kernel_size, stride=self.stride,
                   dtype=self.dtype, name="conv")(x)
        return _norm_act(self.norm, x, train, "bn", self.dtype)


class _SepConvBnAct(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = "bn"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        x = conv2d(in_chs, self.kernel_size, stride=self.stride, groups=in_chs,
                   dtype=self.dtype, name="conv_dw")(x)
        x = conv2d(self.features, 1, padding=0, dtype=self.dtype, name="conv_pw")(x)
        return _norm_act(self.norm, x, train, "bn", self.dtype)


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
    norm: str = "bn"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        feats = [inp]  # original input joins the concat (vovnet.py:214-218)
        if self.depthwise and x.shape[-1] != self.mid_chs:
            x = _ConvBnAct(self.mid_chs, 1, norm=self.norm, dtype=self.dtype,
                           name="conv_reduction")(x, train)
        conv_cls = _SepConvBnAct if self.depthwise else _ConvBnAct
        for i in range(self.layer_per_block):
            x = conv_cls(self.mid_chs, 3, norm=self.norm, dtype=self.dtype,
                         name=f"conv_mid_{i}")(x, train)
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)
        x = _ConvBnAct(self.out_chs, 1, norm=self.norm, dtype=self.dtype,
                       name="conv_concat")(x, train)
        if self.attn == "ese":
            x = _Ese(self.out_chs, dtype=self.dtype, name="attn")(x)
        elif self.attn == "eca":
            x = Eca(self.out_chs, dtype=self.dtype, name="attn")(x)
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
    norm: str = "bn"
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
                attn=self.attn if last else "", norm=self.norm, dtype=self.dtype,
                name=f"blocks_{b}",
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


class VovNet(nn.Module):
    stem_chs: Sequence[int] = (64, 64, 128)
    stage_conv_chs: Sequence[int] = (128, 160, 192, 224)
    stage_out_chs: Sequence[int] = (256, 512, 768, 1024)
    layer_per_block: int = 5
    block_per_stage: Sequence[int] = (1, 1, 2, 2)
    residual: bool = True
    depthwise: bool = False
    attn: str = "ese"
    norm: str = "bn"
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        conv_cls = _SepConvBnAct if self.depthwise else _ConvBnAct
        x = _ConvBnAct(self.stem_chs[0], 3, stride=2, norm=self.norm,
                       dtype=self.dtype, name="stem_0")(x, train)
        x = conv_cls(self.stem_chs[1], 3, norm=self.norm, dtype=self.dtype,
                     name="stem_1")(x, train)
        x = conv_cls(self.stem_chs[2], 3, stride=2, norm=self.norm,
                     dtype=self.dtype, name="stem_2")(x, train)

        for i in range(4):
            x = _OsaStage(
                self.stage_conv_chs[i], self.stage_out_chs[i], self.block_per_stage[i],
                self.layer_per_block, downsample=i > 0, residual=self.residual,
                depthwise=self.depthwise, attn=self.attn, norm=self.norm,
                dtype=self.dtype,
                name=f"stages_{i}",
            )(x, train)
        if features_only:
            return x
        return _Head(self.num_classes, drop_rate=self.drop_rate, dtype=self.dtype, name="head")(x, train)


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


@register_model
def eca_vovnet39b(num_classes=1000, in_chans=3, **kw):
    """VoVNet-39b with ECA attention (vovnet.py:124-133, :400-401)."""
    kw.pop("mnist_stem", None)
    return VovNet(layer_per_block=5, block_per_stage=(1, 1, 2, 2), attn="eca",
                  num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def ese_vovnet19b_slim(num_classes=1000, in_chans=3, **kw):
    """Slim V2-19 (vovnet.py:72-80)."""
    kw.pop("mnist_stem", None)
    return VovNet(stage_conv_chs=(64, 80, 96, 112), stage_out_chs=(112, 256, 384, 512),
                  layer_per_block=3, block_per_stage=(1, 1, 1, 1),
                  num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def ese_vovnet19b_slim_dw(num_classes=1000, in_chans=3, **kw):
    """Slim depthwise V2-19 (vovnet.py:51-59): dw stem convs + dw OSA convs."""
    kw.pop("mnist_stem", None)
    return VovNet(stem_chs=(64, 64, 64), stage_conv_chs=(64, 80, 96, 112),
                  stage_out_chs=(112, 256, 384, 512), layer_per_block=3,
                  block_per_stage=(1, 1, 1, 1), depthwise=True,
                  num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def ese_vovnet39b_evos(num_classes=1000, in_chans=3, **kw):
    """V2-39 with EvoNormSample norm-act (vovnet.py:135, :406-410)."""
    kw.pop("mnist_stem", None)
    return VovNet(layer_per_block=5, block_per_stage=(1, 1, 2, 2), norm="evos",
                  num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def ese_vovnet99b_iabn(num_classes=1000, in_chans=3, **kw):
    """V2-99 with Inplace-ABN norm-act (vovnet.py:136, :412-415)."""
    kw.pop("mnist_stem", None)
    return VovNet(layer_per_block=5, block_per_stage=(1, 3, 9, 3), norm="iabn",
                  num_classes=num_classes, in_chans=in_chans, **kw)

"""DPN (Dual Path Networks) — capability of ``timm/models/dpn.py:52-355``.

Structure (cited): pre-activation BnActConv units (BN eps 1e-3) (:74-83);
DualPathBlock keeps a residual lane (fixed width) and a dense lane (grows by
``inc`` per block), with 1x1 -> grouped 3x3 -> 1x1 body and a projection on
'proj'/'down' blocks (:104-187); stem InputBlock (:86-101); head CatBnAct then
a 1x1-conv classifier (:247-273).

Param paths mirror torch (features/conv2_1/c1x1_a/{bn,conv}, classifier).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .layers import conv2d, global_avg_pool, head_dropout, max_pool_3x3_s2_p1
from .registry import register_model

__all__ = ["DPN"]


def _bn(train, name, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3,
                        dtype=dtype, name=name)


class _BnActConv(nn.Module):
    out_chs: int
    kernel_size: int
    stride: int
    padding: int = 0
    groups: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _bn(train, "bn", self.dtype)(x)
        x = relu(x)
        return conv2d(self.out_chs, self.kernel_size, stride=self.stride,
                      padding=self.padding, groups=self.groups, dtype=self.dtype,
                      name="conv")(x)


class _InputBlock(nn.Module):
    features: int
    kernel_size: int = 7
    padding: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.features, self.kernel_size, stride=2, padding=self.padding,
                   dtype=self.dtype, name="conv")(x)
        x = relu(_bn(train, "bn", self.dtype)(x))
        return max_pool_3x3_s2_p1(x)


class _CatBnAct(nn.Module):
    dtype: Optional[jnp.dtype] = None
    act: str = "relu"  # the final conv5_bn_ac uses ELU (dpn.py:193,247)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _bn(train, "bn", self.dtype)(x)
        if self.act == "elu":
            import jax

            return jax.nn.elu(x)
        return relu(x)


class _DualPathBlock(nn.Module):
    num_1x1_a: int
    num_3x3_b: int
    num_1x1_c: int
    inc: int
    groups: int
    block_type: str = "normal"
    b: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Tuple[jnp.ndarray, jnp.ndarray], train: bool = False):
        d = self.dtype
        key_stride = 2 if self.block_type == "down" else 1
        has_proj = self.block_type in ("proj", "down")
        x_in = jnp.concatenate(x, axis=-1)

        if has_proj:
            name = "c1x1_w_s2" if key_stride == 2 else "c1x1_w_s1"
            x_s = _BnActConv(self.num_1x1_c + 2 * self.inc, 1, key_stride, dtype=d,
                             name=name)(x_in, train)
            x_s1 = x_s[..., : self.num_1x1_c]
            x_s2 = x_s[..., self.num_1x1_c:]
        else:
            x_s1, x_s2 = x

        out = _BnActConv(self.num_1x1_a, 1, 1, dtype=d, name="c1x1_a")(x_in, train)
        out = _BnActConv(self.num_3x3_b, 3, key_stride, padding=1, groups=self.groups,
                         dtype=d, name="c3x3_b")(out, train)
        if self.b:
            # CatBnAct named c1x1_c, then two parallel 1x1 convs (dpn.py:137-140)
            out = _CatBnAct(dtype=d, name="c1x1_c")(out, train)
            out1 = conv2d(self.num_1x1_c, 1, padding=0, dtype=d, name="c1x1_c1")(out)
            out2 = conv2d(self.inc, 1, padding=0, dtype=d, name="c1x1_c2")(out)
        else:
            out = _BnActConv(self.num_1x1_c + self.inc, 1, 1, dtype=d,
                             name="c1x1_c")(out, train)
            out1 = out[..., : self.num_1x1_c]
            out2 = out[..., self.num_1x1_c:]
        resid = x_s1 + out1
        dense = jnp.concatenate([x_s2, out2], axis=-1)
        return resid, dense


class DPN(nn.Module):
    small: bool = False
    num_init_features: int = 64
    k_r: int = 96
    groups: int = 32
    b: bool = False
    k_sec: Sequence[int] = (3, 4, 20, 3)
    inc_sec: Sequence[int] = (16, 32, 24, 128)
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        d = self.dtype
        bw_factor = 1 if self.small else 4

        class _Feat(nn.Module):
            @nn.compact
            def __call__(self2, x, train=False):
                o = self
                if o.small:
                    x = _InputBlock(o.num_init_features, 3, 1, dtype=d, name="conv1_1")(x, train)
                else:
                    x = _InputBlock(o.num_init_features, 7, 3, dtype=d, name="conv1_1")(x, train)
                pair = (x, x[..., :0])
                for stage, (mult, k, inc) in enumerate(
                    zip((64, 128, 256, 512), o.k_sec, o.inc_sec), start=2
                ):
                    bw = mult * bw_factor
                    r = (o.k_r * bw) // (64 * bw_factor)
                    btype = "proj" if stage == 2 else "down"
                    pair = _DualPathBlock(r, r, bw, inc, o.groups, btype, o.b, dtype=d,
                                          name=f"conv{stage}_1")(pair, train)
                    for i in range(2, k + 1):
                        pair = _DualPathBlock(r, r, bw, inc, o.groups, "normal", o.b,
                                              dtype=d, name=f"conv{stage}_{i}")(pair, train)
                x = jnp.concatenate(pair, axis=-1)
                return _CatBnAct(dtype=d, act="elu", name="conv5_bn_ac")(x, train)

        feats = _Feat(name="features")(x, train)
        if features_only:
            return feats
        pooled = feats.mean(axis=(1, 2), keepdims=True)
        pooled = head_dropout(pooled, self.drop_rate, train)  # dpn.py:274-275
        out = nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=d,
                      name="classifier")(pooled)
        return out.reshape(out.shape[0], -1)


def _dpn(num_classes, in_chans, **kw):
    kw.pop("mnist_stem", None)
    return DPN(num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def dpn68(num_classes=1000, in_chans=3, **kw):
    return _dpn(num_classes, in_chans, small=True, num_init_features=10, k_r=128,
                groups=32, k_sec=(3, 4, 12, 3), inc_sec=(16, 32, 32, 64), **kw)


@register_model
def dpn68b(num_classes=1000, in_chans=3, **kw):
    return _dpn(num_classes, in_chans, small=True, num_init_features=10, k_r=128,
                groups=32, b=True, k_sec=(3, 4, 12, 3), inc_sec=(16, 32, 32, 64), **kw)


@register_model
def dpn92(num_classes=1000, in_chans=3, **kw):
    return _dpn(num_classes, in_chans, num_init_features=64, k_r=96, groups=32,
                k_sec=(3, 4, 20, 3), inc_sec=(16, 32, 24, 128), **kw)


@register_model
def dpn98(num_classes=1000, in_chans=3, **kw):
    return _dpn(num_classes, in_chans, num_init_features=96, k_r=160, groups=40,
                k_sec=(3, 6, 20, 3), inc_sec=(16, 32, 32, 128), **kw)


@register_model
def dpn131(num_classes=1000, in_chans=3, **kw):
    return _dpn(num_classes, in_chans, num_init_features=128, k_r=160, groups=40,
                k_sec=(4, 8, 28, 3), inc_sec=(16, 32, 32, 128), **kw)


@register_model
def dpn107(num_classes=1000, in_chans=3, **kw):
    return _dpn(num_classes, in_chans, num_init_features=128, k_r=200, groups=50,
                k_sec=(4, 8, 20, 3), inc_sec=(20, 64, 64, 128), **kw)

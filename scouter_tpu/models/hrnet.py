"""HRNet (HRNetV2 classification) — capability of ``timm/models/hrnet.py``.

Multi-resolution parallel branches with repeated cross-resolution fusion
(HighResolutionModule :390-515): per-branch residual blocks, then an all-pairs
fuse — 1x1 conv + nearest upsample for low->high, chains of stride-2 3x3 convs
for high->low. Stages 2-4 grow one branch each via transition layers
(:605-630); the classification head re-widens each resolution with a
bottleneck, downsamples and sums progressively, and finishes with a 1x1 conv
to 2048 (:568-604). Standard wN configs: branch channels (N, 2N, 4N, 8N).

Blocks reuse the ResNet family blocks; param paths mirror torch
(stage2_0/branches_0_0/conv1, fuse_layers_1_0_0_0, transition1_0_0, ...).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .layers import batch_norm, conv2d, global_avg_pool, head_dropout
from .registry import register_model
from .resnet import _BasicBlock, _Bottleneck

__all__ = ["HighResolutionNet"]


def _upsample_nearest(x, factor: int):
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def _block_layer(parent, x, block_kind, planes, blocks, base, train, dtype, stride=1):
    cls = _Bottleneck if block_kind == "BOTTLENECK" else _BasicBlock
    expansion = 4 if block_kind == "BOTTLENECK" else 1
    for i in range(blocks):
        s = stride if i == 0 else 1
        needs = i == 0 and (s != 1 or x.shape[-1] != planes * expansion)
        x = cls(planes=planes, stride=s, has_downsample=needs, avg_down=False,
                dtype=dtype, name=f"{base}_{i}")(x, train)
    return x


class _HRModule(nn.Module):
    num_branches: int
    block: str
    num_blocks: Sequence[int]
    in_channels: Sequence[int]
    num_channels: Sequence[int]
    multi_scale_output: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        d = self.dtype
        expansion = 4 if self.block == "BOTTLENECK" else 1
        out_chs = [c * expansion for c in self.num_channels]

        xs = list(xs)
        for i in range(self.num_branches):
            xs[i] = _block_layer(self, xs[i], self.block, self.num_channels[i],
                                 self.num_blocks[i], f"branches_{i}", train, d)
        if self.num_branches == 1:
            return xs

        n_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            y = None
            for j in range(self.num_branches):
                if j == i:
                    v = xs[j]
                elif j > i:
                    v = conv2d(out_chs[i], 1, padding=0, dtype=d,
                               name=f"fuse_layers_{i}_{j}_0")(xs[j])
                    v = batch_norm(train, dtype=d, name=f"fuse_layers_{i}_{j}_1")(v)
                    v = _upsample_nearest(v, 2 ** (j - i))
                else:  # chains of stride-2 3x3 convs
                    v = xs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        chs = out_chs[i] if last else out_chs[j]
                        v = conv2d(chs, 3, stride=2, padding=1, dtype=d,
                                   name=f"fuse_layers_{i}_{j}_{k}_0")(v)
                        v = batch_norm(train, dtype=d,
                                       name=f"fuse_layers_{i}_{j}_{k}_1")(v)
                        if not last:
                            v = relu(v)
                y = v if y is None else y + v
            fused.append(relu(y))
        return fused


class HighResolutionNet(nn.Module):
    cfg: tuple  # hashable: ((stage_key, ...), ...) built by _freeze_cfg
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        d = self.dtype
        cfg = dict(self.cfg)
        x = conv2d(cfg["STEM_WIDTH"], 3, stride=2, padding=1, dtype=d, name="conv1")(x)
        x = relu(batch_norm(train, dtype=d, name="bn1")(x))
        x = conv2d(64, 3, stride=2, padding=1, dtype=d, name="conv2")(x)
        x = relu(batch_norm(train, dtype=d, name="bn2")(x))

        s1 = dict(cfg["STAGE1"])
        x = _block_layer(self, x, s1["BLOCK"], s1["NUM_CHANNELS"][0],
                         s1["NUM_BLOCKS"][0], "layer1", train, d)
        exp1 = 4 if s1["BLOCK"] == "BOTTLENECK" else 1
        pre_channels = [s1["NUM_CHANNELS"][0] * exp1]

        xs = [x]
        for stage_idx in (2, 3, 4):
            sc = dict(cfg[f"STAGE{stage_idx}"])
            expansion = 4 if sc["BLOCK"] == "BOTTLENECK" else 1
            cur_channels = [c * expansion for c in sc["NUM_CHANNELS"]]

            # transition (hrnet.py:605-630)
            new_xs = []
            tname = f"transition{stage_idx - 1}"
            for i in range(len(cur_channels)):
                if i < len(pre_channels):
                    if cur_channels[i] != pre_channels[i]:
                        v = conv2d(cur_channels[i], 3, padding=1, dtype=d,
                                   name=f"{tname}_{i}_0")(xs[i])
                        v = relu(batch_norm(train, dtype=d, name=f"{tname}_{i}_1")(v))
                        new_xs.append(v)
                    else:
                        new_xs.append(xs[i])
                else:
                    v = xs[-1]
                    for j in range(i + 1 - len(pre_channels)):
                        chs = cur_channels[i] if j == i - len(pre_channels) else pre_channels[-1]
                        v = conv2d(chs, 3, stride=2, padding=1, dtype=d,
                                   name=f"{tname}_{i}_{j}_0")(v)
                        v = relu(batch_norm(train, dtype=d, name=f"{tname}_{i}_{j}_1")(v))
                    new_xs.append(v)
            xs = new_xs

            in_channels = list(cur_channels)
            for m in range(sc["NUM_MODULES"]):
                xs = _HRModule(
                    num_branches=sc["NUM_BRANCHES"], block=sc["BLOCK"],
                    num_blocks=tuple(sc["NUM_BLOCKS"]), in_channels=tuple(in_channels),
                    num_channels=tuple(sc["NUM_CHANNELS"]), multi_scale_output=True,
                    dtype=d, name=f"stage{stage_idx}_{m}",
                )(xs, train)
            pre_channels = cur_channels

        # Classification head (hrnet.py:568-604, 711-717)
        head_channels = [32, 64, 128, 256]
        y = _block_layer(self, xs[0], "BOTTLENECK", head_channels[0], 1,
                         "incre_modules_0", train, d)
        for i in range(len(pre_channels) - 1):
            incre = _block_layer(self, xs[i + 1], "BOTTLENECK", head_channels[i + 1],
                                 1, f"incre_modules_{i + 1}", train, d)
            down = nn.Conv(head_channels[i + 1] * 4, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)], use_bias=True, dtype=d,
                           name=f"downsamp_modules_{i}_0")(y)
            down = batch_norm(train, dtype=d, name=f"downsamp_modules_{i}_1")(down)
            y = incre + relu(down)
        y = nn.Conv(2048, (1, 1), use_bias=True, dtype=d, name="final_layer_0")(y)
        y = relu(batch_norm(train, dtype=d, name="final_layer_1")(y))
        if features_only:
            return y
        y = head_dropout(global_avg_pool(y), self.drop_rate, train)
        return nn.Dense(self.num_classes, name="classifier")(y)


def _stage(modules, branches, block, blocks, channels):
    return (
        ("NUM_MODULES", modules), ("NUM_BRANCHES", branches), ("BLOCK", block),
        ("NUM_BLOCKS", blocks), ("NUM_CHANNELS", channels), ("FUSE_METHOD", "SUM"),
    )


def _wn_cfg(n, stem=64, s1_blocks=4, s1_ch=64, blocks=4, modules=(1, 4, 3)):
    return (
        ("STEM_WIDTH", stem),
        ("STAGE1", _stage(1, 1, "BOTTLENECK", (s1_blocks,), (s1_ch,))),
        ("STAGE2", _stage(modules[0], 2, "BASIC", (blocks,) * 2, (n, 2 * n))),
        ("STAGE3", _stage(modules[1], 3, "BASIC", (blocks,) * 3, (n, 2 * n, 4 * n))),
        ("STAGE4", _stage(modules[2], 4, "BASIC", (blocks,) * 4, (n, 2 * n, 4 * n, 8 * n))),
    )


_HRNET_CFGS: Dict[str, tuple] = {
    "hrnet_w18_small": (
        ("STEM_WIDTH", 64),
        ("STAGE1", _stage(1, 1, "BOTTLENECK", (1,), (32,))),
        ("STAGE2", _stage(1, 2, "BASIC", (2, 2), (16, 32))),
        ("STAGE3", _stage(1, 3, "BASIC", (2, 2, 2), (16, 32, 64))),
        ("STAGE4", _stage(1, 4, "BASIC", (2, 2, 2, 2), (16, 32, 64, 128))),
    ),
    "hrnet_w18_small_v2": (
        ("STEM_WIDTH", 64),
        ("STAGE1", _stage(1, 1, "BOTTLENECK", (2,), (64,))),
        ("STAGE2", _stage(1, 2, "BASIC", (2, 2), (18, 36))),
        ("STAGE3", _stage(3, 3, "BASIC", (2, 2, 2), (18, 36, 72))),
        ("STAGE4", _stage(2, 4, "BASIC", (2, 2, 2, 2), (18, 36, 72, 144))),
    ),
    "hrnet_w18": _wn_cfg(18),
    "hrnet_w30": _wn_cfg(30),
    "hrnet_w32": _wn_cfg(32),
    "hrnet_w40": _wn_cfg(40),
    "hrnet_w44": _wn_cfg(44),
    "hrnet_w48": _wn_cfg(48),
    "hrnet_w64": _wn_cfg(64),
}


def _make_entry(name, cfg):
    def entry(num_classes=1000, in_chans=3, **kw):
        kw.pop("mnist_stem", None)
        return HighResolutionNet(cfg=cfg, num_classes=num_classes, in_chans=in_chans, **kw)

    entry.__name__ = name
    return register_model(entry)


for _name, _cfg in _HRNET_CFGS.items():
    _make_entry(_name, _cfg)

"""Experiment configuration — flag parity with the reference CLI.

Every flag of ``train.py:18-79`` is preserved with the same name, default, and
semantics, including the reference's string-typed sweepable flags quirk:
``num_classes``, ``lambda_value``, ``power``, ``slots_per_class`` are parsed as
strings so that a comma list triggers a grid sweep (``train.py:207-230``).
Sweep expansion happens in :func:`expand_sweep`; a resolved
:class:`ScouterConfig` always carries scalar values.

TPU-specific flags replace the torch.distributed ones: ``device`` accepts
'tpu'/'cpu', and mesh shape replaces world_size/local_rank/dist_url (the
reference's NCCL bootstrap, ``tools/prepare_things.py:9-31``, has no equivalent
— jax initializes devices implicitly; multi-host uses jax.distributed).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Iterator, List, Optional, Tuple

__all__ = ["ScouterConfig", "get_args_parser", "config_from_args", "expand_sweep", "checkpoint_name"]

_SWEEPABLE = ("num_classes", "lambda_value", "power", "slots_per_class")
_SWEEP_TYPES = (int, float, int, int)  # train.py:210-211


def str2bool(v: str) -> bool:
    """train.py:19-25 semantics."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Unsupported value encountered.")


@dataclasses.dataclass
class ScouterConfig:
    # model / dataset
    model: str = "resnet18"
    dataset: str = "MNIST"
    channel: int = 512

    # training
    lr: float = 1e-4
    lr_drop: int = 70
    batch_size: int = 64
    weight_decay: float = 1e-4
    epochs: int = 10
    num_classes: int = 10
    img_size: int = 260
    pre_trained: bool = True
    use_slot: bool = True
    use_pre: bool = False
    aug: bool = False
    grad: bool = False
    grad_min_level: float = 0.0
    iterated_evaluation_num: int = 1
    cal_area_size: bool = False
    thop: bool = False

    # slot settings
    loss_status: int = 1
    freeze_layers: int = 2
    hidden_dim: int = 64
    slots_per_class: int = 3
    power: int = 2
    to_k_layer: int = 1
    lambda_value: float = 1.0
    vis: bool = False
    vis_id: int = 0

    # data / machine
    dataset_dir: str = "data/"
    output_dir: str = "saved_model/"
    pre_dir: str = "pre_model/"
    device: str = "tpu"
    num_workers: int = 4
    start_epoch: int = 0
    resume: bool = False

    # TPU parallelism (replaces world_size/local_rank/dist_url)
    mesh_shape: Optional[Tuple[int, ...]] = None  # None -> (num_devices,)
    mesh_axes: Tuple[str, ...] = ("data",)
    # True (default): BN statistics over the GLOBAL batch (plain jit over the
    # sharded batch — better numerics). False: per-replica BN via shard_map,
    # matching the reference's DDP semantics (BN never synced, train.py:139-141).
    sync_bn: bool = True
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # dtype of the slot head (conv1x1 + xSlot) under bf16 training:
    # 'compute' follows compute_dtype; 'float32' keeps the head fp32 — the
    # default, because negative training (loss_status=-1) loses ~4 pts val acc
    # in a full-bf16 head (docs/RESULTS_round3_bf16_negative.md) while the head
    # is <1% of model FLOPs
    slot_head_dtype: str = "float32"  # 'float32' | 'compute'
    # ZeRO-1: store AdamW mu/nu sharded over the 'data' mesh axis
    # (parallel/tp.py); requires sync_bn=True
    zero1: bool = False
    # resilience (no reference counterpart): SIGTERM -> finish the current
    # step, checkpoint with the batch cursor, exit; --resume continues from
    # exactly that step (train/preempt.py). ckpt_async overlaps checkpoint
    # serialization + disk IO with the next epoch's compute.
    preempt_save: bool = False
    ckpt_async: bool = False
    seed: int = 0

    def replace(self, **kw) -> "ScouterConfig":
        return dataclasses.replace(self, **kw)

    @property
    def feature_size(self) -> int:
        # densenet backbones give an 8x8 map at 260px, others 9x9
        # (sloter/slot_model.py:61-64)
        return 8 if "densenet" in self.model else 9


def get_args_parser() -> argparse.ArgumentParser:
    """Argparse schema with the reference's flag names and defaults."""
    p = argparse.ArgumentParser("Set SCOUTER-TPU model", add_help=False)
    p.add_argument("--model", default="resnet18", type=str)
    p.add_argument("--dataset", default="MNIST", type=str)
    p.add_argument("--channel", default=512, type=int)

    p.add_argument("--lr", default=0.0001, type=float)
    p.add_argument("--lr_drop", default=70, type=int)
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--weight_decay", default=0.0001, type=float)
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--num_classes", default="10", type=str)  # sweepable
    p.add_argument("--img_size", default=260, type=int)
    p.add_argument("--pre_trained", default=True, type=str2bool)
    p.add_argument("--use_slot", default=True, type=str2bool)
    p.add_argument("--use_pre", default=False, type=str2bool)
    p.add_argument("--aug", default=False, type=str2bool)
    p.add_argument("--grad", default=False, type=str2bool)
    p.add_argument("--grad_min_level", default=0.0, type=float)
    p.add_argument("--iterated_evaluation_num", default=1, type=int)
    p.add_argument("--cal_area_size", default=False, type=str2bool)
    p.add_argument("--thop", default=False, type=str2bool)

    p.add_argument("--loss_status", default=1, type=int)
    p.add_argument("--freeze_layers", default=2, type=int)
    p.add_argument("--hidden_dim", default=64, type=int)
    p.add_argument("--slots_per_class", default="3", type=str)  # sweepable
    p.add_argument("--power", default="2", type=str)  # sweepable
    p.add_argument("--to_k_layer", default=1, type=int)
    p.add_argument("--lambda_value", default="1.", type=str)  # sweepable
    p.add_argument("--vis", default=False, type=str2bool)
    p.add_argument("--vis_id", default=0, type=int)

    p.add_argument("--dataset_dir", default="data/")
    p.add_argument("--output_dir", default="saved_model/")
    p.add_argument("--pre_dir", default="pre_model/")
    p.add_argument("--device", default="tpu")
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--resume", default=False, type=str2bool)

    p.add_argument("--mesh_shape", default=None, type=str,
                   help="comma list, e.g. '8' or '4,2' (data[,model])")
    p.add_argument("--sync_bn", default=True, type=str2bool,
                   help="True: global-batch BN stats; False: per-replica BN "
                        "(reference DDP semantics)")
    p.add_argument("--compute_dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--slot_head_dtype", default="float32", choices=["float32", "compute"],
                   help="keep the slot head fp32 under bf16 training (default) "
                        "or follow compute_dtype")
    p.add_argument("--zero1", default=False, type=str2bool,
                   help="shard optimizer state over the data mesh axis (ZeRO-1)")
    p.add_argument("--preempt_save", default=False, type=str2bool,
                   help="on SIGTERM, checkpoint mid-epoch with the batch "
                        "cursor and exit; --resume continues from that step")
    p.add_argument("--ckpt_async", default=False, type=str2bool,
                   help="serialize+write checkpoints on a background thread")
    p.add_argument("--seed", default=0, type=int)
    return p


def expand_sweep(ns: argparse.Namespace) -> Iterator[Tuple[Optional[str], "ScouterConfig"]]:
    """param_translation parity (``train.py:207-230``).

    Yields (sweep_key or None, resolved config). A comma list in exactly one of
    the sweepable flags produces one config per value (the reference only sweeps
    the first flag found with a comma, in _SWEEPABLE order).
    """
    raw = {k: str(getattr(ns, k)) for k in _SWEEPABLE}
    target = None
    for name, typ in zip(_SWEEPABLE, _SWEEP_TYPES):
        if target is None and raw[name].find(",") > 0:
            target = (name, typ, raw[name].split(","))
        else:
            setattr(ns, name, typ(raw[name]))

    if target is None:
        yield None, config_from_args(ns)
        return

    name, typ, values = target
    for v in values:
        setattr(ns, name, typ(v))
        yield f"{name}-{v}", config_from_args(ns)


def config_from_args(ns: argparse.Namespace) -> ScouterConfig:
    fields = {f.name for f in dataclasses.fields(ScouterConfig)}
    kw = {}
    for k, v in vars(ns).items():
        if k not in fields:
            continue
        kw[k] = v
    # scalar coercion for sweepables when caller bypassed expand_sweep
    for name, typ in zip(_SWEEPABLE, _SWEEP_TYPES):
        if name in kw and isinstance(kw[name], str):
            kw[name] = typ(kw[name])
    if isinstance(kw.get("mesh_shape"), str):
        kw["mesh_shape"] = tuple(int(s) for s in kw["mesh_shape"].split(","))
    return ScouterConfig(**kw)


def checkpoint_name(cfg: ScouterConfig, epoch: Optional[int] = None) -> str:
    """The reference's config-derived checkpoint naming convention
    (``train.py:181-196``, re-derived by ``test.py:59-62`` — a de-facto API)."""
    name = f"{cfg.dataset}_"
    name += "use_slot_" if cfg.use_slot else "no_slot_"
    if cfg.use_slot and cfg.loss_status != 1:
        name += "negative_"
    if cfg.cal_area_size:
        name += f"for_area_size_{cfg.lambda_value}_{cfg.slots_per_class}_"
    if epoch is None:
        return name + "checkpoint"
    return name + f"checkpoint{epoch:04d}"

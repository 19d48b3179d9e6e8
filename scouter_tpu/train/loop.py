"""Epoch driver — train.py:82-204 + engine.py semantics, TPU execution model.

Differences from the reference, by design:
- the inner loop is a single compiled step per batch (no .to(device), no
  zero_grad/backward/step choreography);
- metric accumulation happens on device in running sums, transferred once per
  epoch (the reference does a .item() sync every batch, ``engine.py:36``);
- checkpointing is rank-0 msgpack with the reference's naming cadence.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import (
    AsyncCheckpointWriter,
    checkpoint_path,
    restore_checkpoint,
    save_checkpoint,
)
from ..core.config import ScouterConfig
from ..data import Loader, select_dataset
from ..models import build_slot_model
from ..parallel.mesh import make_mesh
from .state import create_train_state, step_lr
from .steps import make_eval_step, make_train_step, set_learning_rate

__all__ = ["MetricLog", "Trainer", "run_training"]


class MetricLog:
    """record dict parity (tools/calculate_tool.py:18-31)."""

    def __init__(self):
        self.record: Dict[str, Dict[str, List[float]]] = {
            "train": {"loss": [], "acc": [], "log_loss": [], "att_loss": []},
            "val": {"loss": [], "acc": [], "log_loss": [], "att_loss": []},
        }

    def append(self, mode: str, metrics: Dict[str, float]) -> None:
        for k in ("loss", "acc", "log_loss", "att_loss"):
            self.record[mode][k].append(round(float(metrics[k]), 3))

    def print_metric(self) -> None:
        r = self.record
        print("train loss:", r["train"]["loss"])
        print("val loss:", r["val"]["loss"])
        print("train acc:", r["train"]["acc"])
        print("val acc:", r["val"]["acc"])
        print("train CE loss", r["train"]["log_loss"])
        print("val CE loss", r["val"]["log_loss"])
        print("train attention loss", r["train"]["att_loss"])
        print("val attention loss", r["val"]["att_loss"])


def _average(metric_sums: Dict[str, Any], n: int) -> Dict[str, float]:
    return {k: float(v) / max(n, 1) for k, v in metric_sums.items()}


class Trainer:
    """Owns model/state/steps/loaders for one config."""

    def __init__(self, cfg: ScouterConfig, mesh=None, datasets=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh_shape, cfg.mesh_axes)
        # bf16 training path: compute_dtype='bfloat16' runs convs/matmuls on the
        # MXU in bf16 with fp32 master params (flax param_dtype default) and an
        # fp32 loss reduction (ops/losses.py upcasts the logits).
        self.compute_dtype = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        )
        self.model = build_slot_model(cfg, dtype=self.compute_dtype)

        if datasets is None:
            ds_train = select_dataset(cfg, train=True)
            ds_val = select_dataset(cfg, train=False)
        else:
            ds_train, ds_val = datasets

        self.loader_train = Loader(
            ds_train, cfg.batch_size, img_size=cfg.img_size, train=True,
            aug=cfg.aug, seed=cfg.seed, mesh=self.mesh,
        )
        self.loader_val = Loader(
            ds_val, cfg.batch_size, img_size=cfg.img_size, train=False,
            seed=cfg.seed, mesh=self.mesh,
        )

        # batch 1: param shapes are batch-independent and model.init runs a
        # real forward — the full training batch would cost ~bs x the FLOPs
        # and peak memory for identical params
        sample_shape = (1, cfg.img_size, cfg.img_size,
                        1 if cfg.dataset == "MNIST" else 3)
        variables = self.model.init(
            jax.random.PRNGKey(cfg.seed), np.zeros(sample_shape, np.float32)
        )
        self.state, self.tx = create_train_state(
            variables, cfg.lr, freeze_layers=cfg.freeze_layers, pre_trained=cfg.pre_trained
        )
        self._place_state()
        self.train_step = make_train_step(self.model, self.tx, float(cfg.lambda_value),
                                           mesh=self.mesh, sync_bn=cfg.sync_bn,
                                           state_shardings=self.state_shardings)
        self.eval_step = make_eval_step(self.model, float(cfg.lambda_value))
        self.log = MetricLog()
        self.start_epoch = cfg.start_epoch
        # resilience (production value-add; no reference counterpart):
        # --preempt_save: SIGTERM -> finish the current step, checkpoint with
        # the batch cursor, exit; --ckpt_async: overlap checkpoint
        # serialization/IO with the next epoch (train/preempt.py docs)
        self._skip_batches = 0  # mid-epoch resume cursor
        self._preempted_at = None  # (epoch, completed_batches) once triggered
        self._preempt_sums = None  # interrupted epoch's (metric sums, n)
        self._resume_metric_sums = None  # restored sums for the redone epoch
        self._preempt_exit = False  # SIGTERM during val: exit after the epoch
        # multi-process preemption-consensus poll interval, in batches
        # (_stop_consensus docstring); tests that assert exact stop indices
        # on tiny epochs set this to 1
        self.consensus_every = 8
        self.guard = None
        if getattr(cfg, "preempt_save", False):
            from .preempt import PreemptionGuard

            self.guard = PreemptionGuard().install()
        self.ckpt_writer = (
            AsyncCheckpointWriter() if getattr(cfg, "ckpt_async", False) else None
        )

    def _place_state(self) -> None:
        """Tensor-parallel / ZeRO-1 placement (parallel/tp.py): when the mesh
        carries a 'model' axis (or ``zero1`` is on), the TrainState is sharded
        per the GSPMD rules and the step output is pinned to the same layout."""
        from ..parallel.tp import shard_train_state, tp_enabled

        self.state_shardings = None
        if tp_enabled(self.mesh) or getattr(self.cfg, "zero1", False):
            if not self.cfg.sync_bn:
                raise ValueError(
                    "tensor parallelism / zero1 requires sync_bn=True (the "
                    "per-replica-BN shard_map path is data-axis-only)")
            self.state, self.state_shardings = shard_train_state(
                self.state, self.mesh, zero1=getattr(self.cfg, "zero1", False))

    def load_variables(self, variables: Dict[str, Any]) -> None:
        """Replace params/batch_stats (e.g. from a converted torch checkpoint or
        the use_pre backbone handoff) keeping optimizer state fresh."""
        self.state, self.tx = create_train_state(
            variables, self.cfg.lr,
            freeze_layers=self.cfg.freeze_layers, pre_trained=self.cfg.pre_trained,
        )
        self._place_state()
        self.train_step = make_train_step(self.model, self.tx, float(self.cfg.lambda_value),
                                           mesh=self.mesh, sync_bn=self.cfg.sync_bn,
                                           state_shardings=self.state_shardings)

    def maybe_use_pre(self) -> None:
        """use_pre backbone handoff (``sloter/slot_model.py:26-33``): boot the
        slot model's backbone from the no-slot checkpoint of the same dataset
        (``saved_model/{ds}_no_slot_checkpoint``), slot head stays fresh."""
        if not (self.cfg.use_slot and self.cfg.use_pre):
            return
        # the reference always loads the PLAIN '{ds}_no_slot_checkpoint'
        # (slot_model.py:27) — cal_area_size only decorates the name of the
        # run being trained, never the pretraining handoff source
        no_slot_cfg = self.cfg.replace(use_slot=False, loss_status=1,
                                       cal_area_size=False)
        path = checkpoint_path(self.cfg.output_dir, no_slot_cfg)
        # restore onto a no-slot template to get its params, then graft the
        # backbone subtree into our state
        no_slot_model = build_slot_model(no_slot_cfg)
        sample = np.zeros(
            (1, self.cfg.img_size, self.cfg.img_size,
             1 if self.cfg.dataset == "MNIST" else 3), np.float32,
        )
        ns_vars = no_slot_model.init(jax.random.PRNGKey(0), sample)
        ns_state, _ = create_train_state(ns_vars, self.cfg.lr)
        ns_state, _, _ = restore_checkpoint(path, ns_state)
        variables = {
            "params": {**self.state.params, "backbone": ns_state.params["backbone"]},
        }
        if self.state.batch_stats is not None:
            variables["batch_stats"] = {
                **self.state.batch_stats, "backbone": ns_state.batch_stats["backbone"],
            }
        self.load_variables(variables)
        print("load pre dataset parameter over")

    # timm default_cfg (first_conv, classifier) names for the local
    # pretrained-weight path, per family (timm */default_cfgs)
    _PRETRAINED_LAYOUT = {
        "efficientnet": ("conv_stem", "classifier"),
        "mobilenet": ("conv_stem", "classifier"),
        "densenet": ("features.conv0", "classifier"),
    }

    def maybe_load_pretrained(self) -> None:
        """``pretrained=True`` capability (timm helpers.py:68-101 +
        factory.py): the reference downloads a torch checkpoint and loads it
        with in_chans/classifier adjustments. Zero-egress equivalent: read a
        local torch state_dict from ``$SCOUTER_TPU_PRETRAINED_DIR/{model}.pth``
        (default ``pretrained/``), convert, and graft into the backbone. A
        missing file keeps random init (same as the reference's warning path,
        helpers.py:70-73). For MNIST the stem conv is replaced by the 1-channel
        surgery conv (slot_model.py:23-24), so the stem weights are dropped."""
        import os

        if not self.cfg.pre_trained:
            return
        d = os.environ.get("SCOUTER_TPU_PRETRAINED_DIR", "pretrained")
        path = os.path.join(d, f"{self.cfg.model}.pth")
        if not os.path.isfile(path):
            return
        import torch

        from ..models import (
            merge_variables,
            prepare_pretrained_state_dict,
            torch_state_dict_to_variables,
        )

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        first_conv, classifier = ("conv1", "fc")
        for key, layout in self._PRETRAINED_LAYOUT.items():
            if key in self.cfg.model:
                first_conv, classifier = layout
        sd = prepare_pretrained_state_dict(
            sd, num_classes=self.cfg.num_classes, classifier=classifier)
        if self.cfg.dataset == "MNIST":
            sd = {k: v for k, v in sd.items() if not k.startswith(first_conv + ".")}
        loaded = torch_state_dict_to_variables(sd)
        variables = {"params": {
            **self.state.params,
            "backbone": merge_variables(self.state.params["backbone"],
                                        loaded.get("params", {})),
        }}
        if self.state.batch_stats is not None:
            variables["batch_stats"] = {
                **self.state.batch_stats,
                "backbone": merge_variables(self.state.batch_stats["backbone"],
                                            loaded.get("batch_stats", {})),
            }
        self.load_variables(variables)
        print(f"loaded pretrained backbone from {path}")

    def maybe_resume(self) -> None:
        path = checkpoint_path(self.cfg.output_dir, self.cfg)
        if self.cfg.resume:
            # TP/ZeRO-1: re-place onto the pinned layout before the restored
            # state re-enters the donated GSPMD step (core/checkpoint.py docs)
            self.state, epoch, _, batch, extras = restore_checkpoint(
                path, self.state, shardings=self.state_shardings,
                return_batch=True, return_extras=True)
            if batch is not None:
                # preemption snapshot: redo epoch `epoch` from its batch
                # cursor — the epoch-seeded loader makes the skip exact
                self.start_epoch = epoch
                self._skip_batches = batch
                self._resume_metric_sums = extras.get("metric_sums")
                print(f"resumed from {path} at epoch {epoch}, batch {batch}")
            else:
                self.start_epoch = epoch + 1
                print(f"resumed from {path} at epoch {epoch}")

    def _stop_consensus(self, bi: int) -> bool:
        """Cross-process-consistent preemption decision.

        SIGTERM delivery timing differs per worker in a multi-host run; a rank
        that broke out of the epoch alone would enter the checkpoint's
        process_allgather while the others are still in train_step's psum —
        deadlock — and their optimizer states would diverge. So ranks
        max-reduce their local flags and all stop at the SAME batch index.
        Single-process (the common case) short-circuits to the local flag
        with zero overhead.

        Multi-process, the allgather is a blocking host collective that would
        serialize JAX's async dispatch if run every batch (the epoch loop
        otherwise never syncs on the step), so it polls every
        ``consensus_every`` batches. Every rank evaluates the same condition
        at the same ``bi``, so the collective stays aligned and the agreed
        stop index is unchanged in kind; preemption latency grows to at most
        ``consensus_every`` steps — well inside any SIGTERM grace window."""
        local = self.guard is not None and self.guard.triggered
        if self.guard is not None and jax.process_count() > 1:
            if (bi + 1) % self.consensus_every:
                return False
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(np.int32(local))
            return bool(np.max(flags))
        return local

    def run_epoch(self, epoch: int, mode: str) -> Dict[str, float]:
        loader = self.loader_train if mode == "train" else self.loader_val
        sums = None
        n = 0
        # mid-epoch resume: consume (but don't step on) the first
        # `_skip_batches` batches so the per-batch augmentation keys
        # (fold_in(key, batch_index)) stay aligned with the interrupted run;
        # seed the metric sums from the interrupted epoch's snapshot so the
        # logged average covers all batches, not just the suffix
        skip = self._skip_batches if mode == "train" else 0
        self._skip_batches = 0
        if mode == "train" and skip and self._resume_metric_sums is not None:
            sums = dict(self._resume_metric_sums["sums"])
            n = int(self._resume_metric_sums["n"])
            self._resume_metric_sums = None
        print(f"start {mode} :{epoch}")
        for bi, batch in enumerate(loader.epoch(epoch)):
            if bi < skip:
                continue
            if mode == "train":
                self.state, metrics = self.train_step(self.state, batch)
            else:
                metrics = self.eval_step(self.state, batch)
            sums = metrics if sums is None else jax.tree_util.tree_map(
                lambda a, b: a + b, sums, metrics
            )
            n += 1
            if self.guard is not None and self._stop_consensus(bi):
                if mode == "train":
                    self._preempted_at = (epoch, bi + 1)
                    self._preempt_sums = {
                        "sums": {k: float(v)
                                 for k, v in jax.device_get(sums).items()},
                        "n": n,
                    }
                else:
                    # SIGTERM mid-val: no cursor needed — the epoch-boundary
                    # checkpoint already exists; exit promptly (the logged val
                    # average covers only the prefix of this epoch)
                    self._preempt_exit = True
                break
        avg = _average(jax.device_get(sums) if sums else
                       {k: 0.0 for k in ("loss", "acc", "log_loss", "att_loss")}, n)
        self.log.append(mode, avg)
        return avg

    def fit(self) -> List[float]:
        cfg = self.cfg
        self.maybe_load_pretrained()
        self.maybe_use_pre()
        self.maybe_resume()
        start = time.time()
        for epoch in range(self.start_epoch, cfg.epochs):
            # StepLR: lr for this epoch (scheduler.step() after each epoch in the
            # reference means epoch e runs at lr * gamma^(e // lr_drop))
            self.state = set_learning_rate(self.state, step_lr(cfg.lr, epoch, cfg.lr_drop))
            self.run_epoch(epoch, "train")
            if self._preempted_at is not None:
                # graceful preemption: durably checkpoint the batch cursor
                # (synchronous write — the process is about to exit), then
                # stop; --resume continues from exactly this step
                ep, nb = self._preempted_at
                if cfg.output_dir:
                    if self.ckpt_writer is not None:
                        self.ckpt_writer.drain()
                    save_checkpoint(cfg.output_dir, cfg, self.state, ep,
                                    batch=nb, metric_sums=self._preempt_sums)
                    print(f"[preempt] checkpointed epoch {ep} at batch {nb}; "
                          "exiting")
                else:
                    print(f"[preempt] no output_dir: exiting at epoch {ep}, "
                          f"batch {nb} WITHOUT a checkpoint")
                break
            if cfg.output_dir:
                save_checkpoint(cfg.output_dir, cfg, self.state, epoch,
                                writer=self.ckpt_writer)
            self.run_epoch(epoch, "val")
            self.log.print_metric()
            if self._preempt_exit:
                print(f"[preempt] exiting after interrupted val epoch {epoch} "
                      "(epoch-boundary checkpoint already written)")
                break
        if self.ckpt_writer is not None:
            self.ckpt_writer.drain()
        if self.guard is not None:
            self.guard.uninstall()
        total = time.time() - start
        print(f"Training time {total:.1f}s")
        r = self.log.record
        return [
            r["train"]["acc"][-1] if r["train"]["acc"] else 0.0,
            r["val"]["acc"][-1] if r["val"]["acc"] else 0.0,
        ]


def run_training(cfg: ScouterConfig, datasets=None) -> List[float]:
    """main(args) equivalent: returns [last train acc, last val acc]
    (train.py:204)."""
    return Trainer(cfg, datasets=datasets).fit()

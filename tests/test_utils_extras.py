"""Tests for the utility layer + optimizer/scheduler/loss factories + use_pre."""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch

from scouter_tpu.ops.extra_losses import (
    jsd_cross_entropy,
    label_smoothing_cross_entropy,
    soft_target_cross_entropy,
)
from scouter_tpu.train.optim_factory import create_optimizer, no_decay_mask
from scouter_tpu.train.scheduler_factory import PlateauScheduler, create_scheduler
from scouter_tpu.utils import (
    CheckpointSaver,
    ModelEma,
    evaluate_top1,
    evaluate_top5,
    update_summary,
)


class TestMetrics:
    def test_top1_top5_match_torch_semantics(self):
        torch.manual_seed(0)
        logits = torch.randn(32, 10)
        labels = torch.randint(0, 10, (32,))
        ref1 = (logits.argmax(1) == labels).float().mean().item()
        maxk = 5
        _, pred = logits.topk(maxk, 1, True, True)
        ref5 = torch.eq(pred, labels.view(-1, 1)).sum().float().item() / 32
        assert float(evaluate_top1(jnp.asarray(logits.numpy()), jnp.asarray(labels.numpy()))) == pytest.approx(ref1)
        assert float(evaluate_top5(jnp.asarray(logits.numpy()), jnp.asarray(labels.numpy()))) == pytest.approx(ref5)


class TestEma:
    def test_decay_math(self):
        p = {"w": jnp.zeros((3,))}
        ema = ModelEma(p, decay=0.9)
        ema.update({"w": jnp.ones((3,))})
        np.testing.assert_allclose(np.asarray(ema.params["w"]), 0.1, rtol=1e-6)


class TestSummary:
    def test_csv_rows(self, tmp_path):
        f = str(tmp_path / "summary.csv")
        update_summary(0, {"loss": 1.0}, {"acc": 0.5}, f)
        update_summary(1, {"loss": 0.5}, {"acc": 0.6}, f)
        lines = open(f).read().strip().splitlines()
        assert lines[0] == "epoch,train_loss,eval_acc"
        assert len(lines) == 3


class TestSaver:
    def test_topk_ranking(self, tmp_path):
        saver = CheckpointSaver(str(tmp_path), max_history=2)
        saver.save_checkpoint(b"a", 0, 0.5)
        saver.save_checkpoint(b"b", 1, 0.7)
        saver.save_checkpoint(b"c", 2, 0.6)  # evicts 0.5
        kept = {m for _, m in saver.checkpoint_files}
        assert kept == {0.7, 0.6}
        assert saver.best_metric == 0.7
        assert os.path.exists(os.path.join(str(tmp_path), "model_best.msgpack"))

    def test_recovery(self, tmp_path):
        saver = CheckpointSaver(str(tmp_path))
        saver.save_recovery(b"x", 1, 10)
        p = saver.save_recovery(b"y", 1, 20)
        assert saver.find_recovery() == p
        files = [f for f in os.listdir(str(tmp_path)) if f.startswith("recovery")]
        assert len(files) == 1


class TestOptimFactory:
    @pytest.mark.parametrize("name", ["sgd", "adam", "adamw", "radam", "nadam",
                                      "rmsprop", "novograd", "lamb", "lookahead_adamw"])
    def test_optimizers_step(self, name):
        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
        tx = create_optimizer(name, lr=0.01, weight_decay=0.01, params=params)
        state = tx.init(params)
        grads = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
        updates, state = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert float(jnp.abs(new["w"] - params["w"]).max()) > 0

    def test_no_decay_mask(self):
        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,)), "scale": jnp.ones((4,))}
        mask = no_decay_mask(params)
        assert mask["w"] is True and mask["b"] is False and mask["scale"] is False


class TestSchedFactory:
    def test_step_matches_reference_steplr(self):
        s = create_scheduler("step", 1e-4, epochs=200, decay_epochs=70)
        assert s(0) == pytest.approx(1e-4)
        assert s(70) == pytest.approx(1e-5)

    def test_cosine_with_warmup(self):
        s = create_scheduler("cosine", 1.0, epochs=10, warmup_epochs=2, warmup_lr_init=0.0,
                             min_lr=0.0)
        assert s(0) == pytest.approx(0.0)
        assert s(1) == pytest.approx(0.5)
        # warmup_prefix=False (timm default): cosine evaluated at raw t
        assert s(2) == pytest.approx(0.5 * (1 + math.cos(math.pi * 2 / 10)))
        assert s(10) < 0.05

    def test_tanh_monotone(self):
        s = create_scheduler("tanh", 1.0, epochs=10, min_lr=0.01)
        vals = [s(e) for e in range(10)]
        assert all(a >= b for a, b in zip(vals, vals[1:]))

    def test_plateau(self):
        p = PlateauScheduler(1.0, patience=1, decay_rate=0.1)
        assert p.step(0.5) == 1.0
        assert p.step(0.5) == 1.0  # bad 1
        assert p.step(0.5) == pytest.approx(0.1)  # bad 2 > patience


class TestExtraLosses:
    def test_label_smoothing_matches_manual(self):
        torch.manual_seed(1)
        logits = torch.randn(8, 5)
        labels = torch.randint(0, 5, (8,))
        logp = torch.nn.functional.log_softmax(logits, dim=-1)
        nll = -logp.gather(1, labels[:, None]).squeeze(1)
        ref = (0.9 * nll + 0.1 * (-logp.mean(-1))).mean().item()
        got = float(label_smoothing_cross_entropy(
            jnp.asarray(logits.numpy()), jnp.asarray(labels.numpy()), 0.1))
        assert got == pytest.approx(ref, rel=1e-5)

    def test_soft_target(self):
        logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
        onehot = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        val = float(soft_target_cross_entropy(logits, onehot))
        ref = float(-jax.nn.log_softmax(logits)[0, 0])
        assert val == pytest.approx(ref, rel=1e-6)

    def test_jsd_zero_for_identical(self):
        logits = jnp.asarray(np.random.RandomState(0).randn(4, 6).astype(np.float32))
        labels = jnp.asarray([0, 1, 2, 3])
        j_same = float(jsd_cross_entropy(logits, logits, logits, labels, alpha=12.0))
        ce = float(label_smoothing_cross_entropy(logits, labels))
        assert j_same == pytest.approx(ce, rel=1e-5)


class TestUsePre:
    def test_backbone_handoff(self, tmp_path):
        from scouter_tpu.core.checkpoint import save_checkpoint
        from scouter_tpu.train import Trainer
        from test_train import make_datasets, small_cfg

        # 1) train the no-slot model one epoch and save its checkpoint
        ns_cfg = small_cfg(use_slot=False, output_dir=str(tmp_path))
        t1 = Trainer(ns_cfg, datasets=make_datasets())
        t1.run_epoch(0, "train")
        save_checkpoint(str(tmp_path), ns_cfg, t1.state, 0)
        bb_kernel = np.asarray(t1.state.params["backbone"]["conv1"]["kernel"])

        # 2) build the slot model with use_pre and verify backbone params moved in
        slot_cfg = small_cfg(use_slot=True, use_pre=True, output_dir=str(tmp_path))
        t2 = Trainer(slot_cfg, datasets=make_datasets())
        before = np.asarray(t2.state.params["backbone"]["conv1"]["kernel"])
        assert np.abs(before - bb_kernel).max() > 0  # different init
        t2.maybe_use_pre()
        after = np.asarray(t2.state.params["backbone"]["conv1"]["kernel"])
        np.testing.assert_array_equal(after, bb_kernel)

    def test_handoff_ignores_cal_area_size(self, tmp_path):
        """The reference always loads the PLAIN '{ds}_no_slot_checkpoint'
        (slot_model.py:27) — a cal_area_size slot run must not look for a
        'for_area_size'-decorated no-slot file that was never written."""
        from scouter_tpu.core.checkpoint import save_checkpoint
        from scouter_tpu.train import Trainer
        from test_train import make_datasets, small_cfg

        ns_cfg = small_cfg(use_slot=False, output_dir=str(tmp_path))
        t1 = Trainer(ns_cfg, datasets=make_datasets())
        save_checkpoint(str(tmp_path), ns_cfg, t1.state, 0)
        bb_kernel = np.asarray(t1.state.params["backbone"]["conv1"]["kernel"])

        slot_cfg = small_cfg(use_slot=True, use_pre=True,
                             cal_area_size=True, output_dir=str(tmp_path))
        t2 = Trainer(slot_cfg, datasets=make_datasets())
        t2.maybe_use_pre()  # raised FileNotFoundError before the fix
        np.testing.assert_array_equal(
            np.asarray(t2.state.params["backbone"]["conv1"]["kernel"]), bb_kernel)


class TestOptimizerReferenceParity:
    """Trajectory parity vs the vendored timm optimizers (timm/optim/)."""

    @staticmethod
    def _setup_ref():
        from test_models import install_reference_stubs

        install_reference_stubs()

    @staticmethod
    def _torch_traj(opt_cls, w0, grads, **kw):
        import torch

        p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = opt_cls([p], **kw)
        out = []
        for g in grads:
            opt.zero_grad()
            p.grad = torch.from_numpy(g.copy())
            opt.step()
            out.append(p.detach().numpy().copy())
        return np.array(out)

    @staticmethod
    def _optax_traj(tx, w0, grads):
        params = jnp.asarray(w0, jnp.float32)
        state = tx.init(params)
        out = []
        for g in grads:
            upd, state = tx.update(jnp.asarray(g, jnp.float32), state, params)
            params = optax.apply_updates(params, upd)
            out.append(np.asarray(params))
        return np.array(out)

    @pytest.mark.parametrize("name", ["nadam", "novograd", "nvnovograd",
                                      "radam", "rmsproptf"])
    def test_trajectories_match_timm(self, name):
        self._setup_ref()
        from scouter_tpu.train.optim_factory import create_optimizer

        w0 = np.linspace(-1, 1, 8).astype(np.float32)
        grads = [np.sin(np.arange(8) + t).astype(np.float32) for t in range(6)]

        if name == "nadam":
            from timm.optim.nadam import Nadam as RefOpt
            kw = dict(lr=0.01, weight_decay=0.02)
        elif name == "novograd":
            from timm.optim.novograd import NovoGrad as RefOpt
            kw = dict(lr=0.01, weight_decay=0.02)
        elif name == "nvnovograd":
            from timm.optim.nvnovograd import NvNovoGrad as RefOpt
            kw = dict(lr=0.01, weight_decay=0.02)
        elif name == "radam":
            from timm.optim.radam import RAdam as RefOpt
            kw = dict(lr=0.01)
        else:
            from timm.optim.rmsprop_tf import RMSpropTF as RefOpt
            kw = dict(lr=0.01, momentum=0.9, eps=1e-8)

        want = self._torch_traj(RefOpt, w0.astype(np.float64),
                                [g.astype(np.float64) for g in grads], **kw)
        # weight-decay masking needs 2D params to apply decay; pass params=None
        # so decay applies to the flat test param like the torch groups do
        tx = create_optimizer(name, lr=0.01,
                              weight_decay=kw.get("weight_decay", 0.0),
                              momentum=0.9, eps=kw.get("eps", 1e-8))
        got = self._optax_traj(tx, w0, grads)
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


class TestSchedulerReferenceParity:
    """Epoch-lr trajectory parity vs the vendored timm schedulers."""

    @staticmethod
    def _ref_sched(cls_name, **kw):
        TestOptimizerReferenceParity._setup_ref()
        import torch

        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=kw.pop("base_lr"))
        if cls_name == "cosine":
            from timm.scheduler.cosine_lr import CosineLRScheduler
            return CosineLRScheduler(opt, **kw)
        if cls_name == "tanh":
            from timm.scheduler.tanh_lr import TanhLRScheduler
            return TanhLRScheduler(opt, **kw)
        from timm.scheduler.step_lr import StepLRScheduler
        return StepLRScheduler(opt, **kw)

    @pytest.mark.parametrize("case", [
        ("cosine", dict(t_initial=30, lr_min=1e-5, decay_rate=0.5, warmup_t=3,
                        warmup_lr_init=1e-6, cycle_limit=2),
         dict(epochs=30, min_lr=1e-5, decay_rate=0.5, warmup_epochs=3,
              warmup_lr_init=1e-6, cycle_limit=2)),
        ("tanh", dict(t_initial=25, lr_min=1e-4, warmup_t=4, warmup_lr_init=1e-6,
                      cycle_limit=1),
         dict(epochs=25, min_lr=1e-4, decay_rate=1.0, warmup_epochs=4,
              warmup_lr_init=1e-6, cycle_limit=1)),
        ("step", dict(decay_t=10, decay_rate=0.3, warmup_t=2, warmup_lr_init=1e-6),
         dict(epochs=40, decay_epochs=10, decay_rate=0.3, warmup_epochs=2,
              warmup_lr_init=1e-6)),
    ])
    def test_epoch_lr_trajectories(self, case):
        name, ref_kw, my_kw = case
        ref = self._ref_sched(name, base_lr=0.1, **ref_kw)
        mine = create_scheduler(name, 0.1, **my_kw)
        for epoch in range(60):
            want = ref.get_epoch_values(epoch)[0]
            got = mine(epoch)
            assert got == pytest.approx(want, rel=1e-6), (name, epoch, got, want)


class TestLossReferenceParity:
    """Loss values vs the vendored timm loss classes (timm/loss/)."""

    def test_label_smoothing_and_soft_target(self):
        TestOptimizerReferenceParity._setup_ref()
        from timm.loss import LabelSmoothingCrossEntropy, SoftTargetCrossEntropy

        torch.manual_seed(2)
        logits = torch.randn(8, 5)
        labels = torch.randint(0, 5, (8,))
        want = LabelSmoothingCrossEntropy(0.1)(logits, labels).item()
        got = float(label_smoothing_cross_entropy(
            jnp.asarray(logits.numpy()), jnp.asarray(labels.numpy()), 0.1))
        assert got == pytest.approx(want, rel=1e-5)

        onehot = torch.nn.functional.one_hot(labels, 5).float()
        mixed = 0.7 * onehot + 0.3 * onehot.roll(1, 0)
        want2 = SoftTargetCrossEntropy()(logits, mixed).item()
        got2 = float(soft_target_cross_entropy(
            jnp.asarray(logits.numpy()), jnp.asarray(mixed.numpy())))
        assert got2 == pytest.approx(want2, rel=1e-5)

    def test_jsd(self):
        TestOptimizerReferenceParity._setup_ref()
        from timm.loss import JsdCrossEntropy

        torch.manual_seed(3)
        clean = torch.randn(4, 6)
        aug1 = torch.randn(4, 6)
        aug2 = torch.randn(4, 6)
        labels = torch.tensor([0, 1, 2, 3])
        ref_loss = JsdCrossEntropy(num_splits=3, alpha=12, smoothing=0.1)
        want = ref_loss(torch.cat([clean, aug1, aug2]), labels.repeat(3)).item()
        got = float(jsd_cross_entropy(
            jnp.asarray(clean.numpy()), jnp.asarray(aug1.numpy()),
            jnp.asarray(aug2.numpy()), jnp.asarray(labels.numpy()),
            alpha=12.0, smoothing=0.1))
        assert got == pytest.approx(want, rel=1e-4)


class TestWeightDecayMask:
    def test_folded_decay_optimizers_skip_ndim1_params(self):
        """nadam/novograd/nvnovograd fold weight decay into the gradient; the
        add_weight_decay grouping (wd=0 for ndim<=1 leaves — biases, norm
        scales) must survive that folding (timm passes wd per param group)."""
        import jax
        import jax.numpy as jnp

        from scouter_tpu.train.optim_factory import create_optimizer

        import optax

        # two steps with DIFFERENT grads: nadam's first step is element-wise
        # sign-only (update = ±lr·const regardless of |g|), so a single step
        # cannot distinguish wd>0 from wd=0
        rng = np.random.RandomState(0)
        params0 = {"w": jnp.asarray(rng.randn(4, 4).astype(np.float32)),
                   "b": jnp.asarray(rng.randn(4).astype(np.float32))}
        grad_seq = [
            {"w": jnp.asarray(rng.randn(4, 4).astype(np.float32)),
             "b": jnp.asarray(rng.randn(4).astype(np.float32))}
            for _ in range(2)
        ]

        def run(tx):
            params, state = params0, tx.init(params0)
            for g in grad_seq:
                updates, state = tx.update(g, state, params)
                params = optax.apply_updates(params, updates)
            return params

        for name in ("nadam", "novograd", "nvnovograd"):
            p_wd = run(create_optimizer(name, lr=1e-2, weight_decay=0.1,
                                        params=params0))
            p_0 = run(create_optimizer(name, lr=1e-2, weight_decay=0.0,
                                       params=params0))
            # bias (ndim 1): decay must NOT apply -> identical trajectory
            np.testing.assert_allclose(np.asarray(p_wd["b"]),
                                       np.asarray(p_0["b"]), rtol=1e-6,
                                       err_msg=name)
            # weight (ndim 2): decay must apply -> trajectories diverge
            assert np.abs(np.asarray(p_wd["w"]) -
                          np.asarray(p_0["w"])).max() > 1e-7, name

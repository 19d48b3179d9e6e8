"""Production-resilience features (no reference counterpart): graceful
preemption with an exact mid-epoch resume, and async checkpoint writing.

The key contract: the data pipeline is deterministic per (seed, epoch, batch
index) (``data/pipeline.py``), so a preemption snapshot that records the
completed-batch cursor resumes to BIT-IDENTICAL final parameters vs an
uninterrupted run. The reference can only resume at epoch boundaries
(``/root/reference/train.py:163-169``) and loses all mid-epoch progress."""

import os
import signal

import jax
import numpy as np
import pytest

from scouter_tpu.core import ScouterConfig
from scouter_tpu.core.checkpoint import (
    AsyncCheckpointWriter,
    checkpoint_path,
    restore_checkpoint,
    save_checkpoint,
)
from scouter_tpu.data import ArrayDataset, synthetic_mnist
from scouter_tpu.train import PreemptionGuard, Trainer


def small_cfg(**kw):
    base = dict(
        model="resnet10", dataset="MNIST", num_classes=10, channel=512,
        use_slot=True, slots_per_class=1, power=1, loss_status=1, to_k_layer=1,
        lambda_value=1.0, img_size=64, batch_size=8, epochs=2, lr=1e-3,
        pre_trained=False, freeze_layers=0, output_dir="", seed=0,
    )
    base.update(kw)
    return ScouterConfig(**base)


def make_datasets():
    (tr_x, tr_y), (te_x, te_y) = synthetic_mnist(num_train=64, num_test=16)
    return ArrayDataset(tr_x, tr_y, "MNIST"), ArrayDataset(te_x, te_y, "MNIST")


class TriggerAfterSteps:
    """Test double for PreemptionGuard: 'SIGTERM arrives' after N completed
    train steps (the loop polls .triggered exactly once per step)."""

    def __init__(self, n):
        self.n = n
        self.polls = 0

    @property
    def triggered(self):
        self.polls += 1
        return self.polls >= self.n

    def uninstall(self):
        pass


class TestPreemptionGuard:
    def test_signal_sets_flag_and_restores_handler(self):
        prev = signal.getsignal(signal.SIGTERM)
        guard = PreemptionGuard().install()
        assert not guard.triggered
        signal.raise_signal(signal.SIGTERM)
        assert guard.triggered
        guard.uninstall()
        assert signal.getsignal(signal.SIGTERM) is prev

    def test_programmatic_trigger(self):
        guard = PreemptionGuard()
        guard.trigger()
        assert guard.triggered


class TestMidEpochResume:
    def test_preempt_resume_bitwise_equal(self, tmp_path):
        """Interrupt after 3 train steps of epoch 0, resume, finish 2 epochs:
        final params must be bit-identical to the uninterrupted run."""
        datasets = make_datasets()
        cfg = small_cfg(output_dir=str(tmp_path))

        # uninterrupted reference run
        ref = Trainer(cfg.replace(output_dir=""), datasets=datasets)
        ref.fit()

        # interrupted run: "SIGTERM" after 3 steps
        t1 = Trainer(cfg, datasets=datasets)
        t1.guard = TriggerAfterSteps(3)
        t1.fit()
        assert t1._preempted_at == (0, 3)
        path = checkpoint_path(str(tmp_path), cfg)
        _, epoch, _, batch = restore_checkpoint(
            path, Trainer(cfg.replace(output_dir=""), datasets=datasets).state,
            return_batch=True)
        assert (epoch, batch) == (0, 3)

        # resumed run
        t2 = Trainer(cfg.replace(resume=True), datasets=datasets)
        t2.fit()
        assert t2._preempted_at is None

        ref_params = jax.device_get(ref.state.params)
        res_params = jax.device_get(t2.state.params)
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
        flat_res = jax.tree_util.tree_leaves(res_params)
        assert len(flat_ref) == len(flat_res)
        for (kp, a), b in zip(flat_ref, flat_res):
            np.testing.assert_array_equal(
                a, b, err_msg=jax.tree_util.keystr(kp))
        # optimizer step counter must also line up (full TrainState restored)
        assert int(ref.state.step) == int(t2.state.step)

    def test_epoch_boundary_save_has_no_cursor(self, tmp_path):
        cfg = small_cfg(epochs=1, output_dir=str(tmp_path))
        t = Trainer(cfg, datasets=make_datasets())
        t.fit()
        _, epoch, _, batch = restore_checkpoint(
            checkpoint_path(str(tmp_path), cfg), t.state, return_batch=True)
        assert epoch == 0 and batch is None


class TestAsyncCheckpointWriter:
    def test_async_bytes_identical_to_sync(self, tmp_path):
        cfg = small_cfg(epochs=1)
        t = Trainer(cfg, datasets=make_datasets())
        t.run_epoch(0, "train")

        sync_dir, async_dir = tmp_path / "sync", tmp_path / "async"
        save_checkpoint(str(sync_dir), cfg, t.state, epoch=0)
        w = AsyncCheckpointWriter()
        save_checkpoint(str(async_dir), cfg, t.state, epoch=0, writer=w)
        w.close()

        a = (sync_dir / os.path.basename(checkpoint_path(str(sync_dir), cfg))).read_bytes()
        b = (async_dir / os.path.basename(checkpoint_path(str(async_dir), cfg))).read_bytes()
        assert a == b

    def test_writer_error_surfaces_at_drain(self):
        w = AsyncCheckpointWriter()

        def boom():
            raise RuntimeError("disk full")

        w.submit(boom)
        with pytest.raises(RuntimeError, match="disk full"):
            w.drain()
        w.close()

    def test_trainer_ckpt_async_roundtrips(self, tmp_path):
        """End-to-end: --ckpt_async writes a restorable checkpoint by fit-end."""
        datasets = make_datasets()
        cfg = small_cfg(epochs=1, output_dir=str(tmp_path), ckpt_async=True)
        t = Trainer(cfg, datasets=datasets)
        t.fit()
        restored, epoch, _ = restore_checkpoint(
            checkpoint_path(str(tmp_path), cfg), t.state)
        assert epoch == 0
        np.testing.assert_array_equal(
            jax.device_get(t.state.params["slot"]["initial_slots"]),
            jax.device_get(restored.params["slot"]["initial_slots"]))

"""Tensor-parallel (2-D mesh) + ZeRO-1 sharding tests (parallel/tp.py).

The reference is DP-only (SURVEY §2e, ``train.py:139-141``); these verify the
TPU-native scaling extension: Megatron-style channel/slot sharding over a
``model`` mesh axis and data-axis optimizer-state sharding, both realized as
GSPMD annotations — the numerics must match the single-device program (up to
fp32 reduction reassociation) while the arrays are physically partitioned.
"""

import jax
import numpy as np
import pytest

from scouter_tpu.core import ScouterConfig
from scouter_tpu.data import ArrayDataset, synthetic_mnist
from scouter_tpu.parallel import make_mesh, param_partition_spec, tp_enabled
from scouter_tpu.train import Trainer


def _cfg(**kw):
    base = dict(
        model="resnet10", dataset="MNIST", num_classes=10, channel=512,
        use_slot=True, slots_per_class=2, power=2, loss_status=1, to_k_layer=2,
        lambda_value=1.0, img_size=32, batch_size=8, epochs=1,
        pre_trained=False, freeze_layers=0, output_dir="", seed=0,
    )
    base.update(kw)
    return ScouterConfig(**base)


def _datasets(n_train=16, n_test=8):
    (tr_x, tr_y), (te_x, te_y) = synthetic_mnist(num_train=n_train, num_test=n_test)
    return ArrayDataset(tr_x, tr_y, "MNIST"), ArrayDataset(te_x, te_y, "MNIST")


@pytest.fixture(scope="module")
def baseline_metrics():
    """Single-device reference trajectory for the equivalence checks."""
    mesh = make_mesh((1,), devices=jax.devices()[:1])
    tr = Trainer(_cfg(), mesh=mesh, datasets=_datasets())
    return tr.run_epoch(0, "train")


class TestTensorParallel:
    def test_tp_enabled_detection(self):
        assert not tp_enabled(make_mesh((8,)))
        assert tp_enabled(make_mesh((2, 4), ("data", "model")))

    def test_param_partition_rules(self):
        assert param_partition_spec((3, 3, 64, 128), 4)[3] == "model"
        assert param_partition_spec((1, 20, 64), 4)[1] == "model"   # slot bank
        assert param_partition_spec((64,), 4)[0] == "model"          # BN affine
        assert param_partition_spec((3, 3, 64, 126), 4) == jax.sharding.PartitionSpec()

    def test_1d_rule_is_path_aware(self):
        """Slot-head 1-D biases must NOT shard: their producing 2-D weights
        replicate, so a sharded bias would all-gather against replicated
        activations every step (pure collective overhead)."""
        from jax.tree_util import DictKey

        backbone = (DictKey("backbone"), DictKey("layer1_0"), DictKey("bn1"),
                    DictKey("scale"))
        slot_head = (DictKey("slot"), DictKey("gru"), DictKey("bias"))
        assert param_partition_spec((64,), 4, backbone)[0] == "model"
        assert param_partition_spec((192,), 4, slot_head) == \
            jax.sharding.PartitionSpec()
        # end-to-end: a real TP trainer replicates the GRU bias but shards BN
        mesh = make_mesh((2, 4), ("data", "model"))
        tr = Trainer(_cfg(), mesh=mesh, datasets=_datasets())
        gru_b = [x for p, x in jax.tree_util.tree_leaves_with_path(
            tr.state.params["slot"]) if np.ndim(x) == 1 and x.shape[0] % 4 == 0]
        assert gru_b and all(
            x.sharding.spec == jax.sharding.PartitionSpec() for x in gru_b)
        bn = tr.state.params["backbone"]["layer4_0"]["bn1"]["scale"]
        assert bn.sharding.spec[0] == "model"

    def test_tp_step_matches_single_device(self, baseline_metrics):
        mesh = make_mesh((2, 4), ("data", "model"))
        tr = Trainer(_cfg(), mesh=mesh, datasets=_datasets())

        # the slot bank and a conv kernel are physically partitioned
        slots = tr.state.params["slot"]["initial_slots"]
        assert slots.sharding.spec[1] == "model"
        assert slots.addressable_shards[0].data.shape == (1, 5, 64)
        k = tr.state.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert k.sharding.spec[3] == "model"
        assert k.addressable_shards[0].data.shape[3] == k.shape[3] // 4

        m = tr.run_epoch(0, "train")
        assert np.isfinite(m["loss"])
        # same batches, same init: TP changes only the collective schedule
        assert abs(m["loss"] - baseline_metrics["loss"]) < 2e-3 * max(
            1.0, abs(baseline_metrics["loss"]))
        assert abs(m["acc"] - baseline_metrics["acc"]) < 1e-6

        # a second epoch reuses the pinned output layout (no placement drift)
        m2 = tr.run_epoch(0, "train")
        assert np.isfinite(m2["loss"])
        k2 = tr.state.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert k2.sharding.spec[3] == "model"

    def test_tp_checkpoint_roundtrip(self, tmp_path):
        """save_checkpoint gathers sharded leaves to host; restore feeds the
        TP step again (resume-under-TP contract, mirroring the DP dryrun)."""
        from scouter_tpu.core.checkpoint import restore_checkpoint, save_checkpoint

        mesh = make_mesh((2, 4), ("data", "model"))
        cfg = _cfg()
        tr = Trainer(cfg, mesh=mesh, datasets=_datasets())
        tr.run_epoch(0, "train")
        paths = save_checkpoint(str(tmp_path), cfg, tr.state, epoch=0)
        # shardings= re-places onto the TP layout, as Trainer.maybe_resume does
        restored, _, _ = restore_checkpoint(paths[0], tr.state,
                                            shardings=tr.state_shardings)
        a = jax.tree_util.tree_leaves(tr.state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))
        # the restored leaves carry the TP placement (donation-alias safe)
        k = restored.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert k.sharding.spec[3] == "model"
        tr.state = restored
        m = tr.run_epoch(0, "train")
        assert np.isfinite(m["loss"])

    def test_tp_flagship_matches_single_device(self):
        """resnest26d (grouped radix SplitAttn convs, channel=2048 — the
        config TP exists for) under a (data, model) mesh + ZeRO-1: physically
        partitioned, same trajectory as single-device. Reference hot path:
        timm/models/layers/split_attn.py:54-80."""
        flag = dict(model="resnest26d", channel=2048, to_k_layer=3,
                    slots_per_class=3, img_size=48)
        mesh1 = make_mesh((1,), devices=jax.devices()[:1])
        base = Trainer(_cfg(**flag), mesh=mesh1, datasets=_datasets()).run_epoch(
            0, "train")

        mesh = make_mesh((4, 2), ("data", "model"))
        tr = Trainer(_cfg(zero1=True, **flag), mesh=mesh, datasets=_datasets())
        k = tr.state.params["backbone"]["layer4_0"]["conv1"]["kernel"]
        assert k.sharding.spec[3] == "model"
        assert k.addressable_shards[0].data.shape[3] == k.shape[3] // 2
        m = tr.run_epoch(0, "train")
        assert np.isfinite(m["loss"])
        assert abs(m["loss"] - base["loss"]) < 2e-3 * max(1.0, abs(base["loss"]))
        assert abs(m["acc"] - base["acc"]) < 1e-6

    def test_tp_requires_sync_bn(self):
        mesh = make_mesh((2, 4), ("data", "model"))
        with pytest.raises(ValueError, match="sync_bn"):
            Trainer(_cfg(sync_bn=False), mesh=mesh, datasets=_datasets())

    def test_mesh_rejects_ambiguous_axis_padding(self):
        # 3-D shape with the default 1-name list would pad 'model' twice —
        # duplicate axis names collapse silently and fail later in XLA
        with pytest.raises(ValueError, match="axis names"):
            make_mesh((2, 2, 2))


class TestZero1:
    def test_opt_state_sharded_and_equivalent(self, baseline_metrics):
        mesh = make_mesh((8,), ("data",))
        tr = Trainer(_cfg(zero1=True), mesh=mesh, datasets=_datasets())

        # find the AdamW mu leaf for a conv kernel and check physical sharding
        mu_leaves = [
            x for x in jax.tree_util.tree_leaves(tr.state.opt_state)
            if hasattr(x, "sharding") and np.ndim(x) == 4
        ]
        assert mu_leaves, "no 4-D optimizer-state leaves found"
        sharded = [x for x in mu_leaves if "data" in jax.tree_util.tree_leaves(
            [s for s in x.sharding.spec if s is not None])]
        assert sharded, "zero1 did not shard any conv-kernel moment over 'data'"
        x = sharded[0]
        ax = list(x.sharding.spec).index("data")
        assert x.addressable_shards[0].data.shape[ax] == x.shape[ax] // 8

        m = tr.run_epoch(0, "train")
        assert np.isfinite(m["loss"])
        # ZeRO-1 is storage-only: the update math is unchanged
        assert abs(m["loss"] - baseline_metrics["loss"]) < 2e-3 * max(
            1.0, abs(baseline_metrics["loss"]))
        assert abs(m["acc"] - baseline_metrics["acc"]) < 1e-6

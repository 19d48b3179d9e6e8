"""North-star explanation parity: heatmap IoU + top-1 agreement between the
torch reference's test.py flow and this framework, from identical weights and
an identical (synthetic) training stream.

BASELINE.json north_star requires "top-1 accuracy and attention-map IoU
parity"; this is the executable form of that contract. The full harness (also
usable against real dataset directories) is examples/parity_report.py.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

from scouter_tpu.core import ScouterConfig
from scouter_tpu.explain.parity import heatmap_iou, iou_table, soft_iou


class TestIoUMetrics:
    def test_identical_maps(self):
        m = np.random.RandomState(0).randint(0, 256, (9, 9)).astype(np.uint8)
        assert heatmap_iou(m, m) == 1.0
        assert soft_iou(m, m) == 1.0

    def test_disjoint_maps(self):
        a = np.zeros((4, 4), np.uint8)
        b = np.zeros((4, 4), np.uint8)
        a[:2] = 255
        b[2:] = 255
        assert heatmap_iou(a, b, 128) == 0.0
        assert soft_iou(a, b) == 0.0

    def test_empty_maps_agree(self):
        z = np.zeros((4, 4), np.uint8)
        assert heatmap_iou(z, z) == 1.0
        assert soft_iou(z, z) == 1.0

    def test_half_overlap(self):
        a = np.zeros((4, 4), np.uint8)
        b = np.zeros((4, 4), np.uint8)
        a[:, :2] = 255  # cols 0-1
        b[:, 1:3] = 255  # cols 1-2
        assert heatmap_iou(a, b, 128) == pytest.approx(1 / 3)

    def test_iou_table_shape(self):
        maps = [np.random.RandomState(i).randint(0, 256, (9, 9)).astype(np.uint8)
                for i in range(3)]
        rep = iou_table(maps, maps)
        assert len(rep["per_class"]) == 3
        assert rep["mean"]["iou@128"] == 1.0
        assert rep["mean"]["soft_iou"] == 1.0


def test_end_to_end_heatmap_iou_parity():
    """Train both frameworks 4 steps from shared weights; the rendered
    per-class slot maps (test.py flow on both sides) must agree: mean
    IoU@128 >= 0.9, soft IoU >= 0.9, identical top-1 predictions."""
    from parity_report import run_parity

    cfg = ScouterConfig(
        model="resnet18", dataset="ImageNet", num_classes=3, channel=512,
        use_slot=True, slots_per_class=2, power=2, loss_status=1,
        to_k_layer=1, lambda_value=1.0, img_size=288, batch_size=2,
        pre_trained=False, freeze_layers=0,
    )
    result = run_parity(cfg, steps=4, probes=2, val_batches=2, seed=0, lr=1e-4)

    assert result["loss_trajectory"]["max_abs_delta"] < 5e-3
    assert result["top1"]["agreement"] == 1.0
    assert result["heatmap_iou"]["mean"]["iou@128"] >= 0.9
    assert result["heatmap_iou"]["mean"]["soft_iou"] >= 0.9


def test_end_to_end_heatmap_iou_parity_negative():
    """Same contract for the negative-explanation variant (loss_status=-1)."""
    from parity_report import run_parity

    cfg = ScouterConfig(
        model="resnet18", dataset="ImageNet", num_classes=3, channel=512,
        use_slot=True, slots_per_class=1, power=1, loss_status=-1,
        to_k_layer=1, lambda_value=1.0, img_size=288, batch_size=2,
        pre_trained=False, freeze_layers=0,
    )
    result = run_parity(cfg, steps=3, probes=2, val_batches=1, seed=1, lr=1e-4)
    assert result["top1"]["agreement"] == 1.0
    assert result["heatmap_iou"]["mean"]["iou@128"] >= 0.9


def test_jax_chaos_control_mode():
    """Within-framework Lyapunov control plumbing: two jax runs from inits
    differing by eps on one conv1 weight. At 2 steps the runs must still be
    (near-)identical — agreement 1.0 from an eps=1e-6 perturbation."""
    from parity_report import run_jax_chaos_control

    r = run_jax_chaos_control(epochs=1, n_train=16, n_val=16, batch_size=8,
                              img_size=260, platform="cpu")
    assert len(r["jax_a_val_acc"]) == 1 and len(r["jax_b_val_acc"]) == 1
    assert r["final"]["n"] == 16
    assert r["final"]["agreement"] == 1.0


def test_plateau_sweep_mode():
    """Identical-init per-seed pairs trained in both frameworks; the report
    must carry per-seed plateau stats for each framework."""
    from parity_report import run_plateau_sweep

    r = run_plateau_sweep(epochs=1, n_train=16, n_val=16, batch_size=8,
                          img_size=260, seeds=(0,), framework="both",
                          platform="cpu")
    assert len(r["rows"]) == 1
    row = r["rows"][0]
    assert len(row["jax_val_acc"]) == 1 and len(row["torch_val_acc"]) == 1
    for side in ("torch", "jax"):
        st = r[side]
        assert st is not None and len(st["plateau_per_seed"]) == 1
        assert 0.0 <= st["plateau_mean"] <= 1.0


def test_end_to_end_heatmap_iou_parity_resnest():
    """Same contract on the resnest26d family config (ConText/ImageNet-10
    recipes) — exercises SplitAttn/avd-pool numerics end-to-end, including the
    round-2 gap-reduction reorder. Shorter than the resnet18 variant (one
    training step) because resnest26d is ~4x the compile+step cost on CPU."""
    from parity_report import run_parity

    cfg = ScouterConfig(
        model="resnest26d", dataset="ImageNet", num_classes=3, channel=2048,
        use_slot=True, slots_per_class=3, power=2, loss_status=1,
        to_k_layer=3, lambda_value=1.0, img_size=288, batch_size=2,
        pre_trained=False, freeze_layers=0,
    )
    result = run_parity(cfg, steps=1, probes=1, val_batches=1, seed=0, lr=1e-4)
    assert result["loss_trajectory"]["max_abs_delta"] < 5e-3
    assert result["top1"]["agreement"] == 1.0
    assert result["heatmap_iou"]["mean"]["iou@128"] >= 0.9
    assert result["heatmap_iou"]["mean"]["soft_iou"] >= 0.9


def test_real_digits_data_path():
    """The real-data mode's ingest (sklearn UCI digits -> 28x28 canvas ->
    the shared MNIST preprocess): shapes, disjoint deterministic split,
    full 0-9 label coverage, and genuinely non-degenerate real images.
    The full training run is examples/parity_report.py --mode real-digits
    (docs/REAL_DIGITS_r5.md)."""
    from parity_report import _make_digits_arrays

    (x_tr, y_tr), (x_va, y_va) = _make_digits_arrays(
        img_size=64, n_train=48, n_val=32, seed=3)
    assert x_tr.shape == (48, 64, 64, 1) and x_va.shape == (32, 64, 64, 1)
    assert x_tr.dtype == np.float32
    assert y_tr.shape == (48,) and y_va.shape == (32,)
    assert set(np.concatenate([y_tr, y_va])) <= set(range(10))
    # real scans: every image distinct, nonzero variance
    flat = x_tr.reshape(len(x_tr), -1)
    assert len({f.tobytes() for f in flat}) == len(flat)
    assert float(flat.std(axis=1).min()) > 0.0
    # determinism + train/val disjointness under the same seed
    (x_tr2, y_tr2), _ = _make_digits_arrays(64, 48, 32, seed=3)
    np.testing.assert_array_equal(x_tr, x_tr2)
    np.testing.assert_array_equal(y_tr, y_tr2)
    va_set = {f.tobytes() for f in x_va.reshape(len(x_va), -1)}
    assert not va_set & {f.tobytes() for f in flat}

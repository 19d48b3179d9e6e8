"""Smoke tests for the training CLI: sweep driver + thop-style cost profiling."""

import numpy as np
import pytest


def test_model_cost_profiling():
    """--thop path (train.py:91-137 capability): params M + GFLOPs."""
    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.train.cli import model_cost

    cfg = ScouterConfig(model="resnet10", dataset="MNIST", num_classes=10,
                        use_slot=True, slots_per_class=1, power=1,
                        pre_trained=False, freeze_layers=0)
    params_m, gflops = model_cost(cfg)
    assert 1.0 < params_m < 20.0
    assert gflops > 0.1


def test_param_translation_sweep(monkeypatch, tmp_path):
    """param_translation (train.py:207-230): comma list triggers the grid and
    collects [train_acc, val_acc] per cell."""
    import argparse

    from scouter_tpu.core.config import get_args_parser
    from scouter_tpu.train import cli as cli_mod

    calls = []

    def fake_run_training(cfg, datasets=None):
        calls.append((cfg.lambda_value, cfg.slots_per_class))
        return [0.5, 0.6]

    monkeypatch.setattr(cli_mod, "run_training", fake_run_training)
    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    ns = parser.parse_args([
        "--lambda_value", "1,3", "--iterated_evaluation_num", "2",
        "--output_dir", str(tmp_path),
    ])
    record = cli_mod.param_translation(ns)
    assert set(record) == {"lambda_value-1", "lambda_value-3"}
    assert all(len(v) == 2 for v in record.values())  # 2 turns per cell
    assert calls.count((1.0, 3)) == 2 and calls.count((3.0, 3)) == 2


def test_single_config_calls_training(monkeypatch):
    import argparse

    from scouter_tpu.core.config import get_args_parser
    from scouter_tpu.train import cli as cli_mod

    monkeypatch.setattr(cli_mod, "run_training", lambda cfg, datasets=None: [0.9, 0.8])
    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    ns = parser.parse_args(["--num_classes", "10"])
    out = cli_mod.param_translation(ns)
    assert out == [0.9, 0.8]


def test_maybe_load_pretrained_local_checkpoint(tmp_path, monkeypatch):
    """pretrained=True capability (timm helpers.py:68-101): local torch
    state_dict grafted into the backbone; MNIST stem surgery keeps its own
    (fresh) 1-channel conv; classifier mismatch discarded."""
    import torch

    from test_models import _make_ref_model
    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.data import ArrayDataset, synthetic_mnist
    from scouter_tpu.train import Trainer

    torch.manual_seed(11)
    ref = _make_ref_model("resnet18", num_classes=1000)
    torch.save(ref.state_dict(), tmp_path / "resnet18.pth")
    monkeypatch.setenv("SCOUTER_TPU_PRETRAINED_DIR", str(tmp_path))

    (tr_x, tr_y), (te_x, te_y) = synthetic_mnist(num_train=8, num_test=8)
    datasets = (ArrayDataset(tr_x, tr_y, "MNIST"), ArrayDataset(te_x, te_y, "MNIST"))
    cfg = ScouterConfig(model="resnet18", dataset="MNIST", num_classes=10,
                        channel=512, img_size=64, batch_size=4, epochs=1,
                        use_slot=True, pre_trained=True, freeze_layers=0, seed=0)
    trainer = Trainer(cfg, datasets=datasets)
    stem_before = np.array(trainer.state.params["backbone"]["conv1"]["kernel"])
    trainer.maybe_load_pretrained()

    got = np.array(trainer.state.params["backbone"]["layer1_0"]["conv1"]["kernel"])
    want = ref.state_dict()["layer1.0.conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # MNIST surgery conv untouched by the graft
    np.testing.assert_array_equal(
        np.array(trainer.state.params["backbone"]["conv1"]["kernel"]), stem_before)
    # BN running stats came over too
    got_bn = np.array(trainer.state.batch_stats["backbone"]["layer1_0"]["bn1"]["mean"])
    np.testing.assert_allclose(got_bn, ref.state_dict()["layer1.0.bn1.running_mean"].numpy())

    # missing file -> silent random init (helpers.py:70-73)
    monkeypatch.setenv("SCOUTER_TPU_PRETRAINED_DIR", str(tmp_path / "nope"))
    trainer.maybe_load_pretrained()

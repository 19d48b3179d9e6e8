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

"""End-to-end test.py flow: train briefly, checkpoint, render explanations."""

import os

import numpy as np

from scouter_tpu.core import ScouterConfig
from scouter_tpu.core.checkpoint import save_checkpoint
from scouter_tpu.data import ArrayDataset, synthetic_mnist
from scouter_tpu.explain.cli import render_explanations
from scouter_tpu.train import Trainer


def test_render_explanations_end_to_end(tmp_path):
    cfg = ScouterConfig(
        model="resnet10", dataset="MNIST", num_classes=10, channel=512,
        use_slot=True, slots_per_class=2, power=2, loss_status=1, to_k_layer=1,
        lambda_value=1.0, img_size=64, batch_size=8, epochs=1, lr=1e-3,
        pre_trained=False, freeze_layers=0, output_dir=str(tmp_path),
        cal_area_size=True, seed=0,
    )
    (tr_x, tr_y), (te_x, te_y) = synthetic_mnist(num_train=32, num_test=16)
    trainer = Trainer(cfg, datasets=(ArrayDataset(tr_x, tr_y, "MNIST"),
                                     ArrayDataset(te_x, te_y, "MNIST")))
    trainer.run_epoch(0, "train")
    save_checkpoint(str(tmp_path), cfg, trainer.state, 0)

    vis_dir = str(tmp_path / "vis")
    ratio = render_explanations(cfg, trainer.state, trainer.model,
                                te_x[0], int(te_y[0]), vis_dir)
    # artifacts: image.png + slot_{id}.png + slot_mask_{id}.png per class
    assert os.path.exists(os.path.join(vis_dir, "image.png"))
    for i in range(cfg.num_classes):
        assert os.path.exists(os.path.join(vis_dir, f"slot_{i}.png"))
        assert os.path.exists(os.path.join(vis_dir, f"slot_mask_{i}.png"))
    assert ratio is not None and 0.0 <= ratio <= 1.0

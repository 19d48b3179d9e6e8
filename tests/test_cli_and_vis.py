"""CLI parity (flags, sweep expansion, checkpoint naming) and heatmap rendering."""

import os

import numpy as np
import pytest

from scouter_tpu.core import checkpoint_name, config_from_args, expand_sweep, get_args_parser
from scouter_tpu.explain import (
    apply_colormap_on_image,
    attention_area_ratio,
    attention_to_maps,
    save_slot_pngs,
)


def parse(argv):
    import argparse

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    return parser.parse_args(argv)


class TestCLI:
    def test_defaults_match_reference(self):
        ns = parse([])
        cfg = config_from_args(ns)
        assert cfg.model == "resnet18"
        assert cfg.dataset == "MNIST"
        assert cfg.lr == 1e-4
        assert cfg.batch_size == 64
        assert cfg.img_size == 260
        assert cfg.num_classes == 10
        assert cfg.slots_per_class == 3
        assert cfg.power == 2
        assert cfg.lambda_value == 1.0
        assert cfg.hidden_dim == 64
        assert cfg.use_slot is True
        assert cfg.pre_trained is True

    def test_str2bool_flags(self):
        ns = parse(["--use_slot", "false", "--vis", "true", "--aug", "1"])
        cfg = config_from_args(ns)
        assert cfg.use_slot is False
        assert cfg.vis is True
        assert cfg.aug is True

    def test_sweep_expansion(self):
        ns = parse(["--lambda_value", "1,3,10"])
        combos = list(expand_sweep(ns))
        assert [k for k, _ in combos] == ["lambda_value-1", "lambda_value-3", "lambda_value-10"]
        assert [c.lambda_value for _, c in combos] == [1.0, 3.0, 10.0]
        # non-swept flags are scalar-coerced
        assert all(isinstance(c.num_classes, int) for _, c in combos)

    def test_no_sweep_single_config(self):
        ns = parse(["--num_classes", "25", "--power", "2"])
        combos = list(expand_sweep(ns))
        assert len(combos) == 1 and combos[0][0] is None
        assert combos[0][1].num_classes == 25

    def test_checkpoint_name_matrix(self):
        ns = parse(["--dataset", "ConText", "--use_slot", "true", "--loss_status", "-1",
                    "--cal_area_size", "true", "--lambda_value", "1.5",
                    "--slots_per_class", "2"])
        cfg = config_from_args(ns)
        assert (
            checkpoint_name(cfg)
            == "ConText_use_slot_negative_for_area_size_1.5_2_checkpoint"
        )
        assert checkpoint_name(cfg, 9) == (
            "ConText_use_slot_negative_for_area_size_1.5_2_checkpoint0009"
        )


class TestVis:
    def test_attention_to_maps_shapes_and_scaling(self):
        rng = np.random.RandomState(0)
        attn = rng.rand(6, 81).astype(np.float32)  # 3 classes x 2 spc
        maps = attention_to_maps(attn, num_classes=3, slots_per_class=2)
        assert maps.shape == (3, 9, 9)
        assert maps.dtype == np.uint8
        assert maps.max() == 255 and maps.min() == 0

    def test_save_and_overlay(self, tmp_path):
        from PIL import Image

        attn = np.random.RandomState(1).rand(4, 81).astype(np.float32)
        maps = attention_to_maps(attn, 4, 1)
        paths = save_slot_pngs(maps, str(tmp_path))
        assert len(paths) == 4 and all(os.path.exists(p) for p in paths)

        base = Image.fromarray(np.zeros((36, 36, 3), np.uint8))
        slot_arr = np.array(Image.open(paths[0]).resize((36, 36), Image.BILINEAR), np.uint8)
        heat, overlaid = apply_colormap_on_image(base, slot_arr, "jet")
        assert overlaid.size == (36, 36)
        assert overlaid.mode == "RGBA"

    def test_area_ratio(self):
        full = np.full((9, 9), 255, np.uint8)
        assert attention_area_ratio(full) == pytest.approx(1.0)
        assert attention_area_ratio(np.zeros((9, 9), np.uint8)) == 0.0

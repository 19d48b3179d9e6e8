#!/usr/bin/env python
"""Run the reference's MNIST recipe chain end-to-end (README.md:84-120):

1. pre-train the no-slot baseline            (README.md:84-88)
2. positive SCOUTER with --use_pre           (README.md:91-97)
3. negative SCOUTER (loss_status=-1)         (README.md:99-105)
4. test.py-style per-class heatmap rendering

Uses the synthetic MNIST stand-in when real IDX files are absent (zero-egress
environment). Writes RESULTS.md with the metric table.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--num_train", type=int, default=2048)
    parser.add_argument("--img_size", type=int, default=260)
    parser.add_argument("--output_dir", default="saved_model")
    parser.add_argument("--results", default="RESULTS.md")
    parser.add_argument("--compute_dtype", default="float32",
                        choices=["float32", "bfloat16"])
    args = parser.parse_args()

    import jax

    from scouter_tpu.core import setup_compilation_cache

    setup_compilation_cache()

    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.data import ArrayDataset, synthetic_mnist
    from scouter_tpu.explain.cli import render_explanations
    from scouter_tpu.train import Trainer

    from scouter_tpu.data.mnist import load_mnist

    try:
        # detect the data source by what actually loads (load_mnist accepts
        # several layouts incl. IDX files directly under data/ — a path-based
        # data/MNIST check mislabeled those as synthetic)
        tr = load_mnist("data/", train=True)
        te = load_mnist("data/", train=False)
        source = "MNIST"
    except FileNotFoundError:
        # the synthetic generator honors num_train directly — slicing its
        # default 2048 images would silently cap larger --num_train requests
        tr, te = synthetic_mnist(args.num_train, args.num_train // 4)
        source = "synthetic"
    tr = (tr[0][: args.num_train], tr[1][: args.num_train])
    te = (te[0][: args.num_train // 4], te[1][: args.num_train // 4])
    n_train_actual = len(tr[0])
    datasets = (ArrayDataset(*tr, "MNIST"), ArrayDataset(*te, "MNIST"))

    base = dict(
        model="resnet18", dataset="MNIST", num_classes=10, channel=512,
        img_size=args.img_size, batch_size=64, epochs=args.epochs, lr=1e-4,
        output_dir=args.output_dir, seed=0, pre_trained=False, freeze_layers=0,
        compute_dtype=args.compute_dtype,
    )
    rows = []

    def run(name, cfg):
        t0 = time.time()
        trainer = Trainer(cfg, datasets=datasets)
        train_acc, val_acc = trainer.fit()
        rows.append((name, train_acc, val_acc, round(time.time() - t0, 1)))
        return trainer

    # 1. no-slot pre-train (the use_pre source checkpoint)
    run("no_slot pretrain", ScouterConfig(**base, use_slot=False))

    # 2. positive SCOUTER with use_pre backbone handoff
    pos = ScouterConfig(**base, use_slot=True, use_pre=True, loss_status=1,
                        slots_per_class=1, power=1, to_k_layer=1, lambda_value=1.0)
    trainer_pos = run("positive SCOUTER (use_pre)", pos)

    # 3. negative SCOUTER
    neg = ScouterConfig(**base, use_slot=True, loss_status=-1,
                        slots_per_class=2, power=2, to_k_layer=1, lambda_value=1.5)
    run("negative SCOUTER", neg)

    # 4. per-class heatmap render (test.py flow) from the positive model
    vis_dir = os.path.join(args.output_dir, "vis")
    te_x, te_y = te
    render_explanations(pos.replace(cal_area_size=True), trainer_pos.state,
                        trainer_pos.model, te_x[0], int(te_y[0]), vis_dir)

    with open(args.results, "w") as f:
        f.write("# MNIST recipe-chain results\n\n")
        f.write(f"Data source: {source} ({n_train_actual} train images, "
                f"{args.img_size}px, {args.epochs} epochs each)\n\n")
        f.write("| Recipe | train acc | val acc | wall (s) |\n|---|---|---|---|\n")
        for name, ta, va, dt in rows:
            f.write(f"| {name} | {ta:.3f} | {va:.3f} | {dt} |\n")
        f.write(f"\nHeatmaps rendered to `{vis_dir}/slot_mask_*.png`.\n")
    print(open(args.results).read())


if __name__ == "__main__":
    main()

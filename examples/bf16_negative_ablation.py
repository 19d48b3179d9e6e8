#!/usr/bin/env python
"""Root-cause the bf16 negative-recipe accuracy drop (round-2 weak item 2).

Round 2 measured negative SCOUTER (loss_status=-1, slots_per_class=2, power=2)
at 93.4 val acc in full bf16 vs 97.3 in fp32 on the 4-epoch synthetic chain.
Hypothesis: the drop lives in the slot head — negative-mode logits are
negated sums of attended-feature values, so class margins are small
differences of O(1) sums, and bf16 rounding there is material, while the
backbone convs are robust. This ablation trains the SAME negative recipe
(identical data/seed/schedule) under:

  fp32            — everything float32 (reference arithmetic)
  bf16+fp32head   — backbone bf16, slot head (conv1x1+PE+xSlot) fp32
  bf16full        — everything bf16 (round 2's configuration)

Writes docs/RESULTS_round3_bf16_negative.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--num_train", type=int, default=2048)
    parser.add_argument("--img_size", type=int, default=260)
    parser.add_argument("--results", default="docs/RESULTS_round3_bf16_negative.md")
    parser.add_argument("--seeds", type=int, default=1)
    parser.add_argument("--variants", default="fp32,bf16+fp32head,bf16full",
                        help="comma subset of variants to run")
    parser.add_argument("--append", action="store_true",
                        help="append rows to --results instead of overwriting")
    args = parser.parse_args()

    from scouter_tpu.core import ScouterConfig, setup_compilation_cache

    setup_compilation_cache()

    from scouter_tpu.data import ArrayDataset, synthetic_mnist

    rows = []
    for seed in range(args.seeds):
        tr, te = synthetic_mnist(args.num_train, args.num_train // 4)
        datasets = (ArrayDataset(*tr, "MNIST"), ArrayDataset(*te, "MNIST"))

        base = dict(
            model="resnet18", dataset="MNIST", num_classes=10, channel=512,
            img_size=args.img_size, batch_size=64, epochs=args.epochs, lr=1e-4,
            output_dir="/tmp/bf16_ablation", seed=seed, pre_trained=False,
            freeze_layers=0, use_slot=True, loss_status=-1, slots_per_class=2,
            power=2, to_k_layer=1, lambda_value=1.5,
        )
        variants = [
            ("fp32", dict(compute_dtype="float32")),
            ("bf16+fp32head", dict(compute_dtype="bfloat16",
                                   slot_head_dtype="float32")),
            ("bf16full", dict(compute_dtype="bfloat16",
                              slot_head_dtype="compute")),
        ]
        variants = [v for v in variants if v[0] in args.variants.split(",")]
        for name, extra in variants:
            from scouter_tpu.train import Trainer

            cfg = ScouterConfig(**{**base, **extra})
            t0 = time.time()
            trainer = Trainer(cfg, datasets=datasets)
            train_acc, val_acc = trainer.fit()
            rows.append((seed, name, train_acc, val_acc,
                         round(time.time() - t0, 1)))
            print("DONE", rows[-1], flush=True)

    os.makedirs(os.path.dirname(args.results) or ".", exist_ok=True)
    mode = "a" if args.append and os.path.exists(args.results) else "w"
    with open(args.results, mode) as f:
        if mode == "w":
            f.write("# bf16 negative-recipe ablation (round 3, SYNTHETIC data)\n\n")
            f.write(f"Negative SCOUTER recipe (loss_status=-1, spc=2, power=2, "
                    f"lambda=1.5), resnet18@{args.img_size}, {args.num_train} "
                    f"synthetic train images, identical data/seed per variant.\n\n")
            f.write("| seed | epochs | variant | train acc | val acc | wall (s) |\n")
            f.write("|---|---|---|---|---|---|\n")
        for seed, name, ta, va, dt in rows:
            f.write(f"| {seed} | {args.epochs} | {name} | {ta:.3f} | {va:.3f} | {dt} |\n")
    print(open(args.results).read())


if __name__ == "__main__":
    main()

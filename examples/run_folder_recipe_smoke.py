"""End-to-end smoke of the non-MNIST README recipes on TPU with synthetic
folder data.

Builds throwaway ConText / ImageNet-subset / CUB-200 directory trees (the
exact layouts the reference's list builders scan — flat prefix-labeled files,
train|val class folders, metadata txt files) and drives ONE epoch of each
recipe through the real Trainer with the recipe's published flags
(README.md:25-52,130-156,184-210): streaming folder loader, device
preprocessing, bf16 train step, checkpointing.

Synthetic images — this validates the execution path, not accuracy.

Usage: python examples/run_folder_recipe_smoke.py [--recipes context,imagenet,cub]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _png(path, rng, size=96):
    from PIL import Image

    Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)).save(path)


def make_context_tree(root, n_classes=30, per_class=20):
    rng = np.random.RandomState(0)
    for c in range(n_classes):
        for i in range(per_class):
            _png(os.path.join(root, f"class{c:02d}_{i:03d}.png"), rng)


def make_imagenet_tree(root, n_classes=10, per_class=21, per_val=7):
    rng = np.random.RandomState(1)
    for phase, count in (("train", per_class), ("val", per_val)):
        for c in range(n_classes):
            d = os.path.join(root, phase, f"n{c:08d}")
            os.makedirs(d, exist_ok=True)
            for i in range(count):
                _png(os.path.join(d, f"img_{i:03d}.png"), rng)


def make_cub_tree(root, n_classes=25, per_class=8):
    rng = np.random.RandomState(2)
    images, labels, splits = [], [], []
    image_id = 1
    for c in range(1, n_classes + 1):
        cls = f"{c:03d}.Synth_Bird_{c}"
        d = os.path.join(root, "images", cls)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            name = f"{cls}/bird_{i:03d}.jpg"
            _png(os.path.join(root, "images", name), rng)
            images.append((image_id, name))
            labels.append((image_id, c))
            splits.append((image_id, 1 if i < per_class * 3 // 4 else 0))
            image_id += 1
    with open(os.path.join(root, "images.txt"), "w") as f:
        f.writelines(f"{i} {n}\n" for i, n in images)
    with open(os.path.join(root, "image_class_labels.txt"), "w") as f:
        f.writelines(f"{i} {c}\n" for i, c in labels)
    with open(os.path.join(root, "train_test_split.txt"), "w") as f:
        f.writelines(f"{i} {s}\n" for i, s in splits)
    with open(os.path.join(root, "classes.txt"), "w") as f:
        f.writelines(f"{c} {c:03d}.Synth_Bird_{c}\n" for c in range(1, n_classes + 1))


# recipe flag sets straight from the reference README (see BASELINE.md)
RECIPES = {
    "context": dict(
        dataset="ConText", model="resnest26d", num_classes=30, batch_size=200,
        channel=2048, use_slot=True, slots_per_class=3, power=2, to_k_layer=3,
        lambda_value=1.0, loss_status=1, img_size=260,
    ),
    "imagenet": dict(
        dataset="ImageNet", model="resnest26d", num_classes=10, batch_size=70,
        channel=2048, use_slot=True, slots_per_class=3, power=2, to_k_layer=3,
        lambda_value=1.0, loss_status=1, img_size=260,
    ),
    "cub": dict(
        dataset="CUB200", model="resnest50d", num_classes=25, batch_size=64,
        channel=2048, use_slot=True, slots_per_class=5, power=2, to_k_layer=3,
        lambda_value=10.0, loss_status=1, img_size=260,
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipes", default="context,imagenet,cub")
    ap.add_argument("--compute_dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    from scouter_tpu.core import setup_compilation_cache

    setup_compilation_cache()

    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.train import Trainer

    failures = 0
    for name in args.recipes.split(","):
        spec = RECIPES[name]
        root = tempfile.mkdtemp(prefix=f"scouter_smoke_{name}_")
        try:
            if name == "context":
                make_context_tree(root)
            elif name == "imagenet":
                make_imagenet_tree(root)
            else:
                make_cub_tree(root)
            cfg = ScouterConfig(
                **spec, dataset_dir=root, epochs=1, lr=1e-4, seed=0,
                output_dir="", compute_dtype=args.compute_dtype,
            )
            t0 = time.perf_counter()
            trainer = Trainer(cfg)
            m_train = trainer.run_epoch(0, "train")
            m_val = trainer.run_epoch(0, "val")
            ok = bool(np.isfinite(m_train["loss"]) and np.isfinite(m_val["loss"]))
            print(json.dumps({
                "recipe": name, "status": "OK" if ok else "NONFINITE",
                "model": spec["model"], "batch_size": spec["batch_size"],
                "train_loss": round(float(m_train["loss"]), 4),
                "val_loss": round(float(m_val["loss"]), 4),
                "wall_s": round(time.perf_counter() - t0, 1),
            }), flush=True)
            failures += 0 if ok else 1
        except Exception as e:  # noqa: BLE001 - smoke harness
            print(json.dumps({"recipe": name, "status": "ERROR",
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            failures += 1
        finally:
            shutil.rmtree(root, ignore_errors=True)
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

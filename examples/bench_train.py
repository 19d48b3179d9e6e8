"""Training-throughput benchmark: resnest26d + xSlot, 224px, bs=70.

Measures the full jitted train step (forward + backward + AdamW + metrics,
donated state) on the default JAX device, fp32 vs bf16 compute
(``--compute_dtype``). Counterpart of the inference headline in bench.py;
numbers recorded in PARITY.md (Performance section).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch_size", type=int, default=70)
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()

    import jax

    from scouter_tpu.core import setup_compilation_cache

    setup_compilation_cache()
    import jax.numpy as jnp

    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.data import ArrayDataset
    from scouter_tpu.train import Trainer

    cfg = ScouterConfig(
        model="resnest26d", dataset="ImageNet", num_classes=10, channel=2048,
        use_slot=True, slots_per_class=3, power=2, loss_status=1, to_k_layer=3,
        lambda_value=1.0, img_size=224, batch_size=args.batch_size,
        compute_dtype=args.compute_dtype, output_dir="",
    )
    rng = np.random.RandomState(0)
    n = args.batch_size * 4
    imgs = rng.randint(0, 255, (n, 224, 224, 3), dtype=np.uint8)
    labels = rng.randint(0, 10, (n,), dtype=np.int64)
    ds = ArrayDataset(imgs, labels, "ImageNet")
    trainer = Trainer(cfg, datasets=(ds, ds))

    batch = {
        "image": jnp.asarray(rng.randn(args.batch_size, 224, 224, 3), jnp.float32),
        "label": jnp.asarray(labels[: args.batch_size]),
    }
    # compile + warmup. NOTE: warmup must use a real host fetch — on
    # remote-attached runtimes block_until_ready can return before device
    # completion (and before compilation finishes), which would leak compile
    # time into the timed region. A data fetch cannot return early.
    state, m = trainer.train_step(trainer.state, batch)
    np.asarray(m["loss"])
    for _ in range(3):
        state, m = trainer.train_step(state, batch)
    np.asarray(m["loss"])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = trainer.train_step(state, batch)
    np.asarray(m["loss"])  # host fetch bounds the final step
    dt = time.perf_counter() - t0

    img_s = args.batch_size * args.iters / dt
    print(json.dumps({
        "metric": f"train img/s/chip (resnest26d+xSlot, 224px, bs={args.batch_size}, "
                  f"{args.compute_dtype})",
        "value": round(img_s, 1),
        "unit": "img/s",
    }))


if __name__ == "__main__":
    main()

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
    ap.add_argument("--end-to-end", action="store_true", dest="end_to_end",
                    help="time Trainer.run_epoch with the real Loader path "
                         "(host gather + device preprocess/aug + lookahead), "
                         "not a device-resident batch")
    ap.add_argument("--aug", action="store_true",
                    help="with --end-to-end: enable the imgaug-parity "
                         "augmentation chain (train.py --aug)")
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
        compute_dtype=args.compute_dtype, output_dir="", aug=args.aug,
    )
    rng = np.random.RandomState(0)
    n = args.batch_size * (30 if args.end_to_end else 4)
    imgs = rng.randint(0, 255, (n, 224, 224, 3), dtype=np.uint8)
    labels = rng.randint(0, 10, (n,), dtype=np.int64)
    ds = ArrayDataset(imgs, labels, "ImageNet")
    trainer = Trainer(cfg, datasets=(ds, ds))

    if args.end_to_end:
        # whole-pipeline throughput: a real epoch through Loader.epoch()
        # (host-side native gather, per-image aug permutation, device
        # normalize/resize, one-batch lookahead) driving the jitted step.
        # Epoch 0 is the untimed compile/warmup pass; epochs 1-2 are timed.
        #
        # IMPORTANT environment caveat: in this harness the chip is
        # remote-attached over a tunnel whose H2D bandwidth is ~12 MB/s
        # (measured below) — three orders of magnitude under a real TPU
        # host's PCIe/DMA path. The end-to-end number is therefore tunnel-
        # bound here; the decomposition fields are what transfer to real
        # hardware: host assembly rate (can it feed the chip?) and the
        # device step rate.
        trainer.run_epoch(0, "train")
        steps = trainer.loader_train.steps_per_epoch()
        t0 = time.perf_counter()
        for ep in (1, 2):
            trainer.run_epoch(ep, "train")
        dt = time.perf_counter() - t0
        img_s = 2 * steps * args.batch_size / dt

        # decomposition: host-side batch assembly alone (native gather +
        # aug permutation draw; no device involvement)
        t0 = time.perf_counter()
        n_host = 0
        for _ in trainer.loader_train._host_batches(3):
            n_host += 1
        host_img_s = n_host * args.batch_size / (time.perf_counter() - t0)
        # raw H2D bandwidth of one uint8 batch (fetch-bounded)
        raw = imgs[: args.batch_size]
        np.asarray(jax.device_put(raw)[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(5):
            np.asarray(jax.device_put(raw)[0, 0, 0])
        h2d_mb_s = 5 * raw.nbytes / 1e6 / (time.perf_counter() - t0)
        print(json.dumps({
            "metric": f"end-to-end train img/s/chip (epoch incl. loader, "
                      f"resnest26d+xSlot, 224px, bs={args.batch_size}, "
                      f"{args.compute_dtype}, aug={args.aug})",
            "value": round(img_s, 1),
            "unit": "img/s",
            "host_assembly_img_s": round(host_img_s, 1),
            "h2d_tunnel_mb_s": round(h2d_mb_s, 1),
            "note": "e2e is H2D-tunnel-bound in this environment; "
                    "host assembly and device step rates are the "
                    "hardware-transferable numbers",
        }))
        return

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

"""Serving-engine throughput bench (TPU).

Feeds a single-image request stream through scouter_tpu.serve.InferenceEngine
and compares realized throughput against the naive sequential bs=1 loop the
reference's test.py flow implies (/root/reference/test.py:18-44 — one forward
per image). The engine's win is micro-batching: requests coalesce into the
largest compiled bucket the arrival pattern allows.

Note on the environment: the remote-tunnel round trip (~30 ms) dominates
per-dispatch latency here, so absolute img/s understates an on-host serving
deployment; the engine-vs-naive RATIO is the portable number.

Usage: python examples/bench_serve.py [--requests 256] [--model resnest26d]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--model", default="resnest26d")
    ap.add_argument("--num_classes", type=int, default=10)
    ap.add_argument("--channel", type=int, default=2048)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--buckets", default="1,4,16,32")
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.core.cache import setup_compilation_cache
    from scouter_tpu.models import build_slot_model
    from scouter_tpu.serve import InferenceEngine, make_serving_fn

    setup_compilation_cache()
    dtype = jnp.bfloat16 if ns.compute_dtype == "bfloat16" else jnp.float32
    cfg = ScouterConfig(
        model=ns.model, dataset="ImageNet", num_classes=ns.num_classes,
        channel=ns.channel, use_slot=True, slots_per_class=3, power=2,
        loss_status=1, to_k_layer=3, lambda_value=1.0, img_size=ns.img_size,
        batch_size=1, pre_trained=False, freeze_layers=0,
    )
    model = build_slot_model(cfg, dtype=dtype)
    sample = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample)

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (ns.requests, cfg.img_size, cfg.img_size, 3),
                         dtype=np.uint8)

    # naive sequential bs=1 baseline (the test.py-flow deployment)
    fn1 = jax.jit(make_serving_fn(cfg, variables, compute_dtype=dtype))
    _ = np.asarray(fn1(jnp.asarray(images[:1]))["logits"])  # compile + warm
    n_base = min(64, ns.requests)
    t0 = time.perf_counter()
    for i in range(n_base):
        np.asarray(fn1(jnp.asarray(images[i:i + 1]))["logits"])
    naive_s_per_img = (time.perf_counter() - t0) / n_base
    naive_ips = 1.0 / naive_s_per_img

    buckets = tuple(int(b) for b in ns.buckets.split(","))
    with InferenceEngine(cfg, variables, buckets=buckets,
                         max_wait_ms=ns.max_wait_ms,
                         compute_dtype=dtype) as eng:
        # compile every bucket up front so the timed run measures dispatch
        for b in buckets:
            eng.infer_batch(images[:b])
        pre = eng.stats()  # warm-up batches must not pollute the report
        t0 = time.perf_counter()
        futs = [eng.submit(img) for img in images]
        for f in futs:
            f.result(timeout=600)
        wall = time.perf_counter() - t0
        post = eng.stats()
        stats = {k: post[k] - pre[k] for k in post
                 if not isinstance(post[k], dict)}

    engine_ips = ns.requests / wall
    print(json.dumps({
        "metric": f"serving engine throughput ({ns.model}+xSlot, "
                  f"{ns.img_size}px, {ns.compute_dtype})",
        "requests": ns.requests, "buckets": list(buckets),
        "value": round(engine_ips, 1), "unit": "img/s",
        "naive_bs1_img_s": round(naive_ips, 1),
        "speedup_vs_naive": round(engine_ips / naive_ips, 2),
        "batches": stats["batches"], "padded": stats["padded"],
        "mean_batch": round(stats["requests"] / max(stats["batches"], 1), 1),
    }), flush=True)


if __name__ == "__main__":
    main()

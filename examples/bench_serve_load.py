"""Concurrent-client load test for the HTTP serving stack.

The engine bench (bench_serve.py) measures the micro-batcher in isolation;
this harness measures the DEPLOYMENT surface: ThreadingHTTPServer + engine,
N client threads firing mixed single-image POSTs over localhost, a fraction
with ``?maps=1`` (per-class slot-map PNGs rendered in the handler thread).

Reported per variant (maps / no-maps): p50/p90/p99 request latency and the
realized img/s, plus the engine's bucket-fill histogram ("b/n" = a device
batch that ran bucket b carrying n live images) — the number that says
whether the arrival pattern actually coalesces.

This subsystem has no reference counterpart (the reference's deployment story
is test.py's one-forward-per-image loop, /root/reference/test.py:18-44) — it
is the TPU-first value-add, so it gets production-grade evidence.

Usage: python examples/bench_serve_load.py [--clients 16] [--requests 16]
       [--out_path docs/SERVE_LOAD_r4.md]
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _percentiles(vals):
    if not vals:
        return {}
    v = np.asarray(vals, np.float64)
    return {p: float(np.percentile(v, p)) for p in (50, 90, 99)}


def _post(url, body, timeout=120.0):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=16,
                    help="requests per client (sequential within a client)")
    ap.add_argument("--maps_frac", type=float, default=0.25,
                    help="fraction of requests asking for ?maps=1")
    ap.add_argument("--payload", default="npy", choices=["npy", "png"],
                    help="npy = raw uint8 array (measures server+engine); "
                         "png = PIL decode in the handler too")
    ap.add_argument("--model", default="resnest26d")
    ap.add_argument("--num_classes", type=int, default=10)
    ap.add_argument("--channel", type=int, default=2048)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--buckets", default="1,4,16,32")
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--out_path", default=None)
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.core.cache import setup_compilation_cache
    from scouter_tpu.models import build_slot_model
    from scouter_tpu.serve import InferenceEngine
    from scouter_tpu.serve.server import make_server

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
    img = rng.randint(0, 256, (cfg.img_size, cfg.img_size, 3), np.uint8)
    if ns.payload == "npy":
        buf = io.BytesIO()
        np.save(buf, img)
        body = buf.getvalue()
    else:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "PNG")
        body = buf.getvalue()

    buckets = tuple(int(b) for b in ns.buckets.split(","))
    with InferenceEngine(cfg, variables, buckets=buckets,
                         max_wait_ms=ns.max_wait_ms, compute_dtype=dtype) as eng:
        for b in buckets:  # compile every bucket before traffic
            eng.infer_batch(np.zeros((b,) + img.shape, np.uint8))
        pre = eng.stats()
        server = make_server(eng, cfg.img_size, 3, ("127.0.0.1", 0))
        host, port = server.server_address[:2]
        srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
        srv_thread.start()
        base = f"http://{host}:{port}/predict"

        lat = {"plain": [], "maps": []}
        errors = []
        lock = threading.Lock()

        def client(idx):
            crng = np.random.RandomState(idx)
            for i in range(ns.requests):
                want_maps = crng.rand() < ns.maps_frac
                url = base + ("?maps=1" if want_maps else "")
                t0 = time.perf_counter()
                try:
                    out = _post(url, body)
                    dt = time.perf_counter() - t0
                    assert "pred" in out, out
                    if want_maps:
                        assert len(out["slot_maps_png"]) == cfg.num_classes
                    with lock:
                        lat["maps" if want_maps else "plain"].append(dt)
                except Exception as exc:  # noqa: BLE001 — recorded, reported
                    with lock:
                        errors.append(f"{type(exc).__name__}: {exc}")

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(ns.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        post_stats = eng.stats()
        stage_samples = eng.stage_samples()
        http_samples = server.http_samples()
        server.shutdown()

    # throughput numerator = SUCCESSFUL requests only (errored requests
    # return near-instantly and would inflate req/s while the latency tables
    # exclude them)
    total = sum(len(v) for v in lat.values())
    fill = {k: post_stats["bucket_fill"].get(k, 0) - pre["bucket_fill"].get(k, 0)
            for k in post_stats["bucket_fill"]}
    fill = {k: v for k, v in sorted(fill.items(),
                                    key=lambda kv: [int(x) for x in kv[0].split("/")])
            if v}
    def stage_table(samples, keys):
        """mean/p50/p90/p99 (ms) per stage over per-request samples."""
        out = {}
        for k in keys:
            vals = [s[k] * 1e3 for s in samples if k in s]
            if not vals:
                continue
            out[k] = {"mean": round(float(np.mean(vals)), 2),
                      **{f"p{p}": round(v, 2)
                         for p, v in _percentiles(vals).items()}}
        return out

    engine_budget = stage_table(
        stage_samples, ("queue_wait", "dispatch", "inflight_wait", "fetch"))
    http_budget = {
        "all": stage_table(http_samples,
                           ("read", "decode", "engine_wait", "encode", "write")),
        "maps_only_encode": stage_table(
            [s for s in http_samples if s.get("maps")], ("encode",)),
    }

    result = {
        "metric": f"HTTP serving load ({ns.model}+xSlot, {ns.img_size}px, "
                  f"{ns.compute_dtype}, {ns.clients} clients x {ns.requests} "
                  f"reqs, {ns.payload} payload, maps_frac={ns.maps_frac})",
        "value": round(total / wall, 1), "unit": "req/s",
        "wall_s": round(wall, 2),
        "errors": len(errors),
        "latency_ms": {
            variant: {f"p{p}": round(v * 1e3, 1)
                      for p, v in _percentiles(vals).items()}
            for variant, vals in lat.items() if vals
        },
        "n": {k: len(v) for k, v in lat.items()},
        "engine": {
            "requests": post_stats["requests"] - pre["requests"],
            "batches": post_stats["batches"] - pre["batches"],
            "padded": post_stats["padded"] - pre["padded"],
            "bucket_fill": fill,
        },
        "stage_budget_ms": {"engine": engine_budget, "http": http_budget},
    }
    if errors:
        result["first_errors"] = errors[:5]
    print(json.dumps(result), flush=True)

    if ns.out_path:
        lines = ["# HTTP serving load test", "", result["metric"], "",
                 f"- realized **{result['value']} req/s** over {wall:.1f}s "
                 f"wall, {len(errors)} errors / {total} requests",
                 ""]
        lines += ["| variant | n | p50 (ms) | p90 (ms) | p99 (ms) |",
                  "|---|---|---|---|---|"]
        for variant, ps in result["latency_ms"].items():
            lines.append(f"| {variant} | {result['n'][variant]} | "
                         f"{ps['p50']} | {ps['p90']} | {ps['p99']} |")
        lines += ["", "bucket fill (bucket/live -> device batches): " +
                  (", ".join(f"{k}: {v}" for k, v in fill.items()) or "none"),
                  "", f"engine: {result['engine']['requests']} requests in "
                  f"{result['engine']['batches']} device batches "
                  f"({result['engine']['padded']} padded slots)", ""]
        lines += ["## Per-request stage budget (ms)", "",
                  "| stage | mean | p50 | p90 | p99 |", "|---|---|---|---|---|"]
        for name, tab in (("engine", engine_budget),
                          ("http", http_budget["all"])):
            for k, v in tab.items():
                lines.append(f"| {name}.{k} | {v['mean']} | {v['p50']} | "
                             f"{v['p90']} | {v['p99']} |")
        enc_maps = http_budget["maps_only_encode"].get("encode")
        if enc_maps:
            lines.append(f"| http.encode (maps=1 only) | {enc_maps['mean']} | "
                         f"{enc_maps['p50']} | {enc_maps['p90']} | "
                         f"{enc_maps['p99']} |")
        lines.append("")
        with open(ns.out_path, "w") as fh:
            fh.write("\n".join(lines))
        with open(os.path.splitext(ns.out_path)[0] + ".json", "w") as fh:
            json.dump(result, fh, indent=2)
        print(f"wrote {ns.out_path}")


if __name__ == "__main__":
    main()

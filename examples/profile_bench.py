"""Capture a jax.profiler device trace of the bench config and print the
top HLO cost centers.

Usage: python examples/profile_bench.py [--train] [--outdir /tmp/jaxtrace]

Parses the resulting .xplane.pb with xprof's RawToToolDataFromLogDir
(tensorboard_plugin_profile) and prints per-op self-time, sorted — the
profile-driven-optimization loop for VERDICT round-2 item 3.
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capture(outdir: str, train: bool, iters: int = 12):
    import jax
    import jax.numpy as jnp

    from scouter_tpu.core import setup_compilation_cache

    setup_compilation_cache()

    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.data import ArrayDataset
    from scouter_tpu.models import build_slot_model

    cfg = ScouterConfig(
        model="resnest26d", dataset="ImageNet", num_classes=10, channel=2048,
        use_slot=True, slots_per_class=3, power=2, loss_status=1, to_k_layer=3,
        lambda_value=1.0, img_size=224, batch_size=70,
        compute_dtype="bfloat16", output_dir="",
    )
    rng = np.random.RandomState(0)
    if train:
        from scouter_tpu.train import Trainer

        labels = rng.randint(0, 10, (140,), dtype=np.int64)
        imgs = rng.randint(0, 255, (140, 224, 224, 3), dtype=np.uint8)
        trainer = Trainer(cfg, datasets=(ArrayDataset(imgs, labels, "ImageNet"),) * 2)
        batch = {
            "image": jnp.asarray(rng.randn(70, 224, 224, 3), jnp.float32),
            "label": jnp.asarray(labels[:70]),
        }
        state, m = trainer.train_step(trainer.state, batch)
        np.asarray(m["loss"])  # bound compile

        def run_once():
            nonlocal state
            state, mm = trainer.train_step(state, batch)
            return mm["loss"]
    else:
        model = build_slot_model(cfg, dtype=jnp.bfloat16)
        x = jnp.zeros((70, 224, 224, 3), jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros_like(x, jnp.float32))
        fwd = jax.jit(lambda v, im: model.apply(v, im)["logits"])
        np.asarray(fwd(variables, x))

        def run_once():
            return fwd(variables, x)

    for _ in range(3):
        out = run_once()
    np.asarray(out)

    with jax.profiler.trace(outdir):
        for _ in range(iters):
            out = run_once()
        np.asarray(out)


def summarize(outdir: str, top: int = 30):
    """Find the xplane file and print per-HLO-op self time."""
    from xprof.convert import raw_to_tool_data as rttd

    xspaces = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    if not xspaces:
        print("no xplane.pb captured under", outdir)
        return
    params = {"tqx": "out:csv;"}
    data, _ = rttd.xspace_to_tool_data(xspaces, "hlo_op_profile", params)
    print(data if isinstance(data, str) else data.decode())


def summarize_trace_events(outdir: str, top: int = 40):
    """Fallback: aggregate device-side trace events by name."""
    from xprof.convert import raw_to_tool_data as rttd

    xspaces = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    data, _ = rttd.xspace_to_tool_data(xspaces, "trace_viewer", {})
    events = json.loads(data)["traceEvents"]
    agg = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e["dur"]
    total = sum(agg.values())
    print(f"total device event time: {total/1e3:.2f} ms (all threads)")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--outdir", default="/tmp/jaxtrace")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        # a fresh capture into a dirty outdir leaves TWO xspaces and the
        # trace-viewer parser refuses ("expects only 1 XSpace path")
        import shutil

        shutil.rmtree(args.outdir, ignore_errors=True)
        os.makedirs(args.outdir, exist_ok=True)
        capture(args.outdir, args.train, args.iters)
    try:
        summarize_trace_events(args.outdir)
    except Exception as e:
        print("trace_viewer parse failed:", e)
        summarize(args.outdir)

"""XAI-suite throughput on TPU: the reference's expensive attribution loops
(torchcam_vis.py hot paths, SURVEY §3.4) measured end-to-end on-chip.

Reference costs per class (for context): RISE = 8000 masked forwards
(``torchray/attribution/rise.py:110``), extremal perturbation = 800 SGD
iterations (``extremal_perturbation.py:456``), IGOS = 15 outer x 20 line-search
forward/backward pairs (``torchcam/IGOS.py:234``). Here each is ONE compiled
XLA program (scan over chunks/iterations) instead of a Python loop of
dispatches.

Usage:
  python examples/bench_explain.py                # full configs on TPU
  python examples/bench_explain.py --torch-cpu    # small-config same-core
                                                  # torch-vs-jax ratio (slow)
Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def emit(name, seconds, detail):
    print(json.dumps({"metric": f"xai/{name}", "value": round(seconds, 3),
                      "unit": "s", **detail}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-cpu", action="store_true",
                    help="small-config torch-reference-vs-jax CPU comparison")
    ap.add_argument("--img_size", type=int, default=260)
    args = ap.parse_args()

    if args.torch_cpu:
        return torch_cpu_comparison(args)

    import jax
    import jax.numpy as jnp

    from scouter_tpu.core import setup_compilation_cache

    setup_compilation_cache()

    from scouter_tpu.explain.extremal import extremal_perturbation
    from scouter_tpu.explain.rise import rise
    from scouter_tpu.models import create_model

    size = args.img_size
    model = create_model("resnest26d", num_classes=10)
    x = jnp.asarray(np.random.RandomState(0).randn(1, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def forward(images):
        return model.apply(variables, images)

    # --- RISE: full reference config (8000 masks), ALL classes in one pass ---
    key = jax.random.PRNGKey(1)
    sal = rise(forward, x, key)  # compile
    np.asarray(sal)
    t0 = time.perf_counter()
    sal = rise(forward, x, key)
    np.asarray(sal)
    dt = time.perf_counter() - t0
    emit("rise", dt, {"masks": 8000, "classes": 10, "img": size,
                      "note": "reference cost: 8000 sequential masked forwards PER CLASS"})

    # --- extremal perturbation: full 800-iter config, one class/area ---
    masks, hist = extremal_perturbation(forward, x, 0, areas=(0.1,))
    np.asarray(masks)
    t0 = time.perf_counter()
    masks, hist = extremal_perturbation(forward, x, 0, areas=(0.1,))
    np.asarray(masks)
    dt = time.perf_counter() - t0
    emit("extremal_perturbation", dt, {"iters": 800, "areas": 1, "img": size})

    # --- CAM-family single-shot (forward + one backward) ---
    from scouter_tpu.explain.cam import gradcam

    g = jax.jit(lambda v, im: gradcam(model, v, im, 0))
    np.asarray(g(variables, x))
    t0 = time.perf_counter()
    np.asarray(g(variables, x))
    emit("grad_cam", time.perf_counter() - t0, {"img": size})


def torch_cpu_comparison(args):
    """Same-core torch-reference vs this framework, reduced configs."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_models import install_reference_stubs

    install_reference_stubs()
    sys.path.insert(0, "/root/reference")

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from scouter_tpu.explain.rise import rise
    from scouter_tpu.models import create_model
    from timm.models import create_model as ref_create
    from torchray.attribution.rise import rise as ref_rise

    size, n_masks = 128, 400
    ref = ref_create("resnet18", pretrained=False, num_classes=10)
    ref.eval()
    xt = torch.randn(1, 3, size, size)
    t0 = time.perf_counter()
    with torch.no_grad():
        ref_rise(ref, xt, num_masks=n_masks, batch_size=32)
    dt_ref = time.perf_counter() - t0
    emit("rise_torch_cpu", dt_ref, {"masks": n_masks, "img": size, "model": "resnet18"})

    from scouter_tpu.models.convert import torch_state_dict_to_variables

    model = create_model("resnet18", num_classes=10)
    variables = torch_state_dict_to_variables(ref.state_dict())
    xj = jnp.asarray(xt.numpy().transpose(0, 2, 3, 1))

    def forward(images):
        return model.apply(variables, images)

    key = jax.random.PRNGKey(1)
    np.asarray(rise(forward, xj, key, num_masks=n_masks))  # compile
    t0 = time.perf_counter()
    np.asarray(rise(forward, xj, key, num_masks=n_masks))
    dt_jax = time.perf_counter() - t0
    emit("rise_jax_cpu", dt_jax, {"masks": n_masks, "img": size, "model": "resnet18",
                                  "speedup_vs_torch": round(dt_ref / dt_jax, 2)})


if __name__ == "__main__":
    main()

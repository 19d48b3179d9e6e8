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
    ap.add_argument("--compute_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="bfloat16 speeds the masked-rescoring family ~1.5x "
                         "(ScoreCAM 0.59->0.40 s, SSCAM 19.3->12.9 s) with "
                         "saliency correlation 1.0000 vs fp32")
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
    kw = {"dtype": jnp.bfloat16} if args.compute_dtype == "bfloat16" else {}
    model = create_model("resnest26d", num_classes=10, **kw)
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
    from scouter_tpu.explain.cam import (
        backbone_split, gradcam, gradcampp, isscam, scorecam, smooth_gradcampp,
        sscam,
    )

    g = jax.jit(lambda v, im: gradcam(model, v, im, 0))
    np.asarray(g(variables, x))
    t0 = time.perf_counter()
    np.asarray(g(variables, x))
    emit("grad_cam", time.perf_counter() - t0, {"img": size})

    def timed(name, fn, detail, reps=1):
        np.asarray(fn())  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(fn())
        emit(name, (time.perf_counter() - t0) / reps, detail)

    # each method compiled to ONE device program (jit) so the timing is device
    # time, not per-op dispatch over the tunnel
    key = jax.random.PRNGKey(2)
    j_gcpp = jax.jit(lambda v, im: gradcampp(model, v, im, 0))
    timed("grad_cam_pp", lambda: j_gcpp(variables, x), {"img": size})
    j_sgcpp = jax.jit(lambda v, im, k: smooth_gradcampp(model, v, im, 0, key=k))
    timed("smooth_grad_cam_pp", lambda: j_sgcpp(variables, x, key),
          {"img": size, "samples": 4})
    # masked-rescoring family: one masked forward per surviving channel
    # (reference: sequential per-channel forwards, cam.py:225-256)
    j_score = jax.jit(lambda v, im: scorecam(model, v, im, 0))
    timed("score_cam", lambda: j_score(variables, x),
          {"img": size, "note": "one masked forward per channel, batched"})
    j_ss = jax.jit(lambda v, im, k: sscam(model, v, im, 0, key=k))
    timed("ss_cam", lambda: j_ss(variables, x, key), {"img": size, "samples": 35})
    j_is = jax.jit(lambda v, im: isscam(model, v, im, 0))
    timed("is_cam", lambda: j_is(variables, x), {"img": size, "steps": 10})

    # --- backprop family (torchray/attribution/*) ---
    from scouter_tpu.explain.backprop import (
        deconvnet, gradient_saliency, guided_backprop,
    )
    from scouter_tpu.explain.excitation import (
        contrastive_excitation_backprop, excitation_backprop,
    )

    for name, fn in (
        ("gradient", gradient_saliency),
        ("deconvnet", deconvnet),
        ("guided_backprop", guided_backprop),
        ("excitation_backprop", excitation_backprop),
        ("contrastive_eb", contrastive_excitation_backprop),
    ):
        jfn = jax.jit(lambda v, im, f=fn: f(model, v, im, 0))
        timed(name, lambda j=jfn: j(variables, x), {"img": size})

    # --- IGOS: full reference config (15 outer x 20 integration steps) ---
    from scouter_tpu.explain.igos import gaussian_blur_baseline, integrated_mask

    blurred = gaussian_blur_baseline(x)
    res = integrated_mask(forward, x, blurred, 0, jax.random.PRNGKey(3))
    np.asarray(res.mask)
    t0 = time.perf_counter()
    res = integrated_mask(forward, x, blurred, 0, jax.random.PRNGKey(3))
    np.asarray(res.mask)
    emit("igos", time.perf_counter() - t0,
         {"outer_iters": 15, "integ_iter": 20, "img": size,
          "note": "reference cost: 15x20 fwd/bwd per class (IGOS.py:234)"})

    # --- IBA: the reference's heaviest path — estimate over 5,000 images
    # (torchcam_vis.py:194-204) + per-class analyze (:206-228) ---
    from scouter_tpu.explain.iba import estimate_stats, iba_analyze

    features, head, _fwd = backbone_split(model, variables)
    feat_j = jax.jit(features)
    rng = np.random.RandomState(7)
    est_bs, n_est = 50, 5000
    # one pre-generated device batch reused per step: the measurement is the
    # 5,000 bottleneck forwards + Welford update, not host RNG throughput
    est_batch = jnp.asarray(rng.randn(est_bs, size, size, 3).astype(np.float32))
    np.asarray(feat_j(est_batch))  # compile
    t0 = time.perf_counter()
    stats = estimate_stats(
        lambda b: feat_j(b), (est_batch for _ in range(n_est // est_bs)),
    )
    emit("iba_estimate", time.perf_counter() - t0,
         {"samples": n_est, "batch": est_bs, "img": size,
          "note": "Welford mean/std over the bottleneck features"})

    def readout_loss(z):
        logp = jax.nn.log_softmax(head(z), axis=1)
        return -logp[:, 0].mean()

    sal = iba_analyze(features, readout_loss, x, stats, jax.random.PRNGKey(4))
    np.asarray(sal)
    t0 = time.perf_counter()
    for c in range(10):
        def rl(z, c=c):
            logp = jax.nn.log_softmax(head(z), axis=1)
            return -logp[:, c].mean()

        np.asarray(iba_analyze(features, rl, x, stats, jax.random.PRNGKey(4)))
    emit("iba_analyze_all_classes", time.perf_counter() - t0,
         {"classes": 10, "opt_steps": 10, "noise_batch": 10, "img": size})


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

    # --- decomposition: pure masked-forward floor, no RISE harness ---
    # Times the same 400 forwards both harnesses must perform (chunked at the
    # reference's batch_size=32). If the floor ratio matches the rise ratio,
    # the gap is framework conv throughput on CPU (torch MKL-DNN vs XLA:CPU);
    # if the floors are at parity, the gap is our scan harness.
    chunk = 32
    n_chunks = -(-n_masks // chunk)
    xt_b = torch.randn(chunk, 3, size, size)
    with torch.no_grad():
        ref(xt_b)
    t0 = time.perf_counter()
    with torch.no_grad():
        for _ in range(n_chunks):
            ref(xt_b)
    dt_ref_fwd = time.perf_counter() - t0
    emit("masked_forward_floor_torch_cpu", dt_ref_fwd,
         {"forwards": n_chunks * chunk, "img": size})

    fwd = jax.jit(forward)
    xj_b = jnp.asarray(xt_b.numpy().transpose(0, 2, 3, 1))
    np.asarray(fwd(xj_b))
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        np.asarray(fwd(xj_b))
    dt_jax_fwd = time.perf_counter() - t0
    emit("masked_forward_floor_jax_cpu", dt_jax_fwd,
         {"forwards": n_chunks * chunk, "img": size,
          "speedup_vs_torch": round(dt_ref_fwd / dt_jax_fwd, 2),
          "rise_harness_overhead_s": round(dt_jax - dt_jax_fwd, 3),
          "torch_harness_overhead_s": round(dt_ref - dt_ref_fwd, 3)})


if __name__ == "__main__":
    main()

"""Throughput benchmark: resnest26d + xSlot inference, 224px, the BASELINE.json
headline metric (images/sec/chip).

Runs on the default JAX device (the real TPU chip under the driver). bfloat16
compute path, fp32 params. Prints ONE JSON line.

PRIMARY claim (measured, this chip): absolute throughput in img/s plus the
achieved TFLOP/s and model-FLOPs utilization it implies — the JSON carries
``achieved_tflops`` (XLA cost-analysis FLOPs x throughput) and ``mfu`` against
the v5e bf16 dense peak (~197 TFLOP/s). PARITY.md's r3 roofline shows this sits
within ~10% of the model-specific achievable bound (the radix grouped convs run
~53% peak inside their window; the low-channel stem ~20%).

SECONDARY (estimate, labeled as such in ``vs_baseline_basis``): ratio against
an estimated A100 torch reference throughput for the same model/config. The
reference repo publishes no numbers (BASELINE.md), and no ResNeSt-26 GPU
inference measurement exists in the retrieved public sources (PAPERS.md was
mined round 4 — the ResNeSt paper reports latency only for the 50/101 -d
variants under a different serving stack), so the constant below remains an
estimate of PyTorch 1.6 resnest26d+slot inference on A100 (fp16, bs=70):
~2500 img/s. The north-star target is 3x that.

Anchoring the estimate (round 2):
- Model cost: 7.36 GFLOP/img (XLA cost analysis, 224px).
- Same-hardware framework ratio: on the identical single CPU core, this
  framework runs resnest26d at 11.45 img/s vs the vendored torch reference's
  11.14 (1.03x) — the frameworks are compute-equivalent per FLOP, so the A100
  number is a hardware-utilization question only.
- A100 fp16 dense peak is 312 TFLOP/s; eager torch CNN inference typically
  achieves 5-10% MFU on it => 2.1k-4.2k img/s. 2500 (5.9% MFU) sits inside
  that bracket; the honest vs_baseline range for a ~10.4k img/s headline is
  therefore 2.5x-5.0x with ~4.2x as the point estimate. The bracket cannot be
  narrowed without A100 access or a published same-model number — which is
  why the measured absolute above is the primary claim.
"""

import json
import sys
import time

import numpy as np

A100_TORCH_BASELINE_IMG_S = 2500.0  # ESTIMATE — see module docstring
TPU_V5E_BF16_PEAK_TFLOPS = 197.0


def slot_kernel_check():
    """On-device compiled-mode parity of the fused Pallas slot kernel vs the
    jnp path (``python bench.py --slot-kernel``). The CPU suite only exercises
    interpret mode; this closes the compiled-on-TPU gap. Uses realistic
    magnitudes (trained-net scale) where the renorm (slot_attention.py:56) is
    numerically stable; prints one JSON line with the max deviations."""
    import functools

    import jax
    import jax.numpy as jnp

    from scouter_tpu.ops.slot_pallas import (
        xslot_iterations_fused,
        xslot_iterations_ref,
    )

    results = {}
    for s, b in ((30, 70), (1000, 16)):
        n, d = 81, 64
        rng = np.random.RandomState(0)
        args = tuple(
            jnp.asarray(a, jnp.float32)
            for a in (
                rng.randn(b, n, d) * 0.1, rng.randn(b, n, d) * 0.1,
                rng.randn(s, d) * 0.02, rng.randn(3 * d, d) * 0.05,
                rng.randn(3 * d, d) * 0.05, rng.randn(1, 3 * d) * 0.05,
                rng.randn(1, 3 * d) * 0.05,
            )
        )
        uf, af = jax.jit(lambda *a: xslot_iterations_fused(*a, 3, False))(*args)
        ur, ar = jax.jit(functools.partial(xslot_iterations_ref, iters=3))(*args)
        results[f"S{s}_upd"] = float(jnp.max(jnp.abs(uf - ur)))
        results[f"S{s}_attn"] = float(jnp.max(jnp.abs(af - ar)))
    # tolerances: upd (the class scores) is tight; attn passes through the
    # renorm's GLOBAL sum (slot_attention.py:56) whose fp32 reduction order
    # differs between the kernel's per-sample (S,N) sum and XLA's batched
    # reduce — the deviation grows with S*N (measured 2e-6 at S=30, 6e-3 at
    # S=1000; both identical-to-oracle within fp32, see PARITY.md).
    ok = (results["S30_upd"] < 1e-4 and results["S1000_upd"] < 1e-3
          and results["S30_attn"] < 1e-4 and results["S1000_attn"] < 2e-2)
    print(json.dumps({"metric": "slot_kernel_compiled_parity", "ok": ok,
                      "max_abs_diff": results}))
    if not ok:
        raise SystemExit(1)


def serving_bench():
    """CUB-200-scale serving latency (``python bench.py --serving``): the
    fused-slot-kernel auto-selection's measured win region — resnest50d +
    xSlot with S = 200x5 = 1000 slots, small batch, bf16 inference. Prints
    one JSON line per (batch, slot-path) cell with device-side latency."""
    import jax
    import jax.numpy as jnp

    from scouter_tpu.core import ScouterConfig, setup_compilation_cache
    from scouter_tpu.models import auto_fused_slot, build_slot_model

    setup_compilation_cache()
    cfg = ScouterConfig(
        model="resnest50d", dataset="CUB200", num_classes=200, channel=2048,
        use_slot=True, slots_per_class=5, power=2, loss_status=1, to_k_layer=3,
        lambda_value=10.0, img_size=260, batch_size=1,
    )
    for bs in (1, 16):
        auto = auto_fused_slot(cfg, train=False, batch_size=bs)
        for fused in (False, True) if auto else (False,):
            model = build_slot_model(cfg, fused_slot=fused, dtype=jnp.bfloat16)
            x = jnp.zeros((bs, cfg.img_size, cfg.img_size, 3), jnp.float32)
            variables = model.init(jax.random.PRNGKey(0), x)

            @jax.jit
            def forward(variables, images):
                return model.apply(variables, images.astype(jnp.bfloat16))["logits"]

            np.asarray(forward(variables, x))
            for _ in range(3):
                np.asarray(forward(variables, x))
            iters = 50
            t0 = time.perf_counter()
            outs = [forward(variables, x) for _ in range(iters)]
            np.asarray(outs[-1])
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(json.dumps({
                "metric": "serving latency (resnest50d+xSlot S=1000, 260px, bf16)",
                "batch": bs, "slot_path": "pallas_fused" if fused else "jnp",
                "auto_selected": "pallas_fused" if auto else "jnp",
                "value": round(ms, 3), "unit": "ms/batch",
                "ms_per_image": round(ms / bs, 3),
            }), flush=True)


def main():
    import jax

    # persistent compilation cache: repeat bench runs skip the (slow) XLA compile
    from scouter_tpu.core import setup_compilation_cache

    setup_compilation_cache()
    import jax.numpy as jnp

    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.models import build_slot_model

    cfg = ScouterConfig(
        model="resnest26d", dataset="ImageNet", num_classes=10, channel=2048,
        use_slot=True, slots_per_class=3, power=2, loss_status=1, to_k_layer=3,
        lambda_value=1.0, img_size=224, batch_size=70,
    )
    # bf16 compute dtype end-to-end (fp32 master params, bf16 activations and
    # conv/matmul compute on the MXU): 1.4x over fp32 params on v5e.
    # --s2d: lower the stem's first conv through space-to-depth (exact; see
    # models/layers.py::SpaceToDepthStemConv) to measure the stem-MXU-shape fix.
    bk = {"s2d_stem": True} if "--s2d" in sys.argv else None
    # --int8: hybrid int8 serving quantization (serve/quant.py) — pointwise
    # convs run s8xs8->s32 on the MXU; measured r4 on the isolated shapes:
    # 1.65x on the fat 1x1s, +8% on the grouped radix 3x3s (left in bf16).
    quant = "int8" if "--int8" in sys.argv else None
    model = build_slot_model(cfg, dtype=jnp.bfloat16, backbone_kwargs=bk)
    x = jnp.zeros((cfg.batch_size, cfg.img_size, cfg.img_size, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros_like(x, jnp.float32))

    import contextlib

    from scouter_tpu.serve.quant import quantized_convs

    @jax.jit
    def forward(variables, images):
        ctx = quantized_convs(quant) if quant else contextlib.nullcontext()
        with ctx:
            out = model.apply(variables, images.astype(jnp.bfloat16))
        return out["logits"]

    # model FLOPs from the compiled program's own cost analysis (the same
    # accounting PARITY.md's roofline uses) — basis for the absolute claim
    try:
        ca = forward.lower(variables, x).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_batch = float(ca.get("flops", 0.0))
    except Exception:
        flops_per_batch = 0.0

    # compile + warmup. Timing uses an actual host fetch of the final output:
    # on remote-attached runtimes block_until_ready can return before device
    # completion, but a data fetch cannot (in-order execution bounds the batch).
    np.asarray(forward(variables, x))
    for _ in range(3):
        np.asarray(forward(variables, x))

    iters = 120
    t0 = time.perf_counter()
    outs = [forward(variables, x) for _ in range(iters)]
    np.asarray(outs[-1])
    dt = time.perf_counter() - t0

    img_s = cfg.batch_size * iters / dt
    suffix = (", s2d stem" if bk else "") + (", int8 pointwise" if quant else "")
    achieved_tflops = flops_per_batch * iters / dt / 1e12
    print(json.dumps({
        "metric": f"images/sec/chip (resnest26d+xSlot, 224px, bs=70, inference{suffix})",
        "value": round(img_s, 1),
        "unit": "img/s",
        # PRIMARY evidence (measured on this chip): absolute throughput and
        # the MFU it implies against the v5e bf16 dense peak
        "achieved_tflops": round(achieved_tflops, 1),
        "mfu_vs_bf16_peak": round(achieved_tflops / TPU_V5E_BF16_PEAK_TFLOPS, 3),
        # SECONDARY (estimate): the A100 torch baseline is an ESTIMATE (see
        # module docstring); honest range given the 5-10% A100-MFU bracket:
        "vs_baseline": round(img_s / A100_TORCH_BASELINE_IMG_S, 3),
        "vs_baseline_basis": "ESTIMATED A100 torch 2500 img/s (no published "
                             "same-model number; bracket = 5-10% A100 MFU)",
        "vs_baseline_bracket": [round(img_s / 4200.0, 2), round(img_s / 2100.0, 2)],
    }))


if __name__ == "__main__":
    if "--slot-kernel" in sys.argv:
        slot_kernel_check()
    elif "--serving" in sys.argv:
        serving_bench()
    else:
        main()

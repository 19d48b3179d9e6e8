"""On-TPU zoo smoke: compile + forward one representative entrypoint per
backbone family on the real chip, bf16, asserting finite logits.

The CPU suite parity-tests every family against the vendored torch reference;
this closes the remaining gap ("does each family's program actually compile
and run ON TPU"). Writes incremental JSON lines so a timeout still leaves a
record.

Usage: python examples/zoo_tpu_smoke.py [--families f1,f2] [--img 224]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# one representative per family (cheapest member that exercises the family's
# distinctive blocks)
FAMILY_REPS = {
    "resnet": "resnet18",
    "resnest": "resnest26d",
    "seresnet": "seresnet18",
    "ecaresnet": "ecaresnet50d_pruned",
    "res2net": "res2net50_26w_4s",
    "sknet": "skresnet18",
    "densenet": "densenet121",
    "dla": "dla34",
    "dpn": "dpn68",
    "efficientnet": "efficientnet_b0",
    "mixnet": "mixnet_s",
    "condconv": "efficientnet_cc_b0_4e",
    "mobilenetv2": "mobilenetv2_100",
    "mobilenetv3": "mobilenetv3_rw",
    "mnasnet": "mnasnet_100",
    "hrnet": "hrnet_w18_small",
    "inception_v3": "inception_v3",
    "inception_v4": "inception_v4",
    "inception_resnet_v2": "inception_resnet_v2",
    "nasnet": "nasnetalarge",
    "pnasnet": "pnasnet5large",
    "regnet": "regnetx_002",
    "selecsls": "selecsls42b",
    "senet": "seresnext26_32x4d",
    "tresnet": "tresnet_m",
    "vovnet": "vovnet39a",
    "xception": "xception",
    "gluon_xception": "gluon_xception65",
    "tf_same_pad": "tf_efficientnet_b0",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=None)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scouter_tpu.core import setup_compilation_cache

    setup_compilation_cache()

    from scouter_tpu.models import create_model, list_models

    reps = FAMILY_REPS
    if args.families:
        keep = set(args.families.split(","))
        reps = {k: v for k, v in reps.items() if k in keep}

    known = set(list_models())
    ok = fail = 0
    for family, name in reps.items():
        if name not in known:
            print(json.dumps({"family": family, "model": name,
                              "status": "NOT_REGISTERED"}), flush=True)
            fail += 1
            continue
        size = args.img
        try:
            t0 = time.perf_counter()
            model = create_model(name, num_classes=10, dtype=jnp.bfloat16)
            x = jnp.zeros((args.batch, size, size, 3), jnp.bfloat16)
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros_like(x, jnp.float32))
            fwd = jax.jit(lambda v, im: model.apply(v, im))
            logits = np.asarray(fwd(variables, x))
            dt = time.perf_counter() - t0
            finite = bool(np.isfinite(logits).all())
            print(json.dumps({
                "family": family, "model": name,
                "status": "OK" if finite else "NONFINITE",
                "logits_shape": list(logits.shape),
                "compile_plus_run_s": round(dt, 1),
            }), flush=True)
            ok += 1 if finite else 0
            fail += 0 if finite else 1
        except Exception as e:  # noqa: BLE001 - smoke harness records and moves on
            print(json.dumps({"family": family, "model": name,
                              "status": "ERROR",
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            fail += 1
    print(json.dumps({"summary": {"ok": ok, "fail": fail, "total": len(reps)}}),
          flush=True)
    if fail:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

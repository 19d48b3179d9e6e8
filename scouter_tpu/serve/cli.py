"""Serving export CLI.

``python -m scouter_tpu.serve.cli --dataset MNIST --model resnet18 ... \
      --export_path model.shlo [--serve_batch dynamic|N] [--platforms tpu,cpu]``

Rebuilds the model from the config-derived checkpoint name (the same
convention test.py re-derives, /root/reference/test.py:59-62), exports the
full serving program (uint8 image -> logits + slot maps) as a StableHLO
artifact, and round-trip-verifies it: the deserialized artifact must produce
the same logits as the live model on a probe batch before the CLI reports
success.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..core.config import config_from_args, get_args_parser
from .export import export_serving, load_artifact, make_serving_fn, save_artifact

__all__ = ["main"]


def main(argv=None):
    from ..core.cache import setup_compilation_cache

    setup_compilation_cache()
    parser = argparse.ArgumentParser(
        "SCOUTER-TPU serving export", parents=[get_args_parser()]
    )
    parser.add_argument("--export_path", default="saved_model/serving.shlo")
    parser.add_argument("--serve_batch", default="dynamic",
                        help="'dynamic' (batch-polymorphic artifact) or an int")
    parser.add_argument("--platforms", default=None,
                        help="comma list, e.g. tpu,cpu; default: current backend")
    parser.add_argument("--serve_dtype", default=None,
                        choices=[None, "float32", "bfloat16"],
                        help="compute dtype baked into the artifact")
    ns = parser.parse_args(argv)
    cfg = config_from_args(ns).replace(use_pre=False)

    import jax
    import jax.numpy as jnp

    from ..train.state import restore_inference_state

    channels = 1 if cfg.dataset == "MNIST" else 3
    _, state, restored = restore_inference_state(cfg)
    if restored:
        print(f"restored {restored}")
    else:
        print(f"no checkpoint found for this config; exporting fresh-init weights")

    batch = None if ns.serve_batch == "dynamic" else int(ns.serve_batch)
    platforms = ns.platforms.split(",") if ns.platforms else None
    dtype = {None: None, "float32": jnp.float32, "bfloat16": jnp.bfloat16}[ns.serve_dtype]

    exported = export_serving(
        cfg, state.variables(), batch=batch, platforms=platforms, compute_dtype=dtype
    )
    os.makedirs(os.path.dirname(os.path.abspath(ns.export_path)), exist_ok=True)
    size = save_artifact(exported, ns.export_path)
    print(f"wrote {ns.export_path} ({size / 1e6:.1f} MB, "
          f"platforms={list(exported.platforms)}, batch="
          f"{'dynamic' if batch is None else batch})")

    # round-trip verification: artifact logits == live-model logits. bf16
    # programs legitimately differ between compilations (fusion changes
    # intermediate rounding; bf16 eps ~8e-3), so the tolerance follows dtype.
    probe_n = 2 if batch is None else batch
    rng = np.random.RandomState(0)
    probe = rng.randint(0, 256, (probe_n, cfg.img_size, cfg.img_size, channels),
                        dtype=np.uint8)
    live = jax.jit(make_serving_fn(cfg, state.variables(), compute_dtype=dtype))
    want = np.asarray(live(jnp.asarray(probe))["logits"])
    got = np.asarray(load_artifact(ns.export_path)(probe)["logits"])
    tol = dict(rtol=2e-5, atol=2e-5) if dtype != jnp.bfloat16 \
        else dict(rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(got, want, **tol)
    print(f"round-trip verified: artifact logits match live model "
          f"(max |delta| {np.abs(got - want).max():.2e})")


if __name__ == "__main__":
    main()

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

from ..core.checkpoint import checkpoint_path, restore_checkpoint
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

    from ..models import build_slot_model
    from ..train.state import create_train_state

    channels = 1 if cfg.dataset == "MNIST" else 3
    model = build_slot_model(cfg)
    sample = jnp.zeros((1, cfg.img_size, cfg.img_size, channels), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample)
    state, _ = create_train_state(variables, cfg.lr)
    ckpt = checkpoint_path(cfg.output_dir, cfg)
    if os.path.exists(ckpt):
        state, _, _ = restore_checkpoint(ckpt, state)
        print(f"restored {ckpt}")
    else:
        print(f"no checkpoint at {ckpt}; exporting fresh-init weights")

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

    # round-trip verification: artifact logits == live-model logits
    probe_n = 2 if batch is None else batch
    rng = np.random.RandomState(0)
    probe = rng.randint(0, 256, (probe_n, cfg.img_size, cfg.img_size, channels),
                        dtype=np.uint8)
    live = make_serving_fn(cfg, state.variables(), compute_dtype=dtype)
    want = np.asarray(live(jnp.asarray(probe))["logits"])
    got = np.asarray(load_artifact(ns.export_path)(probe)["logits"])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    print(f"round-trip verified: artifact logits match live model "
          f"(max |delta| {np.abs(got - want).max():.2e})")


if __name__ == "__main__":
    main()

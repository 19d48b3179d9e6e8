"""XAI-baseline comparison driver — torchcam_vis.py capability.

The reference script (``torchcam_vis.py:56-267``) loads the *backbone-only*
model (``load_backbone``, never the slot module), takes one validation image,
and renders saliency maps from every attribution family side by side: IGOS,
RISE, extremal perturbation, IBA, and the torchcam CAM suite, one map per
class. This driver does the same against the JAX backbone, writing
``<out_dir>/<method>_<class>.png`` overlays.

Method set: cam, gradcam, gradcampp, smooth_gradcampp, scorecam, sscam, isscam,
gradient, deconvnet, guided_backprop, linear_approx, rise, extremal, igos, iba.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional

import numpy as np

__all__ = ["compare_methods", "main"]


def compare_methods(
    model,
    variables,
    image_u8: np.ndarray,
    class_indices: List[int],
    out_dir: str,
    *,
    dataset: str = "ImageNet",
    img_size: int = 260,
    methods: Optional[List[str]] = None,
    seed: int = 0,
    fast: bool = False,
    grad_min_level: float = 0.0,
    iba_estimate_batches=None,
) -> Dict[str, Dict[int, np.ndarray]]:
    """Run the attribution suite for the given classes; returns method -> class
    -> (h, w) maps and writes jet overlays.

    ``grad_min_level``: the reference's mask floor (``torchcam_vis.py:44-51``,
    the ``--grad_min_level`` flag): relu -> min-max -> max(mask, level) ->
    re-min-max before rendering."""
    import jax
    import jax.numpy as jnp

    from ..data.transforms import preprocess_batch
    from . import cam as cam_mod
    from .backprop import deconvnet, gradient_saliency, guided_backprop, linear_approx
    from .extremal import extremal_perturbation
    from .igos import gaussian_blur_baseline, integrated_mask
    from .rise import rise
    from .vis import apply_colormap_on_image

    x = preprocess_batch(jnp.asarray(image_u8[None]), dataset=dataset, img_size=img_size)

    def forward(imgs):
        return model.apply(variables, imgs)

    key = jax.random.PRNGKey(seed)
    n_masks = 400 if fast else 8000
    ep_iters = 50 if fast else 800
    igos_iters = 5 if fast else 15

    methods = methods or [
        "cam", "gradcam", "gradcampp", "smooth_gradcampp", "scorecam",
        "gradient", "guided_backprop", "rise", "extremal", "igos",
    ]
    results: Dict[str, Dict[int, np.ndarray]] = {m: {} for m in methods}

    rise_maps = None
    if "rise" in methods:
        rise_maps = rise(forward, x, key, num_masks=n_masks)

    blurred = gaussian_blur_baseline(x) if "igos" in methods else None

    iba_stats = iba_head = iba_features = None
    if "iba" in methods:
        # reference flow: estimate feature stats over val images
        # (torchcam_vis.py:201-206), then per-class analyze (:212-215). With
        # no estimation stream supplied, fall back to noise-jittered copies
        # of the input (documented single-image approximation).
        from .cam import backbone_split
        from .iba import estimate_stats

        iba_features, iba_head, _ = backbone_split(model, variables)
        feat_j = jax.jit(iba_features)
        if iba_estimate_batches is None:
            n_est = 4 if fast else 32
            ks = jax.random.split(jax.random.fold_in(key, 99), n_est)
            iba_estimate_batches = (
                x + 0.1 * jax.random.normal(k, x.shape) for k in ks
            )
        iba_stats = estimate_stats(lambda b: feat_j(b), iba_estimate_batches)

    # Per-class methods are jitted ONCE with the class index traced: each
    # method compiles one program reused for every requested class, instead
    # of dispatching hundreds of eager ops per (method, class) over the
    # device tunnel (the same fix as the jitted rise() program).
    jitted = {
        "cam": lambda v, im, c, k: cam_mod.cam(model, v, im, c),
        "gradcam": lambda v, im, c, k: cam_mod.gradcam(model, v, im, c),
        "gradcampp": lambda v, im, c, k: cam_mod.gradcampp(model, v, im, c),
        "smooth_gradcampp":
            lambda v, im, c, k: cam_mod.smooth_gradcampp(model, v, im, c, k),
        "scorecam": lambda v, im, c, k: cam_mod.scorecam(model, v, im, c),
        "sscam": lambda v, im, c, k: cam_mod.sscam(model, v, im, c, k),
        "isscam": lambda v, im, c, k: cam_mod.isscam(model, v, im, c),
        "gradient": lambda v, im, c, k: gradient_saliency(model, v, im, c),
        "deconvnet": lambda v, im, c, k: deconvnet(model, v, im, c),
        "guided_backprop":
            lambda v, im, c, k: guided_backprop(model, v, im, c),
        "linear_approx": lambda v, im, c, k: linear_approx(model, v, im, c),
    }
    jitted = {m: jax.jit(fn) for m, fn in jitted.items() if m in methods}

    for c in class_indices:
        for m in methods:
            if m in jitted:
                sal = jitted[m](variables, x, jnp.int32(c), key)
            elif m == "rise":
                sal = rise_maps[c]
            elif m == "extremal":
                masks, _ = extremal_perturbation(forward, x, c, max_iter=ep_iters)
                sal = masks[0, :, :, 0]
            elif m == "igos":
                res = integrated_mask(forward, x, blurred, c, key,
                                      max_iterations=igos_iters)
                sal = 1.0 - res.upsampled  # 0 = important in IGOS
            elif m == "iba":
                from .iba import iba_analyze

                def readout_loss(z, c=c):
                    logp = jax.nn.log_softmax(iba_head(z), axis=1)
                    return -logp[:, c].mean()

                sal = iba_analyze(iba_features, readout_loss, x, iba_stats,
                                  key, out_shape=x.shape[1:3])
            elif m == "deeplift":
                from .deeplift import layer_deeplift

                sal = layer_deeplift(model, variables, x, c).sum(axis=-1)
            elif m == "excitation":
                from .excitation import excitation_backprop

                sal = excitation_backprop(model, variables, x, c)
            else:
                raise ValueError(f"unknown method {m!r}")
            # degenerate maps (all-zero after ReLU) min-max normalize to nan in
            # the reference as well; sanitize for rendering/aggregation
            results[m][c] = np.nan_to_num(np.asarray(sal))

    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    raw = Image.fromarray(image_u8.squeeze() if image_u8.shape[-1] == 1 else image_u8)
    raw_rgb = raw.convert("RGB")
    for m, per_class in results.items():
        for c, sal in per_class.items():
            # make_grad normalization chain (torchcam_vis.py:44-51)
            s = np.maximum(sal, 0)
            s = s - s.min()
            s = s / (s.max() if s.max() > 0 else 1.0)
            s = np.maximum(s, grad_min_level)
            s = s - s.min()
            denom = s.max() if s.max() > 0 else 1.0
            s8 = (s / denom * 255).astype(np.uint8)
            s_img = Image.fromarray(s8, mode="L").resize(raw_rgb.size, Image.BILINEAR)
            _, overlaid = apply_colormap_on_image(raw_rgb, np.array(s_img), "jet")
            overlaid.save(os.path.join(out_dir, f"{m}_{c}.png"))
    return results


def main(argv=None):
    import jax

    from ..core.cache import setup_compilation_cache

    setup_compilation_cache()
    from ..core.checkpoint import checkpoint_path, restore_checkpoint
    from ..core.config import config_from_args, get_args_parser
    from ..data import select_dataset
    from ..models import create_model
    from ..train.state import create_train_state

    parser = argparse.ArgumentParser(
        "SCOUTER-TPU attribution comparison (torchcam_vis parity)",
        parents=[get_args_parser()],
    )
    parser.add_argument("--methods", default="", help="comma list; empty = default set")
    parser.add_argument("--fast", default=False, action="store_true")
    ns = parser.parse_args(argv)
    cfg = config_from_args(ns)

    # backbone-only, like load_backbone in torchcam_vis (:109)
    model = create_model(cfg.model, num_classes=cfg.num_classes,
                         in_chans=1 if cfg.dataset == "MNIST" else 3,
                         mnist_stem=cfg.dataset == "MNIST")
    import jax.numpy as jnp

    sample = jnp.zeros((1, cfg.img_size, cfg.img_size,
                        1 if cfg.dataset == "MNIST" else 3))
    variables = model.init(jax.random.PRNGKey(0), sample)

    no_slot_cfg = cfg.replace(use_slot=False)
    path = checkpoint_path(cfg.output_dir, no_slot_cfg)
    if os.path.exists(path):
        state, _ = create_train_state(variables, cfg.lr)
        state, _, _ = restore_checkpoint(path, state)
        variables = state.variables()
        # drop the slot-model nesting if present
        if "backbone" in variables.get("params", {}):
            variables = {k: v["backbone"] for k, v in variables.items()}

    ds_val = select_dataset(cfg, train=False)
    image_u8 = ds_val.images[cfg.vis_id]
    methods = [m for m in ns.methods.split(",") if m] or None
    compare_methods(model, variables, image_u8, list(range(cfg.num_classes)),
                    out_dir="vis_compare", dataset=cfg.dataset,
                    img_size=cfg.img_size, methods=methods, fast=ns.fast,
                    grad_min_level=cfg.grad_min_level)


if __name__ == "__main__":
    main()

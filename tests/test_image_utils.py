"""Image utils + rc config + grad clipping tests."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from scouter_tpu.explain.image_utils import imread, imsc, read_rc_config, resample


def test_imread_imsc_roundtrip(tmp_path):
    from PIL import Image

    arr = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(arr).save(p)
    img = imread(p)
    assert img.shape == (16, 16, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    scaled = imsc(img * 7 - 3)
    assert scaled.min() == pytest.approx(0.0) and scaled.max() == pytest.approx(1.0)


def test_resample():
    img = np.random.RandomState(1).rand(8, 8).astype(np.float32)
    out = resample(img, (16, 16))
    assert out.shape == (16, 16)
    out3 = resample(np.stack([img] * 3, -1), (4, 4))
    assert out3.shape == (4, 4, 3)


def test_rc_config_defaults_and_override(tmp_path):
    cfg = read_rc_config(str(tmp_path / "missing"))
    assert "benchmark" in cfg and "store" in cfg["benchmark"]
    p = tmp_path / "rc.json"
    p.write_text(json.dumps({"benchmark": {"store": "/tmp/x.db"}, "extra": 1}))
    cfg = read_rc_config(str(p))
    assert cfg["benchmark"]["store"] == "/tmp/x.db"
    assert cfg["benchmark"]["voc_dir"]  # default preserved
    assert cfg["extra"] == 1


def test_clip_grad_limits_updates():
    from scouter_tpu.models import build_slot_model
    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.train.state import create_train_state
    from scouter_tpu.train.steps import make_train_step

    import jax

    cfg = ScouterConfig(model="resnet10", dataset="MNIST", num_classes=10,
                        use_slot=True, slots_per_class=1, power=1, img_size=32,
                        pre_trained=False, freeze_layers=0)
    model = build_slot_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    state, tx = create_train_state(variables, 1e-3)
    step = make_train_step(model, tx, 1.0, donate=False, clip_grad=1e-8)
    batch = {"image": jnp.ones((4, 32, 32, 1)), "label": jnp.zeros((4,), jnp.int32)}
    new_state, _ = step(state, batch)
    # with a tiny clip, the AdamW update magnitude is bounded by ~lr
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), new_state.params, state.params
    )
    assert max(jax.tree_util.tree_leaves(delta)) < 1e-2

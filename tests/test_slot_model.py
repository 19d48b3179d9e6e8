"""End-to-end SlotModel parity vs the reference's own torch SlotModel."""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.core import ScouterConfig
from scouter_tpu.models import build_slot_model, torch_state_dict_to_variables

from test_models import _make_ref_model, REFERENCE  # stubs + sys.path setup


def _make_ref_slot_model(cfg: ScouterConfig):
    """Build the reference SlotModel (sloter/slot_model.py:55) on modern torch."""
    import torch

    _make_ref_model("resnet18")  # ensures stubs + sys.path
    from sloter.slot_model import SlotModel as RefSlotModel

    ns = types.SimpleNamespace(
        model=cfg.model,
        dataset=cfg.dataset,
        channel=cfg.channel,
        num_classes=cfg.num_classes,
        pre_trained=False,
        use_slot=cfg.use_slot,
        use_pre=False,
        grad=False,
        hidden_dim=cfg.hidden_dim,
        slots_per_class=cfg.slots_per_class,
        loss_status=cfg.loss_status,
        power=cfg.power,
        to_k_layer=cfg.to_k_layer,
        lambda_value=str(cfg.lambda_value),
        vis=False,
        vis_id=0,
        freeze_layers=0,
    )
    # torch 1.6 accepted negative std in torch.normal (sign flip on the noise,
    # distributionally identical to |std|); modern torch raises. Patch around
    # reference-model construction only.
    orig_normal = torch.normal
    torch.normal = lambda mean, std, **kw: orig_normal(mean, std.abs(), **kw)
    try:
        return RefSlotModel(ns)
    finally:
        torch.normal = orig_normal


@pytest.mark.parametrize(
    "spc,power,loss_status",
    [(1, 1, 1), (2, 2, -1)],
)
def test_slot_model_matches_reference(spc, power, loss_status):
    import torch

    cfg = ScouterConfig(
        model="resnet18",
        dataset="ImageNet",  # 3-channel path, standard stem
        num_classes=5,
        channel=512,
        use_slot=True,
        slots_per_class=spc,
        power=power,
        loss_status=loss_status,
        to_k_layer=2,
        lambda_value=1.0,
        img_size=288,  # 288/32 = 9x9 features without the odd-size path
    )
    torch.manual_seed(0)
    ref = _make_ref_slot_model(cfg)
    ref.eval()

    variables = torch_state_dict_to_variables(ref.state_dict())
    model = build_slot_model(cfg)

    x = np.random.RandomState(0).randn(2, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))  # log_softmax output
    out = model.apply(variables, jnp.asarray(x))
    ours_logp = jax.nn.log_softmax(out["logits"], axis=1)
    np.testing.assert_allclose(np.asarray(ours_logp), ref_out.numpy(), rtol=1e-3, atol=2e-3)


def test_slot_model_loss_matches_reference():
    import torch

    cfg = ScouterConfig(
        model="resnet18", dataset="ImageNet", num_classes=4, channel=512,
        use_slot=True, slots_per_class=1, power=2, loss_status=1,
        to_k_layer=1, lambda_value=3.0, img_size=288,
    )
    torch.manual_seed(3)
    ref = _make_ref_slot_model(cfg)
    ref.eval()
    variables = torch_state_dict_to_variables(ref.state_dict())
    model = build_slot_model(cfg)

    x = np.random.RandomState(3).randn(2, 288, 288, 3).astype(np.float32)
    labels = np.array([1, 3])
    with torch.no_grad():
        _, loss_list = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(labels))
    out = model.apply(variables, jnp.asarray(x))
    from scouter_tpu.ops import scouter_loss

    _, losses = scouter_loss(out["logits"], jnp.asarray(labels), out["area_loss"], cfg.lambda_value)
    np.testing.assert_allclose(float(losses["loss"]), float(loss_list[0]), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(losses["log_loss"]), float(loss_list[1]), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(losses["att_loss"]), float(loss_list[2]), rtol=1e-3, atol=1e-3)


def test_mnist_slot_model_builds_and_runs():
    cfg = ScouterConfig(model="resnet18", dataset="MNIST", num_classes=10,
                        use_slot=True, slots_per_class=1, power=1)
    model = build_slot_model(cfg)
    x = jnp.zeros((2, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["logits"].shape == (2, 10)
    assert out["attn"].shape == (2, 10, 4)  # 64px -> 2x2 features


class TestAutoFusedSlot:
    """Fused-kernel selection hook: parked as opt-in (round-3 end-to-end
    serving measurement — see models/__init__.py docstring)."""

    def test_decision_is_opt_in(self):
        from scouter_tpu.models import auto_fused_slot

        cub = ScouterConfig(model="resnest50d", dataset="CUB200",
                            num_classes=200, channel=2048, use_slot=True,
                            slots_per_class=5, batch_size=64)
        # even the op-level win region is NOT auto-selected: end-to-end the
        # jnp path wins (bs=1) or ties (bs=16)
        assert not auto_fused_slot(cub, train=False, batch_size=1)
        assert not auto_fused_slot(cub, train=False, batch_size=16)
        assert not auto_fused_slot(cub, train=True, batch_size=1)

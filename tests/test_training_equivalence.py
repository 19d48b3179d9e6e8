"""Cross-framework training equivalence: starting from the SAME weights on the
SAME batches, the torch reference SlotModel and this framework's train step
must produce matching loss trajectories (AdamW, BN updates, loss composition).

This is the strongest training-path check available: it exercises forward,
loss, backward, optimizer, and BN-statistics semantics together.
"""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from scouter_tpu.core import ScouterConfig
from scouter_tpu.models import build_slot_model, torch_state_dict_to_variables
from scouter_tpu.train.state import create_train_state
from scouter_tpu.train.steps import make_train_step

from test_models import _make_ref_model, REFERENCE  # noqa: F401 (stubs)
from test_slot_model import _make_ref_slot_model


def test_loss_trajectories_match():
    cfg = ScouterConfig(
        model="resnet18", dataset="ImageNet", num_classes=4, channel=512,
        use_slot=True, slots_per_class=1, power=1, loss_status=1, to_k_layer=1,
        lambda_value=1.0, img_size=288, batch_size=4,
        pre_trained=False, freeze_layers=0,
    )
    torch.manual_seed(0)
    ref = _make_ref_slot_model(cfg)
    ref.train()

    # identical data stream
    rng = np.random.RandomState(0)
    batches = [
        (rng.randn(4, 288, 288, 3).astype(np.float32), rng.randint(0, 4, 4))
        for _ in range(6)
    ]

    # ---- torch side: AdamW defaults as in the reference (train.py:146-148)
    opt = torch.optim.AdamW(ref.parameters(), lr=1e-3)
    torch_losses = []
    for x, y in batches:
        opt.zero_grad()
        _, loss_list = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           torch.from_numpy(y))
        loss = loss_list[0]
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # ---- jax side: same initial weights (convert BEFORE torch training moved them)
    torch.manual_seed(0)
    ref2 = _make_ref_slot_model(cfg)
    variables = torch_state_dict_to_variables(ref2.state_dict())
    model = build_slot_model(cfg)
    state, tx = create_train_state(variables, 1e-3)
    step = make_train_step(model, tx, cfg.lambda_value, donate=False)
    jax_losses = []
    for x, y in batches:
        state, metrics = step(state, {"image": jnp.asarray(x), "label": jnp.asarray(y)})
        jax_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3, atol=2e-3)

"""Extremal perturbation parity vs the reference torchray implementation."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from scouter_tpu.explain.extremal import (
    MaskGenerator,
    apply_pyramid,
    contrastive_reward,
    extremal_perturbation,
    imsmooth,
    perturbation_pyramid,
    simple_reward,
)

REFERENCE = "/root/reference"


def _ref_modules():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from torchray.attribution import extremal_perturbation as ref_ep
    from torchray import utils as ref_utils

    return ref_ep, ref_utils


class TestImsmooth:
    @pytest.mark.parametrize("sigma", [0.5, 2.0, 5.0])
    def test_matches_torchray(self, sigma):
        _, ref_utils = _ref_modules()
        x = np.random.RandomState(0).rand(1, 3, 24, 24).astype(np.float32)
        ref = ref_utils.imsmooth(torch.from_numpy(x), sigma=sigma).numpy()
        ours = imsmooth(jnp.asarray(x.transpose(0, 2, 3, 1)), sigma)
        np.testing.assert_allclose(
            np.asarray(ours), ref.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
        )


class TestPyramid:
    def test_apply_matches_torchray(self):
        ref_ep, _ = _ref_modules()
        x = np.random.RandomState(1).rand(1, 3, 16, 16).astype(np.float32)
        ref_pert = ref_ep.Perturbation(torch.from_numpy(x), num_levels=5, max_blur=10)
        mask = np.random.RandomState(2).rand(2, 1, 16, 16).astype(np.float32)
        ref_out = ref_pert.apply(torch.from_numpy(mask)).numpy()

        pyr = perturbation_pyramid(jnp.asarray(x.transpose(0, 2, 3, 1)), 5, 10.0)
        ours = apply_pyramid(pyr, jnp.asarray(mask[:, 0]))
        np.testing.assert_allclose(
            np.asarray(ours), ref_out.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
        )


class TestMaskGenerator:
    @pytest.mark.parametrize("shape,step,sigma", [((32, 32), 3, 9.0), ((28, 40), 4, 8.0)])
    def test_generate_matches_torchray(self, shape, step, sigma):
        ref_ep, _ = _ref_modules()
        ref_gen = ref_ep.MaskGenerator(shape, step, sigma)
        gen = MaskGenerator(shape, step, sigma)
        assert gen.shape_in == ref_gen.shape_in
        assert gen.shape_out == ref_gen.shape_out
        np.testing.assert_allclose(
            np.asarray(gen.weight), ref_gen.weight.numpy(), rtol=1e-5, atol=1e-6
        )

        pmask = np.random.RandomState(3).rand(2, 1, *ref_gen.shape_in).astype(np.float32)
        ref_cropped, ref_full = ref_gen.generate(torch.from_numpy(pmask))
        cropped, full = gen.generate(jnp.asarray(pmask[:, 0]))
        np.testing.assert_allclose(
            np.asarray(full), ref_full.numpy()[:, 0], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(cropped), ref_cropped.numpy()[:, 0], rtol=1e-4, atol=1e-5
        )


class TestRewards:
    def test_simple_and_contrastive(self):
        y = jnp.asarray(np.random.RandomState(4).rand(4, 6).astype(np.float32))
        np.testing.assert_allclose(simple_reward(y, 2, "preserve"), y[:, 2])
        np.testing.assert_allclose(simple_reward(y, 2, "delete"), -y[:, 2])
        dual = simple_reward(y, 1, "dual")
        assert dual.shape == (2,)
        c = contrastive_reward(y, 3, "preserve")
        assert c.shape == (4,)


class TestEndToEnd:
    def test_mask_concentrates_on_signal(self):
        # model scores class 0 by the brightness of a corner patch; the
        # optimized preserve-mask should allocate mass there.
        def forward(imgs):
            c = imgs[:, 4:12, 4:12].mean(axis=(1, 2, 3))
            return jnp.stack([c, -c], axis=1)

        x = jnp.ones((1, 32, 32, 3)) * 0.1
        x = x.at[:, 4:12, 4:12].set(1.0)
        masks, hist = extremal_perturbation(
            forward, x, 0, areas=(0.15,), max_iter=60, step=3, sigma=9, jitter=False
        )
        m = np.asarray(masks)[0, :, :, 0]
        inside = m[4:12, 4:12].mean()
        outside = m[20:, 20:].mean()
        assert inside > outside
        assert hist.shape == (1, 2, 60)


class TestFullLoopParity:
    """End-to-end extremal_perturbation vs the vendored torchray loop
    (extremal_perturbation.py:456-691) — deterministic (the jitter flip is
    t%2==0 in both), so the full SGD trajectory can be compared."""

    def test_60_iter_trajectory(self):
        import sys

        import torch

        from test_models import _make_ref_model
        from scouter_tpu.models import create_model, torch_state_dict_to_variables

        torch.manual_seed(3)
        ref = _make_ref_model("resnet18", num_classes=6)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        model = create_model("resnet18", num_classes=6)
        x = np.random.RandomState(3).randn(1, 64, 64, 3).astype(np.float32)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from torchray.attribution.extremal_perturbation import (
            extremal_perturbation as tr_ep,
        )

        masks_t, _ = tr_ep(ref, xt, 2, areas=[0.12], max_iter=60)
        want = masks_t.detach().numpy()[0, 0]

        from scouter_tpu.explain.extremal import extremal_perturbation

        masks_j, _ = extremal_perturbation(
            lambda imgs: model.apply(variables, imgs),
            jnp.asarray(x), 2, areas=(0.12,), max_iter=60)
        got = np.asarray(masks_j)[0, :, :, 0]
        # fp divergence compounds over 60 chaotic SGD steps; 5e-2 max abs on a
        # [0,1] mask demonstrates trajectory-level parity
        assert np.abs(want - got).max() < 5e-2
        assert abs(want.mean() - got.mean()) < 5e-3

    def test_delete_variant_trajectory(self):
        """DELETE variant (reward = -y[target] on perturbed-preserve inverse),
        same full-loop comparison as above."""
        import sys

        import torch

        from test_models import _make_ref_model
        from scouter_tpu.models import create_model, torch_state_dict_to_variables

        torch.manual_seed(3)
        ref = _make_ref_model("resnet18", num_classes=6)
        ref.eval()
        variables = torch_state_dict_to_variables(ref.state_dict())
        model = create_model("resnet18", num_classes=6)
        x = np.random.RandomState(3).randn(1, 64, 64, 3).astype(np.float32)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from torchray.attribution.extremal_perturbation import (
            DELETE_VARIANT,
            extremal_perturbation as tr_ep,
        )

        masks_t, _ = tr_ep(ref, xt, 1, areas=[0.15], max_iter=40,
                           variant=DELETE_VARIANT)
        want = masks_t.detach().numpy()[0, 0]

        from scouter_tpu.explain.extremal import DELETE, extremal_perturbation

        masks_j, _ = extremal_perturbation(
            lambda imgs: model.apply(variables, imgs),
            jnp.asarray(x), 1, areas=(0.15,), max_iter=40, variant=DELETE)
        got = np.asarray(masks_j)[0, :, :, 0]
        assert np.abs(want - got).max() < 6e-2

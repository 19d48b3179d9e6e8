"""XAI attribution suite tests: CAM family, RISE, pointing game."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.explain.cam import (
    backbone_split,
    cam,
    gradcam,
    gradcampp,
    isscam,
    scorecam,
    smooth_gradcampp,
    sscam,
)
from scouter_tpu.explain.pointing_game import PointingGame, saliency_point
from scouter_tpu.explain.rise import rise
from scouter_tpu.models import create_model


@pytest.fixture(scope="module")
def setup():
    model = create_model("resnet10", num_classes=5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


class TestCamFamily:
    def test_cam_shape_and_range(self, setup):
        model, variables, x = setup
        m = cam(model, variables, x, class_idx=2)
        assert m.shape == (2, 2)
        assert float(m.min()) == pytest.approx(0.0, abs=1e-6)
        assert float(m.max()) == pytest.approx(1.0, abs=1e-6)

    def test_gradcam_and_pp(self, setup):
        model, variables, x = setup
        for fn in (gradcam, gradcampp):
            m = fn(model, variables, x, class_idx=1)
            assert m.shape == (2, 2)
            assert np.all(np.isfinite(np.asarray(m)))

    def test_smooth_gradcampp(self, setup):
        model, variables, x = setup
        m = smooth_gradcampp(model, variables, x, 0, jax.random.PRNGKey(3), num_samples=2)
        assert m.shape == (2, 2)

    def test_scorecam_family(self, setup):
        model, variables, x = setup
        m = scorecam(model, variables, x, 1, batch_size=64)
        assert m.shape == (2, 2)
        m = sscam(model, variables, x, 1, jax.random.PRNGKey(4), batch_size=64, num_samples=2)
        assert m.shape == (2, 2)
        m = isscam(model, variables, x, 1, batch_size=64, num_samples=2)
        assert m.shape == (2, 2)

    def test_cam_weights_match_fc_column(self, setup):
        model, variables, x = setup
        features, _, _ = backbone_split(model, variables)
        feats = features(x)
        w = variables["params"]["fc"]["kernel"][:, 3]
        expected = (feats[0] * w).sum(-1)
        expected = (expected - expected.min()) / (expected.max() - expected.min())
        got = cam(model, variables, x, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-6)


class TestRise:
    def test_shapes_and_determinism(self, setup):
        model, variables, x = setup

        def forward(imgs):
            return model.apply(variables, imgs)

        s1 = rise(forward, x, jax.random.PRNGKey(0), num_masks=64, batch_size=32)
        s2 = rise(forward, x, jax.random.PRNGKey(0), num_masks=64, batch_size=32)
        assert s1.shape == (5, 64, 64)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        s3 = rise(forward, x, jax.random.PRNGKey(1), num_masks=64, batch_size=32)
        assert np.abs(np.asarray(s1) - np.asarray(s3)).max() > 0

    def test_mask_upsample_matches_torchray(self):
        """The mask-generation upsample must match the reference's
        _upsample_reflect exactly: it re-derives its interpolation cell from
        the TARGET size (ceil(up/num_cells)=37 at 224px/7), not the outer
        shift cell (32) — using 32 changes every generated mask
        (rise.py:30-80)."""
        import sys

        sys.path.insert(0, "/root/reference")
        import torch

        from torchray.attribution.rise import _upsample_reflect

        h = 224
        num_cells = 7
        cell = -(-h // num_cells)
        up = h + cell
        grid = (np.random.RandomState(0).rand(4, 1, num_cells, num_cells)
                < 0.5).astype(np.float32)
        want = _upsample_reflect(torch.from_numpy(grid), (up, up)).numpy()[:, 0]

        from scouter_tpu.explain.rise import _upsample_reflect as ours

        got = np.asarray(ours(jnp.asarray(grid[:, 0]), up, up))
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_constant_model_gives_flat_center(self, setup):
        # with constant scores, saliency ~ E[mask] which is ~p everywhere
        def forward(imgs):
            return jnp.zeros((imgs.shape[0], 3))

        x = jnp.ones((1, 32, 32, 3))
        s = rise(forward, x, jax.random.PRNGKey(0), num_masks=512, batch_size=64)
        assert np.allclose(np.asarray(s), 0.5 * 0.5, atol=0.1)  # sigmoid(0)*E[mask]


class TestPointingGame:
    def test_hit_and_miss(self):
        pg = PointingGame(num_classes=2, tolerance=5)
        mask = np.zeros((50, 50), np.uint8)
        mask[10:15, 10:15] = 1
        assert pg.evaluate(mask, (12, 12)) == 1
        assert pg.evaluate(mask, (13, 18)) == 1  # within tolerance
        assert pg.evaluate(mask, (40, 40)) == -1
        pg.aggregate(1, 0)
        pg.aggregate(-1, 0)
        pg.aggregate(1, 1)
        assert pg.class_accuracies[0] == pytest.approx(0.5)
        assert pg.accuracy == pytest.approx(0.75)

    def test_saliency_point(self):
        s = np.zeros((4, 6))
        s[2, 5] = 1.0
        assert saliency_point(s) == (5, 2)

class TestPointingGameBenchmark:
    """Difficult-subset gating (torchray pointing_game.py:129-221)."""

    def test_flag_table_and_skips(self, tmp_path):
        from scouter_tpu.explain.pointing_game import (
            PointingGameBenchmark,
            load_difficult_flags,
        )

        p = tmp_path / "difficult.txt"
        p.write_text("img_a\t0\t1\nimg_b\t1\t0\n")
        flags = load_difficult_flags(str(p))
        assert flags["img_a"] == [False, True]

        bench = PointingGameBenchmark(num_classes=2, tolerance=2,
                                      difficult_flags=flags)
        mask = np.zeros((16, 16), np.uint8)
        mask[8, 8] = 1
        # easy pair -> skipped
        assert bench.evaluate_item("img_a", 0, mask, (8, 8)) == 0
        # difficult pair -> evaluated, hit
        assert bench.evaluate_item("img_a", 1, mask, (8, 8)) == 1
        # image absent from table -> evaluated (reference :188-197)
        assert bench.evaluate_item("img_c", 0, mask, (0, 0)) == -1
        # all-GT-difficult rule -> skipped (reference :204-211)
        assert bench.evaluate_item("img_b", 0, mask, (8, 8), all_gt_difficult=True) == 0
        assert bench.evaluate_item("img_b", 0, None, (8, 8)) == 0
        bench.aggregate(1, 1)
        bench.aggregate(-1, 0)
        assert bench.class_accuracies.tolist() == [0.0, 1.0]


class TestRiseReferenceParity:
    """RISE vs the vendored torchray implementation. Mask RNGs differ across
    frameworks (and the reference does not even correlate with itself across
    seeds at practical mask counts), so the definitive check feeds BOTH sides
    the same precomputed masks via filter_masks (rise.py:132-134)."""

    def test_exact_with_shared_masks(self):
        import sys

        import torch

        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from torchray.attribution import rise as tr_mod

        H = W = 32

        def quad_slices():
            return [(slice(0, 16), slice(0, 16)), (slice(0, 16), slice(16, 32)),
                    (slice(16, 32), slice(0, 16)), (slice(16, 32), slice(16, 32))]

        class TorchQuad(torch.nn.Module):
            def forward(self, x):
                m = x.mean(dim=1)
                outs = [m[:, sy, sx].mean(dim=(1, 2)) for sy, sx in quad_slices()]
                return torch.stack(outs, dim=1) * 10.0

        def jax_quad(x):
            m = x.mean(axis=-1)
            outs = [m[:, sy, sx].mean(axis=(1, 2)) for sy, sx in quad_slices()]
            return jnp.stack(outs, axis=1) * 10.0

        rng = np.random.RandomState(0)
        x = rng.rand(1, H, W, 3).astype(np.float32)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

        # reference-generated masks (binary grid -> reflect upsample -> shift)
        torch.manual_seed(11)
        cell = -(-H // 7)
        grid = (torch.rand(200, 1, 7, 7) < 0.5).float()
        up = tr_mod._upsample_reflect(grid, (H + cell, W + cell))
        masks = torch.empty(200, 1, H, W)
        sx = torch.randint(0, cell, (200,))
        sy = torch.randint(0, cell, (200,))
        for i in range(200):
            masks[i] = up[i, :, sx[i]:sx[i] + H, sy[i]:sy[i] + W]

        with torch.no_grad():
            want = tr_mod.rise(TorchQuad(), xt, num_masks=200, batch_size=64,
                               filter_masks=masks).numpy()[0]

        from scouter_tpu.explain.rise import rise

        got = np.asarray(rise(jax_quad, jnp.asarray(x), num_masks=200,
                              batch_size=64,
                              filter_masks=jnp.asarray(masks.numpy()[:, 0])))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_own_masks_localize(self):
        """Generated-mask path (reflect-pad upsample semantics) localizes the
        class-0 signal to its quadrant."""
        def jax_quad(x):
            m = x.mean(axis=-1)
            outs = [m[:, :16, :16].mean(axis=(1, 2)), m[:, 16:, 16:].mean(axis=(1, 2))]
            return jnp.stack(outs, axis=1) * 10.0

        import jax as _jax

        rng = np.random.RandomState(0)
        x = rng.rand(1, 32, 32, 3).astype(np.float32)
        from scouter_tpu.explain.rise import rise

        # 4000 masks: the argmax-in-quadrant property is statistical, and
        # 2000 leaves it within noise of the quadrant boundary
        sal = np.asarray(rise(jax_quad, jnp.asarray(x), _jax.random.PRNGKey(0),
                              num_masks=4000, batch_size=100))
        r0, c0 = np.unravel_index(sal[0].argmax(), sal[0].shape)
        assert r0 < 16 and c0 < 16
        r1, c1 = np.unravel_index(sal[1].argmax(), sal[1].shape)
        assert r1 >= 16 and c1 >= 16


def test_pointing_game_matches_reference():
    """Hit/miss decisions identical to torchray's PointingGame
    (pointing_game.py:35-127) over random masks/points."""
    import torch

    from test_models import _stub_module, install_reference_stubs

    install_reference_stubs()
    import torchvision

    torchvision.models = _stub_module("torchvision.models")
    from torchray.benchmark.pointing_game import PointingGame as RefPG

    from scouter_tpu.explain.pointing_game import PointingGame

    ref = RefPG(num_classes=3, tolerance=3)
    mine = PointingGame(num_classes=3, tolerance=3)
    rng = np.random.RandomState(0)
    outcomes = []
    for _ in range(300):
        mask = rng.rand(24, 24) > 0.95
        pt = (int(rng.randint(24)), int(rng.randint(24)))
        want = ref.evaluate(torch.from_numpy(mask), pt)
        got = mine.evaluate(mask.astype(np.uint8), pt)
        assert want == got
        outcomes.append(want)
    assert 1 in outcomes and -1 in outcomes  # both branches exercised

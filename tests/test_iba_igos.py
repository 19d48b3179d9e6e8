"""IBA and IGOS tests: statistics parity, optimization behavior, curves."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.explain.iba import FeatureStats, estimate_stats, iba_analyze, _capacity
from scouter_tpu.explain.igos import (
    deletion_insertion_curve,
    gaussian_blur_baseline,
    integrated_mask,
    tv_norm,
)


class TestWelford:
    def test_matches_direct_stats(self):
        rng = np.random.RandomState(0)
        data = rng.randn(64, 4, 4, 8).astype(np.float32) * 2 + 1
        batches = [data[i: i + 16] for i in range(0, 64, 16)]
        stats = estimate_stats(lambda b: b, batches)
        np.testing.assert_allclose(np.asarray(stats.mean), data.mean(0), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(stats.std), data.std(0, ddof=1), rtol=1e-3, atol=1e-4
        )
        assert stats.n_samples == 64
        assert np.all(np.asarray(stats.active) == 1.0)

    def test_active_neurons(self):
        data = np.zeros((32, 2, 2, 2), np.float32)
        data[:, 0, 0, 0] = 1.0  # only one neuron ever fires
        stats = estimate_stats(lambda b: b, [data])
        active = np.asarray(stats.active)
        assert active[0, 0, 0] == 1.0
        assert active.sum() == 1.0

    def test_capacity_formula(self):
        # lam=0 -> mu_z=0, var_z=1 -> capacity 0 (no information)
        x = jnp.ones((2, 2, 2, 2)) * 3.0
        cap0 = _capacity(x, jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x))
        np.testing.assert_allclose(np.asarray(cap0), 0.0, atol=1e-6)
        # lam=1 -> var_z=0 -> infinite capacity (log 0)
        cap1 = _capacity(x, jnp.ones_like(x) * 0.999, jnp.zeros_like(x), jnp.ones_like(x))
        assert np.all(np.asarray(cap1) > 0)


class TestIBA:
    def test_saliency_highlights_informative_region(self):
        # "model": loss is low when the top-left 2x2 block of features is
        # preserved; IBA should assign capacity there.
        def feature_fn(x):
            return x  # features are the input itself (1, 4, 4, 2)

        def readout_loss(z):
            return jnp.mean((z[:, :2, :2] - 5.0) ** 2)

        rng = np.random.RandomState(1)
        batches = [rng.randn(16, 4, 4, 2).astype(np.float32) for _ in range(4)]
        stats = estimate_stats(feature_fn, batches)
        x = jnp.full((1, 4, 4, 2), 5.0)
        sal = iba_analyze(
            feature_fn, readout_loss, x, stats, jax.random.PRNGKey(0),
            optimization_steps=30, beta=1.0,
        )
        s = np.asarray(sal)
        assert s.shape == (4, 4)
        assert s[:2, :2].mean() > s[2:, 2:].mean()

    def test_output_resize(self):
        def feature_fn(x):
            return x

        def readout_loss(z):
            return jnp.mean(z**2)

        stats = estimate_stats(feature_fn, [np.random.RandomState(0).randn(8, 4, 4, 2).astype(np.float32)])
        sal = iba_analyze(
            feature_fn, readout_loss, jnp.ones((1, 4, 4, 2)), stats,
            jax.random.PRNGKey(0), optimization_steps=2, out_shape=(16, 16),
        )
        assert sal.shape == (16, 16)


class TestIGOS:
    def test_blur_baseline(self):
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
        b = gaussian_blur_baseline(x)
        assert b.shape == x.shape
        assert float(jnp.var(b)) < float(jnp.var(x))  # blur reduces variance

    def test_tv_norm(self):
        flat = jnp.ones((8, 8))
        assert float(tv_norm(flat)) == 0.0
        checker = jnp.asarray(np.indices((8, 8)).sum(0) % 2, jnp.float32)
        assert float(tv_norm(checker)) > 0.5

    def test_mask_optimization_focuses(self):
        # class-0 prob driven by a bright corner; mask should drop there
        def forward(imgs):
            c = imgs[:, 2:10, 2:10].mean(axis=(1, 2, 3))
            return jnp.stack([6 * c - 3, -6 * c + 3], axis=1)

        x = jnp.ones((1, 32, 32, 3)) * 0.1
        x = x.at[:, 2:10, 2:10].set(1.0)
        blurred = jnp.zeros_like(x)
        res = integrated_mask(
            forward, x, blurred, 0, jax.random.PRNGKey(0),
            max_iterations=8, integ_iter=5, size_init=16, noise_std=0.05,
        )
        m = np.asarray(res.mask)
        assert m.shape == (16, 16)
        inside = m[1:5, 1:5].mean()
        outside = m[8:, 8:].mean()
        assert inside < outside  # 0 = important (deleted region)
        assert res.curve_score.shape == (8,)

    def test_deletion_insertion(self):
        def forward(imgs):
            c = imgs.mean(axis=(1, 2, 3))
            return jnp.stack([c, -c], axis=1)

        x = jnp.ones((1, 16, 16, 3))
        blurred = jnp.zeros_like(x)
        mask = jnp.asarray(np.random.RandomState(0).rand(8, 8).astype(np.float32))
        dels, ins = deletion_insertion_curve(forward, x, blurred, mask, 0, num_points=5)
        assert dels.shape == (5,) and ins.shape == (5,)
        # deleting everything drives class prob to the blurred baseline score
        assert float(dels[-1]) == pytest.approx(float(jax.nn.softmax(forward(blurred))[0, 0]), abs=1e-5)


class TestIbaReferenceParity:
    """Deterministic IBA internals vs the vendored reference
    (torchcam/IBA/pytorch.py): Welford estimator, KL capacity, gaussian
    smoothing kernel."""

    @staticmethod
    def _ref_mod():
        from test_models import install_reference_stubs

        install_reference_stubs()
        from torchcam.IBA import pytorch as ref_iba
        return ref_iba

    def test_welford_estimator(self):
        import torch

        ref_iba = self._ref_mod()
        rng = np.random.RandomState(0)
        batches = [rng.randn(4, 3, 5, 5).astype(np.float32) for _ in range(5)]
        batches[0][:, 1] = 0.0  # force an inactive neuron plane

        est = ref_iba.TorchWelfordEstimator()
        for b in batches:
            est(torch.from_numpy(b))

        from scouter_tpu.explain.iba import estimate_stats

        stats = estimate_stats(lambda b: b, batches)
        assert stats.n_samples == est.n_samples()
        np.testing.assert_allclose(np.asarray(stats.mean), est.mean().numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(stats.std), est.std().numpy(),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(stats.active), est.active_neurons().numpy().astype(np.float32))

    def test_kl_capacity(self):
        import torch

        ref_iba = self._ref_mod()
        rng = np.random.RandomState(1)
        x = rng.randn(2, 3, 4, 4).astype(np.float32)
        lam = rng.uniform(0.01, 0.99, x.shape).astype(np.float32)
        mean = rng.randn(3, 4, 4).astype(np.float32)
        std = rng.uniform(0.5, 2.0, (3, 4, 4)).astype(np.float32)

        want = ref_iba.IBA._kl_div(torch.from_numpy(x), torch.from_numpy(lam),
                                   torch.from_numpy(mean), torch.from_numpy(std)).numpy()

        from scouter_tpu.explain.iba import _capacity

        got = np.asarray(_capacity(jnp.asarray(x), jnp.asarray(lam),
                                   jnp.asarray(mean), jnp.asarray(std)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_gaussian_smooth(self):
        import torch

        ref_iba = self._ref_mod()
        sigma = 1.5
        ks = int(round(2 * sigma)) * 2 + 1
        rng = np.random.RandomState(2)
        x = rng.randn(1, 3, 8, 8).astype(np.float32)
        smooth = ref_iba._SpatialGaussianKernel(ks, sigma, 3)
        with torch.no_grad():
            want = smooth(torch.from_numpy(x)).numpy()

        from scouter_tpu.explain.iba import _gaussian_smooth

        got = np.asarray(_gaussian_smooth(
            jnp.asarray(x.transpose(0, 2, 3, 1)), sigma)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestIgosVideoExport:
    def test_write_video_gif(self, tmp_path):
        from PIL import Image

        from scouter_tpu.explain.igos import write_video

        for i in range(3):
            Image.fromarray(
                np.full((8, 8, 3), i * 40, np.uint8)).save(tmp_path / f"video{i+1}.jpg")
        out = write_video(str(tmp_path), str(tmp_path / "mask_evolution.avi"),
                          img_num=3, fps=5)
        assert out.endswith(".gif")
        with Image.open(out) as im:
            assert im.n_frames == 3


class TestAlignCornersResize:
    def test_matches_torch_upsampling_bilinear2d(self):
        """The reference's mask upsampler is nn.UpsamplingBilinear2d —
        align_corners=True (IGOS.py:274-276); jax.image.resize (half-pixel)
        differs by up to ~0.3 on a 112->224 map, so IGOS uses its own
        align-corners resize."""
        import torch

        from scouter_tpu.explain.igos import _resize_bilinear_align_corners

        m = np.random.RandomState(0).rand(112, 112).astype(np.float32)
        for oh, ow in ((224, 224), (260, 197), (64, 64)):
            want = torch.nn.UpsamplingBilinear2d(size=(oh, ow))(
                torch.from_numpy(m)[None, None]).numpy()[0, 0]
            got = np.asarray(_resize_bilinear_align_corners(
                jnp.asarray(m), oh, ow))
            np.testing.assert_allclose(got, want, atol=5e-5)

"""Tests for batch-level augmentations (mixup, random erasing)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.data.extra_augment import mixup, one_hot_smooth, random_erasing


def test_one_hot_smooth():
    y = one_hot_smooth(jnp.asarray([1]), 4, smoothing=0.1)
    np.testing.assert_allclose(float(y.sum()), 1.0, rtol=1e-6)
    assert float(y[0, 1]) > float(y[0, 0])
    np.testing.assert_allclose(float(y[0, 0]), 0.025, rtol=1e-5)


def test_mixup_blends_and_targets_sum_to_one():
    images = jnp.stack([jnp.zeros((4, 4, 1)), jnp.ones((4, 4, 1))])
    labels = jnp.asarray([0, 1])
    mixed, targets = mixup(images, labels, 2, jax.random.PRNGKey(0), smoothing=0.0)
    lam = float(mixed[0].mean())  # first image = lam*0 + (1-lam)*1
    np.testing.assert_allclose(float(targets[0, 1]), lam, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(targets.sum(1)), 1.0, rtol=1e-5)


def test_random_erasing_erases_some_pixels():
    images = jnp.zeros((8, 16, 16, 3))
    out = random_erasing(images, jax.random.PRNGKey(1), probability=1.0)
    changed = np.asarray((out != images).any(axis=(1, 2, 3)))
    assert changed.all()
    out2 = random_erasing(images, jax.random.PRNGKey(1), probability=0.0)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(images))


class TestTfPreprocessing:
    """timm tf_preprocessing behavioral contract (tf_preprocessing.py:86-226)."""

    def _img(self, h=100, w=150):
        from PIL import Image

        rng = np.random.RandomState(0)
        return Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))

    def test_eval_center_crop_padding(self):
        from scouter_tpu.data.tf_pre import CROP_PADDING, TfPreprocessTransform, center_crop_box

        t = TfPreprocessTransform(is_training=False, size=224)
        out = t(self._img(300, 400))
        # reference rounds/clips/casts to uint8 (tf_preprocessing.py:223-225)
        assert out.shape == (224, 224, 3) and out.dtype == np.uint8
        # crop size formula: size/(size+32) * min(h,w)
        top, left, ch, cw = center_crop_box(300, 400, 224)
        assert ch == cw == int(224 / (224 + CROP_PADDING) * 300)
        assert top == ((300 - ch) + 1) // 2 and left == ((400 - cw) + 1) // 2

    def test_train_crop_within_constraints(self):
        from scouter_tpu.data.tf_pre import random_crop_box

        rng = np.random.RandomState(3)
        for _ in range(200):
            box = random_crop_box(200, 300, rng)
            if box is None:  # whole-image or exhausted attempts -> center crop
                continue
            top, left, ch, cw = box
            assert 0 <= top and top + ch <= 200
            assert 0 <= left and left + cw <= 300
            area_frac = (ch * cw) / (200 * 300)
            # min_object_covered=0.1 against the whole-image bbox floors the
            # crop at 10% of image area (tighter than area_range's 0.08)
            assert 0.099 <= area_frac <= 1.001
            assert 0.70 <= cw / ch <= 1.40  # aspect range with int rounding

    def test_train_crop_height_is_uniform_not_area(self):
        """The TF kernel samples crop HEIGHT uniformly between the bounds the
        area range implies — uniform-area sampling would pile mass on large
        heights (h = sqrt(area) transforms uniform area into a density
        proportional to h)."""
        from scouter_tpu.data.tf_pre import random_crop_box

        rng = np.random.RandomState(11)
        heights = []
        for _ in range(4000):
            box = random_crop_box(400, 400, rng,
                                  aspect_ratio_range=(1.0, 1.0))
            if box is not None:
                heights.append(box[2])
        heights = np.asarray(heights)
        # with aspect=1 and min_object_covered=0.1: h in [127, 400] uniform
        # (minus the 10%-area rejection below h=127 and the whole-image
        # fallback at 400). A uniform-area sampler would put ~2/3 of the
        # mass above the midpoint; uniform height puts ~1/2.
        mid = (heights.min() + heights.max()) / 2
        frac_hi = (heights > mid).mean()
        assert 0.42 <= frac_hi <= 0.58, frac_hi

    def test_chw_layout_option(self):
        from scouter_tpu.data.tf_pre import TfPreprocessTransform

        t = TfPreprocessTransform(is_training=False, size=32, chw=True)
        out = t(self._img(64, 64))
        assert out.shape == (3, 32, 32) and out.dtype == np.uint8

    def test_train_is_stochastic_and_shaped(self):
        from scouter_tpu.data.tf_pre import TfPreprocessTransform

        t = TfPreprocessTransform(is_training=True, size=64, seed=1)
        a, b = t(self._img()), t(self._img())
        assert a.shape == b.shape == (64, 64, 3)
        assert not np.array_equal(a, b)

    def test_bytes_input(self):
        import io

        from scouter_tpu.data.tf_pre import TfPreprocessTransform

        buf = io.BytesIO()
        self._img().save(buf, format="PNG")
        out = TfPreprocessTransform(is_training=False, size=32)(buf.getvalue())
        assert out.shape == (32, 32, 3)

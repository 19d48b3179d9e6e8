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

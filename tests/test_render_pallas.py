"""Fused heatmap-render kernel: parity vs jnp reference + jet sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from scouter_tpu.ops.render_pallas import (
    jet_rgba,
    render_heatmaps_fused,
    render_heatmaps_ref,
)


def test_fused_matches_ref():
    attn = jax.random.uniform(jax.random.PRNGKey(0), (10, 81)) * 3.0
    fused = render_heatmaps_fused(attn, interpret=True)
    ref = render_heatmaps_ref(attn)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-4)
    assert fused.shape == (10, 81, 4)


def test_jet_endpoints():
    rgba = np.asarray(jet_rgba(jnp.asarray([0.0, 0.5, 1.0])))
    # v=0 -> blue, v=0.5 -> green-ish, v=1 -> red
    assert rgba[0, 2] > 0.4 and rgba[0, 0] == 0.0
    assert rgba[1, 1] == 1.0
    assert rgba[2, 0] > 0.4 and rgba[2, 2] == 0.0
    np.testing.assert_allclose(rgba[:, 3], 0.4)


def test_scaling_per_class():
    attn = jnp.stack([jnp.linspace(5.0, 6.0, 81), jnp.linspace(-2.0, 0.0, 81)])
    out = np.asarray(render_heatmaps_fused(attn, interpret=True))
    # both classes span the full colormap despite different ranges
    for c in range(2):
        assert out[c, 0, 2] * 0.99 <= out[c, 0, 2]  # blue end present
        assert out[c, -1, 0] > 100  # red end present

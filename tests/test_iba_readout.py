"""Readout-IBA tests: training reduces the objective; analysis localizes."""

import numpy as np
import jax
import jax.numpy as jnp

from scouter_tpu.explain.iba import estimate_stats
from scouter_tpu.explain.iba_readout import (
    ReadoutNet,
    readout_analyze,
    readout_inputs,
    train_readout,
)


def test_readout_end_to_end():
    rng = np.random.RandomState(0)

    # toy setup: features are the images themselves (B, 4, 4, 4); a "model"
    # whose loss is low when the informative top-left block survives
    def feature_fn(x):
        return x

    def readout_feature_fn(x):
        return [x, x[:, ::2, ::2, :]]  # two "layers" at different resolutions

    data = [rng.randn(8, 4, 4, 4).astype(np.float32) for _ in range(4)]
    b_stats = estimate_stats(feature_fn, data)
    r_stats = [estimate_stats(lambda b: b, data),
               estimate_stats(lambda b: b[:, ::2, ::2, :], data)]

    def model_loss_fn(z, aux):
        return jnp.mean((z[:, :2, :2] - 3.0) ** 2)

    def batches():
        for d in data:
            yield jnp.asarray(d), None

    readout = ReadoutNet(out_channels=4)
    sample_inputs = readout_inputs(
        [jnp.asarray(data[0]), jnp.asarray(data[0][:, ::2, ::2, :])], r_stats, (4, 4)
    )
    assert sample_inputs.shape == (8, 4, 4, 8)
    params = readout.init(jax.random.PRNGKey(0), sample_inputs)

    params, losses = train_readout(
        params, readout, batches, feature_fn, readout_feature_fn, r_stats,
        b_stats, model_loss_fn, jax.random.PRNGKey(1), steps=150, beta=1.0, lr=3e-2,
    )
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    x = jnp.asarray(np.full((1, 4, 4, 4), 3.0, np.float32))
    sal = readout_analyze(params, readout, x, feature_fn, readout_feature_fn,
                          r_stats, b_stats)
    assert sal.shape == (4, 4)
    assert np.all(np.isfinite(np.asarray(sal)))

    sal_up = readout_analyze(params, readout, x, feature_fn, readout_feature_fn,
                             r_stats, b_stats, out_shape=(8, 8))
    assert sal_up.shape == (8, 8)

"""Fused Pallas xSlot kernel: parity vs the jnp reference path + gradient check."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.ops import XSlotConfig, init_xslot_params, xslot_attention
from scouter_tpu.ops.slot_pallas import xslot_iterations_fused, xslot_iterations_ref


def make_inputs(seed, b=4, n=81, s=30, d=64):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    k = jax.random.normal(ks[0], (b, n, d))
    v = jax.random.normal(ks[1], (b, n, d))
    slots = jax.random.normal(ks[2], (s, d))
    w_ih = jax.random.normal(ks[3], (3 * d, d)) * 0.2
    w_hh = jax.random.normal(ks[4], (3 * d, d)) * 0.2
    b_ih = jax.random.normal(ks[5], (1, 3 * d)) * 0.1
    b_hh = jax.random.normal(ks[6], (1, 3 * d)) * 0.1
    return k, v, slots, w_ih, w_hh, b_ih, b_hh


@pytest.mark.parametrize("s", [10, 30, 125])
def test_fused_matches_ref(s):
    args = make_inputs(0, s=s)
    upd_f, attn_f = xslot_iterations_fused(*args, 3, True)  # interpret on CPU
    upd_r, attn_r = xslot_iterations_ref(*args, iters=3)
    np.testing.assert_allclose(np.asarray(upd_f), np.asarray(upd_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn_f), np.asarray(attn_r), rtol=1e-4, atol=1e-5)


def test_fused_gradients_match_ref():
    args = make_inputs(1, b=2, s=10)

    def loss_fused(*a):
        upd, attn = xslot_iterations_fused(*a, 3, True)
        return jnp.sum(upd**2) + jnp.sum(attn)

    def loss_ref(*a):
        upd, attn = xslot_iterations_ref(*a, iters=3)
        return jnp.sum(upd**2) + jnp.sum(attn)

    g_f = jax.grad(loss_fused, argnums=(0, 2, 3))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 2, 3))(*args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_full_xslot_attention_fused_path():
    cfg = XSlotConfig(num_classes=10, slots_per_class=2, dim=64, power=2, loss_status=-1)
    params = init_xslot_params(jax.random.PRNGKey(0), cfg)
    x_pe = jax.random.normal(jax.random.PRNGKey(1), (3, 81, 64))
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 81, 64))

    ref = xslot_attention(params, cfg, x_pe, x)
    fused = xslot_attention(params, cfg, x_pe, x, fused=True, interpret=True)
    for a, b in zip(fused, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

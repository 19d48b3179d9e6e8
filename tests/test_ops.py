"""Oracle parity tests for the core numeric contracts (ops/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from scouter_tpu.ops import (
    XSlotConfig,
    gru_cell,
    init_gru_params,
    init_xslot_params,
    log_softmax_nll,
    scouter_loss,
    sine_position_embedding,
    xslot_attention,
)

from oracle import gru_cell_torch, sine_position_embedding_torch, xslot_forward_torch


def t2n(t):
    return t.detach().numpy()


class TestSinePositionEmbedding:
    @pytest.mark.parametrize("h,w,dim", [(9, 9, 64), (8, 8, 64), (9, 9, 128), (5, 7, 32)])
    def test_matches_torch_reference(self, h, w, dim):
        ours = np.asarray(sine_position_embedding(h, w, dim))  # (h, w, dim)
        ref = t2n(sine_position_embedding_torch(h, w, dim))  # (dim, h, w)
        np.testing.assert_allclose(ours, ref.transpose(1, 2, 0), rtol=1e-4, atol=5e-5)

    def test_constant_under_jit(self):
        # It should fold to a constant: calling it inside jit with static shapes works.
        f = jax.jit(lambda: sine_position_embedding(9, 9, 64))
        out = f()
        assert out.shape == (9, 9, 64)


class TestGRUCell:
    def test_matches_torch_gru(self):
        torch.manual_seed(0)
        d, b = 64, 12
        gru = torch.nn.GRU(d, d)
        x = torch.randn(b, d)
        h = torch.randn(b, d)
        with torch.no_grad():
            out, _ = gru(x[None], h[None].contiguous())
        params = {
            "w_ih": jnp.asarray(t2n(gru.weight_ih_l0)),
            "w_hh": jnp.asarray(t2n(gru.weight_hh_l0)),
            "b_ih": jnp.asarray(t2n(gru.bias_ih_l0)),
            "b_hh": jnp.asarray(t2n(gru.bias_hh_l0)),
        }
        ours = gru_cell(params, jnp.asarray(t2n(x)), jnp.asarray(t2n(h)))
        np.testing.assert_allclose(np.asarray(ours), t2n(out[0]), rtol=1e-5, atol=1e-5)

    def test_oracle_formula_matches_torch_module(self):
        # Sanity-check the hand-written oracle itself against nn.GRU.
        torch.manual_seed(1)
        d = 32
        gru = torch.nn.GRU(d, d)
        x, h = torch.randn(5, d), torch.randn(5, d)
        with torch.no_grad():
            ref, _ = gru(x[None], h[None].contiguous())
            mine = gru_cell_torch(x, h, gru.weight_ih_l0, gru.weight_hh_l0, gru.bias_ih_l0, gru.bias_hh_l0)
        np.testing.assert_allclose(t2n(mine), t2n(ref[0]), rtol=1e-5, atol=1e-6)


def make_xslot_pair(seed, cfg: XSlotConfig, b=4, n=81):
    """Random torch params + inputs, mirrored into the jax param pytree."""
    torch.manual_seed(seed)
    d = cfg.dim
    inputs_pe = torch.randn(b, n, d)
    inputs_x = torch.randn(b, n, d)
    initial_slots = torch.randn(1, cfg.num_slots, d)
    to_k = [(torch.randn(d, d) * 0.2, torch.randn(d) * 0.1) for _ in range(cfg.to_k_layer)]
    w_ih, w_hh = torch.randn(3 * d, d) * 0.2, torch.randn(3 * d, d) * 0.2
    b_ih, b_hh = torch.randn(3 * d) * 0.1, torch.randn(3 * d) * 0.1

    jparams = {
        "initial_slots": jnp.asarray(t2n(initial_slots)),
        "to_k": [{"weight": jnp.asarray(t2n(w)), "bias": jnp.asarray(t2n(bb))} for w, bb in to_k],
        "gru": {
            "w_ih": jnp.asarray(t2n(w_ih)),
            "w_hh": jnp.asarray(t2n(w_hh)),
            "b_ih": jnp.asarray(t2n(b_ih)),
            "b_hh": jnp.asarray(t2n(b_hh)),
        },
    }
    tparams = dict(
        initial_slots=initial_slots, to_k_layers=to_k,
        gru_w_ih=w_ih, gru_w_hh=w_hh, gru_b_ih=b_ih, gru_b_hh=b_hh,
    )
    return inputs_pe, inputs_x, tparams, jparams


class TestXSlotAttention:
    @pytest.mark.parametrize(
        "num_classes,spc,power,loss_status,to_k_layer",
        [
            (10, 1, 1, 1, 1),     # MNIST positive recipe (README.md:91-97)
            (10, 2, 2, -1, 1),    # MNIST negative recipe (README.md:99-105)
            (5, 3, 2, 1, 3),      # ConText-style (README.md:130-156)
        ],
    )
    def test_matches_torch_reference(self, num_classes, spc, power, loss_status, to_k_layer):
        cfg = XSlotConfig(
            num_classes=num_classes, slots_per_class=spc, dim=64,
            loss_status=loss_status, power=power, to_k_layer=to_k_layer,
        )
        inputs_pe, inputs_x, tp, jp = make_xslot_pair(42, cfg)
        with torch.no_grad():
            ref_logits, ref_area, ref_attn = xslot_forward_torch(
                inputs_pe, inputs_x, **tp,
                num_classes=num_classes, slots_per_class=spc,
                loss_status=loss_status, power=power,
            )
        logits, area, attn = xslot_attention(
            jp, cfg, jnp.asarray(t2n(inputs_pe)), jnp.asarray(t2n(inputs_x))
        )
        np.testing.assert_allclose(np.asarray(logits), t2n(ref_logits), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(area), float(ref_area), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(attn), t2n(ref_attn), rtol=1e-4, atol=1e-5)

    def test_jit_and_grad(self):
        cfg = XSlotConfig(num_classes=10, slots_per_class=2, dim=64, power=2)
        key = jax.random.PRNGKey(0)
        params = init_xslot_params(key, cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 81, 64))

        def loss_fn(p):
            logits, area, _ = xslot_attention(p, cfg, x, x)
            return jnp.sum(logits**2) + area

        g = jax.jit(jax.grad(loss_fn))(params)
        flat, _ = jax.tree_util.tree_flatten(g)
        assert all(np.all(np.isfinite(np.asarray(a))) for a in flat)

    def test_init_shapes(self):
        cfg = XSlotConfig(num_classes=7, slots_per_class=3, dim=64, to_k_layer=2)
        p = init_xslot_params(jax.random.PRNGKey(0), cfg)
        assert p["initial_slots"].shape == (1, 21, 64)
        assert len(p["to_k"]) == 2
        assert p["gru"]["w_ih"].shape == (192, 64)


class TestLosses:
    def test_nll_matches_torch(self):
        torch.manual_seed(3)
        logits = torch.randn(8, 10)
        labels = torch.randint(0, 10, (8,))
        ref = torch.nn.functional.nll_loss(
            torch.nn.functional.log_softmax(logits, dim=1), labels
        )
        _, nll = log_softmax_nll(jnp.asarray(t2n(logits)), jnp.asarray(labels.numpy()))
        np.testing.assert_allclose(float(nll), float(ref), rtol=1e-5)

    def test_scouter_loss_composition(self):
        logits = jnp.ones((4, 3))
        labels = jnp.array([0, 1, 2, 0])
        area = jnp.asarray(0.5)
        _, d = scouter_loss(logits, labels, area, lambda_value=2.0)
        np.testing.assert_allclose(float(d["loss"]), float(d["log_loss"]) + 1.0, rtol=1e-6)

"""Torch oracle for parity tests.

Re-derives the reference's numeric contracts (cited file:line into
wbw520/scouter) in plain torch so the JAX implementations can be checked against
the exact formulas the PyTorch model computes. This is test-only code; the
framework itself never imports torch.
"""

import math

import torch


def sine_position_embedding_torch(h, w, hidden_dim, temperature=10000.0, eps=1e-6):
    """PositionEmbeddingSine(normalize=True) — sloter/utils/position_encode.py:26-46.

    Returns channel-first (hidden_dim, h, w) like the reference.
    """
    num_pos_feats = hidden_dim // 2
    scale = 2 * math.pi
    ones = torch.ones((1, h, w), dtype=torch.float32)
    y_embed = ones.cumsum(1)
    x_embed = ones.cumsum(2)
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos = torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)
    return pos[0]


def gru_cell_torch(x, h, w_ih, w_hh, b_ih, b_hh):
    """torch nn.GRU single step via the documented gate equations."""
    gi = x @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    i_r, i_z, i_n = gi.chunk(3, -1)
    h_r, h_z, h_n = gh.chunk(3, -1)
    r = torch.sigmoid(i_r + h_r)
    z = torch.sigmoid(i_z + h_z)
    n = torch.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


def xslot_forward_torch(
    inputs_pe,
    inputs_x,
    initial_slots,
    to_k_layers,
    gru_w_ih,
    gru_w_hh,
    gru_b_ih,
    gru_b_hh,
    *,
    num_classes,
    slots_per_class,
    iters=3,
    loss_status=1,
    power=1,
):
    """xSlot forward — sloter/utils/slot_attention.py:44-96 semantics.

    to_k_layers: list of (weight, bias) with ReLU between layers (:30-37).
    Returns (class_scores, area_loss, final_attn).
    """
    b, n, d = inputs_pe.shape
    scale = d ** -0.5
    k = inputs_pe
    for i, (w, bias) in enumerate(to_k_layers):
        if i > 0:
            k = torch.relu(k)
        k = k @ w.T + bias

    slots = initial_slots.expand(b, -1, -1)
    for _ in range(iters):
        q = slots  # to_q bypassed (:52-53)
        dots = torch.einsum("bid,bjd->bij", q, k) * scale
        dots = dots / dots.sum(2, keepdim=True) * dots.sum(2).sum(1)[:, None, None]  # :56
        attn = torch.sigmoid(dots)
        updates = torch.einsum("bjd,bij->bid", inputs_x, attn) / d  # :58-59
        slots = gru_cell_torch(
            updates.reshape(-1, d), slots.reshape(-1, d), gru_w_ih, gru_w_hh, gru_b_ih, gru_b_hh
        ).reshape(b, -1, d)

    if slots_per_class > 1:  # per-class sum-pool of updates (:87-91)
        updates = updates.reshape(b, num_classes, slots_per_class, d).sum(2)

    area = torch.relu(attn).sum() / (attn.size(0) * attn.size(1) * attn.size(2))
    area = area ** power
    return loss_status * updates.sum(-1), area, attn

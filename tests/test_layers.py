"""Numeric parity of core layers against torch (used as an oracle only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from vptr_tpu.models.layers import (
    LayerNormHWC,
    MlpDWBN,
    MultiHeadAttention,
    TemporalAttention,
    WindowAttention,
    relative_position_index,
)

RNG = np.random.default_rng(42)


def _np(x):
    return np.asarray(x)


def test_mha_matches_torch():
    """Our separate-projection MHA == torch nn.MultiheadAttention with the
    same weights (the reference uses torch MHA for temporal/abs-window paths
    and an equivalent custom split-projection MHA for RPE)."""
    dim, heads, L, B = 24, 4, 10, 3
    tmha = nn.MultiheadAttention(dim, heads, dropout=0.0)
    q = RNG.normal(size=(L, B, dim)).astype(np.float32)
    k = RNG.normal(size=(L, B, dim)).astype(np.float32)
    v = RNG.normal(size=(L, B, dim)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tmha(torch.tensor(q), torch.tensor(k), torch.tensor(v))
    ref = ref.numpy()

    mod = MultiHeadAttention(dim, heads)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((B, L, dim)),
                      jnp.zeros((B, L, dim)), jnp.zeros((B, L, dim)))
    w_in = tmha.in_proj_weight.detach().numpy()     # (3C, C)
    b_in = tmha.in_proj_bias.detach().numpy()
    w_out = tmha.out_proj.weight.detach().numpy()
    b_out = tmha.out_proj.bias.detach().numpy()
    p = {
        "q_proj": {"kernel": w_in[:dim].T, "bias": b_in[:dim]},
        "k_proj": {"kernel": w_in[dim:2 * dim].T, "bias": b_in[dim:2 * dim]},
        "v_proj": {"kernel": w_in[2 * dim:].T, "bias": b_in[2 * dim:]},
        "out_proj": {"kernel": w_out.T, "bias": b_out},
    }
    p = jax.tree.map(jnp.asarray, p)
    out = mod.apply({"params": p},
                    jnp.asarray(q.transpose(1, 0, 2)),
                    jnp.asarray(k.transpose(1, 0, 2)),
                    jnp.asarray(v.transpose(1, 0, 2)))
    np.testing.assert_allclose(_np(out), ref.transpose(1, 0, 2),
                               atol=2e-5, rtol=2e-5)


def test_mha_causal_mask():
    """Masked positions get zero attention: output at position i must not
    change when future inputs change."""
    dim, heads, L, B = 16, 2, 6, 2
    mod = TemporalAttention(dim, heads, causal=True)
    x = RNG.normal(size=(B, L, 2, 2, dim)).astype(np.float32)
    pos = np.zeros((L, dim), np.float32)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(pos))
    out1 = mod.apply(params, jnp.asarray(x), jnp.asarray(pos))
    x2 = x.copy()
    x2[:, 3:] += 10.0  # perturb frames 3..L
    out2 = mod.apply(params, jnp.asarray(x2), jnp.asarray(pos))
    np.testing.assert_allclose(_np(out1)[:, :3], _np(out2)[:, :3],
                               atol=1e-5, rtol=1e-5)
    assert np.abs(_np(out1)[:, 3:] - _np(out2)[:, 3:]).max() > 1e-3


def test_window_attention_locality():
    """Tokens only attend within their own 4x4 window: perturbing one window
    leaves all other windows' outputs unchanged."""
    dim, heads = 16, 4
    mod = WindowAttention(dim, heads, window=4)
    x = RNG.normal(size=(1, 1, 8, 8, dim)).astype(np.float32)
    pos = RNG.normal(size=(4, 4, dim)).astype(np.float32)
    params = mod.init(jax.random.PRNGKey(2), jnp.asarray(x), jnp.asarray(pos))
    out1 = _np(mod.apply(params, jnp.asarray(x), jnp.asarray(pos)))
    x2 = x.copy()
    x2[0, 0, 0, 0] += 5.0  # inside top-left window
    out2 = _np(mod.apply(params, jnp.asarray(x2), jnp.asarray(pos)))
    np.testing.assert_allclose(out1[0, 0, :4, 4:], out2[0, 0, :4, 4:],
                               atol=1e-6)
    np.testing.assert_allclose(out1[0, 0, 4:, :], out2[0, 0, 4:, :],
                               atol=1e-6)
    assert np.abs(out1[0, 0, :4, :4] - out2[0, 0, :4, :4]).max() > 1e-4


def test_rpe_index_matches_swin_construction():
    """Independent check of the relative index table: entry (i, j) encodes
    (dy+w-1)*(2w-1) + (dx+w-1) between token i and token j."""
    w = 4
    idx = relative_position_index(w)
    for i in [0, 5, 15]:
        for j in [0, 7, 10]:
            yi, xi = divmod(i, w)
            yj, xj = divmod(j, w)
            expect = (yi - yj + w - 1) * (2 * w - 1) + (xi - xj + w - 1)
            assert idx[i, j] == expect


def test_rpe_bias_shifts_logits():
    """RPE mode must produce different outputs than abs mode with zero pos;
    and bias gather must be differentiable w.r.t. the table."""
    dim, heads = 8, 2
    x = jnp.asarray(RNG.normal(size=(1, 1, 4, 4, dim)).astype(np.float32))
    pos = jnp.zeros((4, 4, dim), jnp.float32)
    mod = WindowAttention(dim, heads, window=4, rpe=True)
    params = mod.init(jax.random.PRNGKey(3), x, pos)
    assert "rpe_table" in params["params"]

    def loss(p):
        return jnp.sum(mod.apply(p, x, pos) ** 2)

    g = jax.grad(loss)(params)
    assert np.abs(_np(g["params"]["rpe_table"])).max() > 0


def test_layernorm_hwc_matches_torch():
    """LayerNormHWC == torch nn.LayerNorm((C, H, W)) on NCHW
    (reference: VidHRFormer_modules.py:398)."""
    c, h, w, b = 6, 4, 5, 3
    tln = nn.LayerNorm((c, h, w))
    with torch.no_grad():
        tln.weight.copy_(torch.rand(c, h, w))
        tln.bias.copy_(torch.rand(c, h, w))
    x = RNG.normal(size=(b, c, h, w)).astype(np.float32)
    with torch.no_grad():
        ref = tln(torch.tensor(x)).numpy()  # (b, c, h, w)

    mod = LayerNormHWC()
    # ours is (b, h, w, c); affine params shaped (h, w, c)
    scale = tln.weight.detach().numpy().transpose(1, 2, 0)
    bias = tln.bias.detach().numpy().transpose(1, 2, 0)
    out = mod.apply({"params": {"scale": jnp.asarray(scale),
                                "bias": jnp.asarray(bias)}},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(_np(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("norm", ["layer", "batch"])
def test_mlpdwbn_shapes(norm):
    mod = MlpDWBN(dim=12, hidden_dim=24, norm=norm)
    x = jnp.asarray(RNG.normal(size=(2, 3, 8, 8, 12)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(4), x, train=(norm == "batch"))
    if norm == "batch":
        out, _ = mod.apply(variables, x, train=True,
                           mutable=["batch_stats"])
    else:
        out = mod.apply(variables, x)
    assert out.shape == x.shape


def test_fused_full_blocks_override_hook():
    """The sweep's bigtile variant relies on the module-level override —
    a class-attribute assignment is a silent no-op on a flax dataclass
    (defaults bind at class creation), which once invalidated a recorded
    measurement. Pin the working mechanism."""
    from vptr_tpu.models import layers

    mha = layers.MultiHeadAttention(8, 2)
    assert mha._ff_blocks() == (32, 16)
    # the broken route: class attr changes nothing on instances
    layers.MultiHeadAttention.fused_full_blocks = (64, 32)
    try:
        assert layers.MultiHeadAttention(8, 2).fused_full_blocks == (32, 16)
    finally:
        layers.MultiHeadAttention.fused_full_blocks = (32, 16)
    # the working route
    layers.FUSED_FULL_BLOCKS_OVERRIDE = (64, 32)
    try:
        assert mha._ff_blocks() == (64, 32)
    finally:
        layers.FUSED_FULL_BLOCKS_OVERRIDE = None
    assert mha._ff_blocks() == (32, 16)


def test_fused_full_blocks_config_field_reaches_kernel():
    """transformer.fused_full_blocks (the r4 config route to the bigtile
    tiles) must plumb through the block tree to MultiHeadAttention AND
    produce output identical to the default tiling — tile shape is a
    schedule choice, never a numerics choice."""
    from vptr_tpu.config import get_preset
    from vptr_tpu.models.transformer import build_transformer

    base = get_preset("far_mnist").override({"transformer": {
        "d_model": 32, "n_heads": 2, "num_encoder_layers": 1,
        "dropout": 0.0, "drop_path": 0.0,
        "fused_attention": True, "fused_full": True}})
    big = base.override({"transformer": {"fused_full_blocks": (8, 8)}})
    feats = jnp.asarray(
        RNG.normal(size=(1, 3, 8, 8, 32)).astype(np.float32))
    m0 = build_transformer(base.transformer)
    m1 = build_transformer(big.transformer)
    v = m0.init(jax.random.PRNGKey(0), feats)
    out0 = m0.apply(v, feats)
    out1 = m1.apply(v, feats)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)

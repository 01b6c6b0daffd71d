"""FAR/NAR transformer: shapes, causality, and variant coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vptr_tpu.models.transformer import VPTRFormerFAR, VPTRFormerNAR

RNG = np.random.default_rng(11)

TINY = dict(enc_h=8, enc_w=8, d_model=24, num_heads=4, window=4,
            dropout=0.0, drop_path=0.0, ffn_hidden_ratio=2)


def _feats(n, t, d=24):
    return jnp.asarray(RNG.normal(size=(n, t, 8, 8, d)).astype(np.float32))


def test_far_shapes_and_relu():
    model = VPTRFormerFAR(num_past_frames=4, num_future_frames=4,
                          num_encoder_layers=2, **TINY)
    x = _feats(2, 7)  # Tp+Tf-1 teacher-forcing length
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == x.shape
    assert np.asarray(out).min() >= 0.0


def test_far_is_causal():
    """Output at frame t must not depend on input frames > t — the property
    the reference enforces with its triu mask (VidHRFormer_modules.py:78-82)."""
    model = VPTRFormerFAR(num_past_frames=4, num_future_frames=4,
                          num_encoder_layers=2, **TINY)
    x = _feats(1, 6)
    variables = model.init(jax.random.PRNGKey(0), x)
    out1 = np.asarray(model.apply(variables, x))
    x2 = np.asarray(x).copy()
    # random (not constant) perturbation: LayerNorms absorb constant shifts
    x2[:, 4:] += RNG.normal(size=x2[:, 4:].shape).astype(np.float32)
    out2 = np.asarray(model.apply(variables, jnp.asarray(x2)))
    np.testing.assert_allclose(out1[:, :4], out2[:, :4], atol=1e-4, rtol=1e-4)
    assert np.abs(out1[:, 4:] - out2[:, 4:]).max() > 1e-3


@pytest.mark.parametrize("tslma", [False, True])
def test_nar_shapes(tslma):
    model = VPTRFormerNAR(num_past_frames=4, num_future_frames=5,
                          num_encoder_layers=1, num_decoder_layers=1,
                          tslma=tslma, rpe=True, **TINY)
    x = _feats(2, 4)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    out = model.apply(variables, x,
                      mutable=["batch_stats"] if "batch_stats" in variables
                      else [])
    if isinstance(out, tuple):
        out = out[0]
    assert out.shape == (2, 5, 8, 8, 24)
    assert np.asarray(out).min() >= 0.0


def test_nar_has_frame_queries_and_nce():
    model = VPTRFormerNAR(num_past_frames=2, num_future_frames=3,
                          num_encoder_layers=1, num_decoder_layers=1,
                          rpe=False, **TINY)
    x = _feats(1, 2)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    assert variables["params"]["frame_queries"].shape == (3, 8, 8, 24)

    proj_vars = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 8, 8, 24)),
                           method=model.nce_project)
    proj = model.apply(proj_vars, jnp.ones((1, 3, 8, 8, 24)),
                       method=model.nce_project)
    assert proj.shape == (1, 3, 8, 8, 24)


def test_dropout_rngs_change_output_in_train_mode():
    model = VPTRFormerFAR(num_past_frames=2, num_future_frames=2,
                          num_encoder_layers=1,
                          **{**TINY, "dropout": 0.5, "drop_path": 0.3})
    x = _feats(4, 3)
    variables = model.init(jax.random.PRNGKey(0), x)
    o1 = model.apply(variables, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(variables, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-4
    # deterministic eval is reproducible
    e1 = model.apply(variables, x)
    e2 = model.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


@pytest.mark.slow
def test_remat_matches_unrematted():
    """remat must be numerically invisible (same params, same output)."""
    model_a = VPTRFormerFAR(num_past_frames=3, num_future_frames=3,
                            num_encoder_layers=2, remat=False, **TINY)
    model_b = VPTRFormerFAR(num_past_frames=3, num_future_frames=3,
                            num_encoder_layers=2, remat=True, **TINY)
    x = _feats(2, 5)
    variables = model_a.init(jax.random.PRNGKey(0), x)
    out_a = model_a.apply(variables, x)
    out_b = model_b.apply(variables, x)
    # remat re-associates fusions; float noise at 1e-6 is expected
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-5, rtol=1e-4)
    # and gradients agree
    def loss(m, v):
        return jnp.sum(m.apply(v, x) ** 2)
    ga = jax.grad(lambda v: loss(model_a, v))(variables)
    gb = jax.grad(lambda v: loss(model_b, v))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_fused_attention_matches_in_model():
    """fused_attention must not change FAR outputs (eval mode)."""
    base = dict(num_past_frames=3, num_future_frames=3,
                num_encoder_layers=1, **TINY)
    model_a = VPTRFormerFAR(fused_attention=False, **base)
    model_b = VPTRFormerFAR(fused_attention=True, **base)
    x = _feats(2, 5)
    variables = model_a.init(jax.random.PRNGKey(0), x)
    out_a = model_a.apply(variables, x)
    out_b = model_b.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=2e-5, rtol=2e-5)


def test_scan_layers_far():
    """scan_layers stacks params (L, ...) and must behave like the unrolled
    stack: causal, deterministic in eval, trains (finite grads)."""
    model = VPTRFormerFAR(num_past_frames=3, num_future_frames=3,
                          num_encoder_layers=3, scan_layers=True, **TINY)
    x = _feats(2, 5)
    variables = model.init(jax.random.PRNGKey(0), x)
    stacked = variables["params"]["blocks"]["block"]
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert leaf.shape[0] == 3  # stacked layer axis
    out = model.apply(variables, x)
    assert out.shape == x.shape
    # causality survives the scan
    x2 = np.asarray(x).copy()
    x2[:, 3:] += RNG.normal(size=x2[:, 3:].shape).astype(np.float32)
    out2 = model.apply(variables, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(out)[:, :3],
                               np.asarray(out2)[:, :3], atol=1e-4, rtol=1e-4)
    # gradients flow
    g = jax.grad(lambda v: jnp.sum(model.apply(v, x) ** 2))(variables)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_scan_layers_nar_matches_unrolled():
    """NAR scan_layers must be numerically identical to the unrolled stack:
    restacking the unrolled per-layer params into the (L, ...) scan layout
    must reproduce the same output."""
    kw = dict(num_past_frames=3, num_future_frames=3, num_encoder_layers=2,
              num_decoder_layers=2, rpe=True, **TINY)
    unrolled = VPTRFormerNAR(scan_layers=False, **kw)
    scanned = VPTRFormerNAR(scan_layers=True, **kw)
    x = _feats(2, 3)
    uvars = unrolled.init(jax.random.PRNGKey(0), x, method="init_all")

    def stack(prefix, col):
        subs = []
        i = 0
        while f"{prefix}{i}" in col:
            subs.append(col[f"{prefix}{i}"])
            i += 1
        return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *subs)

    svars = {}
    for colname, col in uvars.items():
        new = {k: v for k, v in col.items()
               if not (k.startswith("enc_block") or k.startswith("dec_block"))}
        if any(k.startswith("enc_block") for k in col):
            new["enc_blocks"] = {"block": stack("enc_block", col)}
        if any(k.startswith("dec_block") for k in col):
            new["dec_blocks"] = {"block": stack("dec_block", col)}
        svars[colname] = new

    a = unrolled.apply(uvars, x)
    b = scanned.apply(svars, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)
    # gradients flow through the scanned stack
    g = jax.grad(lambda v: jnp.sum(scanned.apply(v, x) ** 2))(
        {"params": svars["params"]} | {k: v for k, v in svars.items()
                                       if k != "params"})
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_scan_layers_far_matches_unrolled():
    """FAR scan_layers numeric equivalence: restacking the unrolled
    per-layer params into the (L, ...) scan layout reproduces the output."""
    kw = dict(num_past_frames=3, num_future_frames=3, num_encoder_layers=3,
              **TINY)
    unrolled = VPTRFormerFAR(scan_layers=False, **kw)
    scanned = VPTRFormerFAR(scan_layers=True, **kw)
    x = _feats(2, 5)
    uvars = unrolled.init(jax.random.PRNGKey(0), x)

    blocks = [uvars["params"][f"block{i}"] for i in range(3)]
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *blocks)
    svars = {"params": {
        "blocks": {"block": stacked},
        "final_norm": uvars["params"]["final_norm"],
    }}
    a = unrolled.apply(uvars, x)
    b = scanned.apply(svars, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("variant", ["far", "nar", "far_temporal", "far_ffn"])
def test_fused_full_ln_folded_matches_in_model(variant):
    """fused_full (whole-sublayer kernels with the leading LayerNorms folded
    in, temporal attention padded in-kernel) must match the unfused model on
    the SAME param tree — outputs and grads."""
    if variant.startswith("far"):
        base = dict(num_past_frames=3, num_future_frames=3,
                    num_encoder_layers=1, **TINY)
        mk = lambda **kw: VPTRFormerFAR(**base, **kw)
    else:
        base = dict(num_past_frames=3, num_future_frames=3,
                    num_encoder_layers=1, num_decoder_layers=1, rpe=True,
                    **TINY)
        mk = lambda **kw: VPTRFormerNAR(**base, **kw)
    model_a = mk(fused_attention=False)
    model_b = mk(fused_attention=True, fused_full=True,
                 fused_full_temporal=variant.endswith("temporal"),
                 fused_ffn=variant.endswith("ffn"))
    x = _feats(2, 5 if variant == "far" else 3)
    variables = model_a.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(model_b.init(jax.random.PRNGKey(0), x))
    out_a = model_a.apply(variables, x)
    out_b = model_b.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=2e-5, rtol=2e-5)

    def loss(m):
        return lambda v: jnp.mean(m.apply(v, x) ** 2)

    ga = jax.grad(loss(model_a))(variables)
    gb = jax.grad(loss(model_b))(variables)

    def close(path, a, b):
        a, b = np.asarray(a), np.asarray(b)
        # per-leaf scale-relative: float noise near zero crossings of large
        # grads is not a real divergence
        scale = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() <= 2e-3 * scale + 2e-5, \
            (jax.tree_util.keystr(path), np.abs(a - b).max(), scale)

    jax.tree_util.tree_map_with_path(close, ga, gb)


def test_nar_tslma_fused_matches_unfused():
    """TSLMA + enc-dec attention now route through the fused core kernel
    when eligible; outputs must be unchanged (eval mode)."""
    base = dict(num_past_frames=3, num_future_frames=3,
                num_encoder_layers=1, num_decoder_layers=1, tslma=True,
                rpe=True, **TINY)
    model_a = VPTRFormerNAR(fused_attention=False, **base)
    model_b = VPTRFormerNAR(fused_attention=True, **base)
    x = _feats(2, 3)
    variables = model_a.init(jax.random.PRNGKey(0), x)
    out_a = model_a.apply(variables, x)
    out_b = model_b.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("tslma", [False, True])
def test_nar_rectangular_fused_matches_unfused(tslma, monkeypatch):
    """At the published BAIR geometry (Tp=2 != Tf=10) the enc-dec attention
    is rectangular (Tf queries over Tp memory; TSLMA windows Tf*16 over
    Tp*16). The rectangular fused core kernel must reproduce the XLA path —
    outputs AND parameter gradients (reference enc-dec attention:
    VidHRFormer_modules.py:194-206). The shipped routing sends rect shapes
    to XLA (measured faster at small Lk, round 4), so the kernel route is
    forced here to keep the rectangular kernel covered."""
    from vptr_tpu.models import layers as layers_mod

    monkeypatch.setattr(layers_mod, "FUSED_RECT_DISABLE", False)
    base = dict(num_past_frames=2, num_future_frames=10,
                num_encoder_layers=1, num_decoder_layers=1, tslma=tslma,
                rpe=True, **TINY)
    model_a = VPTRFormerNAR(fused_attention=False, **base)
    model_b = VPTRFormerNAR(fused_attention=True, **base)
    x = _feats(2, 2)
    variables = model_a.init(jax.random.PRNGKey(0), x, train=True)

    def run(model, v):
        out = model.apply(v, x, mutable=["batch_stats"]
                          if "batch_stats" in v else [])
        return out[0] if isinstance(out, tuple) else out

    out_a = run(model_a, variables)
    out_b = run(model_b, variables)
    assert out_a.shape == (2, 10, 8, 8, 24)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=2e-5, rtol=2e-5)

    def loss(model):
        return lambda p: jnp.sum(run(model, p) ** 2)

    ga = jax.grad(loss(model_a))({"params": variables["params"],
                                  **{k: v for k, v in variables.items()
                                     if k != "params"}})
    gb = jax.grad(loss(model_b))({"params": variables["params"],
                                  **{k: v for k, v in variables.items()
                                     if k != "params"}})

    def close(path, a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() <= 5e-4 * max(scale, 1.0), \
            (jax.tree_util.keystr(path), np.abs(a - b).max(), scale)

    jax.tree_util.tree_map_with_path(close, ga, gb)

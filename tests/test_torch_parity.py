"""Whole-model forward parity against inline torch re-derivations.

Builds the reference architecture in torch FROM ITS DOCUMENTED BEHAVIOR
(re-derivation — no import from /root/reference), random-inits it, exports
the state_dict with the reference's key naming, imports it through
``vptr_tpu.utils.torch_import``, and asserts the full forward matches at the
real geometry. One drifted layer semantics anywhere in the stack fails these.

Covered:
* VPTREnc + VPTRDec at 64x64/528/9-res-blocks (reference:
  model/ResNetAutoEncoder.py:8-101, Sequential index layout)
* VPTRFormerFAR at the full train_FAR.py:154-197 geometry — 12 layers,
  d_model 528, heads 8, window 4, causal temporal attention, rpe=False
  (stock packed nn.MultiheadAttention)
* VPTRFormerNAR encoder-decoder with rpe=True (split q/k/v projections +
  Swin bias table), BatchNorm conv-FFN encoder, frame queries, NCE head
  (reference: model/VidHRFormer_modules.py:30-211, VPTR_modules.py:98-152)

Position embeddings are shared as numpy constants from
vptr_tpu.models.position (their formula parity vs the reference has its own
test, tests/test_position.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

pytestmark = pytest.mark.slow  # full 528-d/12-layer geometry

from vptr_tpu.models.autoencoder import VPTRDec, VPTREnc
from vptr_tpu.models.position import (
    position_embedding_1d,
    position_embedding_2d,
)
from vptr_tpu.models.transformer import VPTRFormerFAR, VPTRFormerNAR
from vptr_tpu.utils.torch_import import (
    import_far_transformer,
    import_nar_transformer,
    import_vptr_dec,
    import_vptr_enc,
)

RNG = np.random.default_rng(99)
torch.manual_seed(99)


def _sd(module):
    # .copy() is load-bearing: .numpy() returns a VIEW of the parameter
    # storage, and jnp.asarray on the CPU backend aliases aligned float32
    # numpy buffers zero-copy — so without the copy, a later in-place torch
    # mutation (optimizer.step(), train-mode BN running-stat updates)
    # silently rewrites the "initial" jax variables too
    return {k: v.detach().numpy().copy()
            for k, v in module.state_dict().items()}


def _randomize_bn(module):
    """Random (not default) BatchNorm affine + running stats, so the import
    of every buffer is actually exercised in eval mode."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)


# ---------------------------------------------------------------------------
# torch re-derivation: conv autoencoder (ResNetAutoEncoder.py:8-101)
# ---------------------------------------------------------------------------

class TorchResnetBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3, bias=False),
            nn.BatchNorm2d(dim), nn.ReLU(True),
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3, bias=False),
            nn.BatchNorm2d(dim))

    def forward(self, x):
        return x + self.conv_block(x)


class TorchVPTREnc(nn.Module):
    def __init__(self, img_ch=1, ngf=64, feat_dim=528, nd=3, n_res=9):
        super().__init__()
        layers = [nn.ReflectionPad2d(3),
                  nn.Conv2d(img_ch, ngf, 7, bias=False),
                  nn.BatchNorm2d(ngf), nn.ReLU(True)]
        for i in range(nd - 1):
            mult = 2 ** i
            layers += [nn.Conv2d(ngf * mult, ngf * mult * 2, 3, stride=2,
                                 padding=1, bias=False),
                       nn.BatchNorm2d(ngf * mult * 2), nn.ReLU(True)]
        layers += [nn.Conv2d(ngf * 2 ** (nd - 1), feat_dim, 3, stride=2,
                             padding=1, bias=False),
                   nn.BatchNorm2d(feat_dim), nn.ReLU(True)]
        layers += [TorchResnetBlock(feat_dim) for _ in range(n_res)]
        layers += [nn.ReLU()]
        self.encoder = nn.Module()
        self.encoder.model = nn.Sequential(*layers)

    def forward(self, x):  # (N*T, C, H, W)
        return self.encoder.model(x)


class TorchVPTRDec(nn.Module):
    def __init__(self, img_ch=1, ngf=64, feat_dim=528, nd=3,
                 out_layer="Sigmoid"):
        super().__init__()
        layers = []
        ch_in = feat_dim
        for i in range(nd):
            mult = 2 ** (nd - i)
            ch_out = int(ngf * mult / 2)
            layers += [nn.ConvTranspose2d(ch_in, ch_out, 3, stride=2,
                                          padding=1, output_padding=1,
                                          bias=False),
                       nn.BatchNorm2d(ch_out), nn.ReLU(True)]
            ch_in = ch_out
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, img_ch, 7),
                   nn.Sigmoid() if out_layer == "Sigmoid" else nn.Tanh()]
        self.decoder = nn.Module()
        self.decoder.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.decoder.model(x)


def test_autoencoder_full_geometry_matches_torch():
    feat_dim, n_res = 528, 9
    tenc = TorchVPTREnc(feat_dim=feat_dim, n_res=n_res).eval()
    tdec = TorchVPTRDec(feat_dim=feat_dim).eval()
    _randomize_bn(tenc)
    _randomize_bn(tdec)

    x = RNG.normal(size=(2, 2, 64, 64, 1)).astype(np.float32) * 0.5
    with torch.no_grad():
        tfeat = tenc(torch.tensor(
            x.reshape(4, 64, 64, 1).transpose(0, 3, 1, 2)))
        tout = tdec(tfeat).numpy().transpose(0, 2, 3, 1).reshape(
            2, 2, 64, 64, 1)
        tfeat = tfeat.numpy().transpose(0, 2, 3, 1).reshape(2, 2, 8, 8, -1)

    enc = VPTREnc(img_channels=1, feat_dim=feat_dim, n_downsampling=3)
    dec = VPTRDec(img_channels=1, n_downsampling=3, out_layer="sigmoid")
    enc_vars = jax.tree_util.tree_map(
        jnp.asarray, import_vptr_enc(_sd(tenc), n_res_blocks=n_res))
    dec_vars = jax.tree_util.tree_map(
        jnp.asarray, import_vptr_dec(_sd(tdec)))

    feat = enc.apply(enc_vars, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(feat), tfeat, atol=2e-3, rtol=2e-4)
    out = dec.apply(dec_vars, feat, train=False)
    np.testing.assert_allclose(np.asarray(out), tout, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# torch re-derivation: VidHRFormer (VidHRFormer_modules.py:30-211)
# ---------------------------------------------------------------------------

def _win_permute(x, win):
    """einops 'n (qh ph) (qw pw) c -> (ph pw) (n qh qw) c'."""
    n, h, w, c = x.shape
    qh, qw = h // win, w // win
    x = x.view(n, qh, win, qw, win, c)
    x = x.permute(2, 4, 0, 1, 3, 5).reshape(win * win, n * qh * qw, c)
    return x


def _win_reverse(x, win, n, h, w):
    c = x.shape[-1]
    qh, qw = h // win, w // win
    x = x.view(win, win, n, qh, qw, c)
    x = x.permute(2, 3, 0, 4, 1, 5).reshape(n, h, w, c)
    return x


class TorchSLMHSA(nn.Module):
    """SpatialLocalMultiheadAttention re-derivation
    (VidHRFormer_modules.py:287-357 + MultiHeadAttentionRPE.py)."""

    def __init__(self, dim, heads, win, rpe):
        super().__init__()
        self.dim, self.heads, self.win, self.rpe = dim, heads, win, rpe
        if rpe:
            attn = nn.Module()
            attn.q_proj = nn.Linear(dim, dim)
            attn.k_proj = nn.Linear(dim, dim)
            attn.v_proj = nn.Linear(dim, dim)
            attn.out_proj = nn.Linear(dim, dim)
            attn.relative_position_bias_table = nn.Parameter(
                torch.randn((2 * win - 1) ** 2, heads) * 0.02)
            self.attn = attn
            # Swin-style relative index (MultiHeadAttentionRPE.py:373-387)
            coords = torch.stack(torch.meshgrid(
                torch.arange(win), torch.arange(win), indexing="ij"))
            flat = coords.flatten(1)
            rel = flat[:, :, None] - flat[:, None, :]
            rel = rel.permute(1, 2, 0).contiguous()
            rel[..., 0] += win - 1
            rel[..., 1] += win - 1
            rel[..., 0] *= 2 * win - 1
            self.register_buffer("rel_index", rel.sum(-1))
        else:
            self.attn = nn.MultiheadAttention(dim, heads, dropout=0.0)

    def forward(self, x, lw_pos, value=None):
        n, t, h, w, c = x.shape
        xp = _win_permute(x.reshape(n * t, h, w, c), self.win)
        vp = xp if value is None else _win_permute(
            value.reshape(n * t, h, w, c), self.win)
        if self.rpe:
            L, B, _ = xp.shape
            hd = c // self.heads
            q = self.attn.q_proj(xp) * hd ** -0.5
            k = self.attn.k_proj(xp)
            v = self.attn.v_proj(vp)
            to_heads = lambda z: z.reshape(L, B * self.heads, hd).transpose(0, 1)
            q, k, v = to_heads(q), to_heads(k), to_heads(v)
            logits = torch.bmm(q, k.transpose(1, 2))   # (B*H, L, L)
            bias = self.attn.relative_position_bias_table[
                self.rel_index.view(-1)].view(L, L, self.heads)
            bias = bias.permute(2, 0, 1)               # (H, L, L)
            logits = logits.view(B, self.heads, L, L) + bias[None]
            wgt = F.softmax(logits.view(B * self.heads, L, L), dim=-1)
            out = torch.bmm(wgt, v).transpose(0, 1).reshape(L, B, c)
            out = self.attn.out_proj(out)
        else:
            q = k = xp + lw_pos.flatten(0, 1)[:, None, :]
            out = self.attn(q, k, value=vp)[0]
        out = _win_reverse(out, self.win, n * t, h, w)
        return out.reshape(n, t, h, w, c)


class TorchMlpDWBN(nn.Module):
    """MlpDWBN re-derivation (VidHRFormer_modules.py:376-442)."""

    def __init__(self, enc_h, enc_w, dim, hidden, layer_norm):
        super().__init__()
        norm = (lambda ch: nn.LayerNorm((ch, enc_h, enc_w))) if layer_norm \
            else nn.BatchNorm2d
        self.fc1 = nn.Conv2d(dim, hidden, 1)
        self.norm1 = norm(hidden)
        self.dw3x3 = nn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden)
        self.norm2 = norm(hidden)
        self.fc2 = nn.Conv2d(hidden, dim, 1)
        self.norm3 = norm(dim)

    def forward(self, x):
        n, t, h, w, c = x.shape
        y = x.reshape(n * t, h, w, c).permute(0, 3, 1, 2)
        y = F.gelu(self.norm1(self.fc1(y)))
        y = F.gelu(self.norm2(self.dw3x3(y)))
        y = F.gelu(self.norm3(self.fc2(y)))
        return y.permute(0, 2, 3, 1).reshape(n, t, h, w, -1)


class TorchEncBlock(nn.Module):
    """VidHRFormerBlockEnc re-derivation (VidHRFormer_modules.py:30-93)."""

    def __init__(self, enc_h, enc_w, dim, heads, win, ff, far, rpe):
        super().__init__()
        self.far = far
        self.SLMHSA = TorchSLMHSA(dim, heads, win, rpe)
        self.SpatialFFN = TorchMlpDWBN(enc_h, enc_w, dim, 4 * dim,
                                       layer_norm=far)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)
        self.temporal_MHSA = nn.MultiheadAttention(dim, heads, dropout=0.0)
        self.linear1 = nn.Linear(dim, ff)
        self.linear2 = nn.Linear(ff, dim)
        self.norm4 = nn.LayerNorm(dim)

    def forward(self, x, lw_pos, temporal_pos):
        n, t, h, w, c = x.shape
        x = x + self.SLMHSA(self.norm1(x), lw_pos)
        x = x + self.SpatialFFN(self.norm2(x))
        x = x.permute(1, 0, 2, 3, 4).reshape(t, n * h * w, c)
        x1 = self.norm3(x)
        q = x1 + temporal_pos[:, None, :]
        mask = (torch.triu(torch.ones(t, t), diagonal=1) == 1) if self.far \
            else None
        x = x + self.temporal_MHSA(q, q, x1, attn_mask=mask)[0]
        x1 = self.norm4(x)
        x = x + self.linear2(F.gelu(self.linear1(x1)))
        return x.reshape(t, n, h, w, c).permute(1, 0, 2, 3, 4)


class TorchFAR(nn.Module):
    """VPTRFormerFAR re-derivation (VPTR_modules.py:154-197)."""

    def __init__(self, layers, dim, heads, win, enc_h, enc_w):
        super().__init__()
        enc = nn.Module()
        enc.layers = nn.ModuleList([
            TorchEncBlock(enc_h, enc_w, dim, heads, win, 4 * dim,
                          far=True, rpe=False) for _ in range(layers)])
        enc.norm = nn.LayerNorm(dim)
        self.transformer = nn.Module()
        self.transformer.encoder = enc

    def forward(self, x, lw_pos, temporal_pos):
        for layer in self.transformer.encoder.layers:
            x = layer(x, lw_pos, temporal_pos)
        return F.relu(self.transformer.encoder.norm(x))


def test_far_full_geometry_matches_torch():
    """12 layers, d_model 528, heads 8, window 4, causal — the exact
    train_FAR.py:154-197 recipe geometry, forward parity vs torch."""
    dim, heads, win, layers, t = 528, 8, 4, 12, 5
    tmodel = TorchFAR(layers, dim, heads, win, 8, 8).eval()

    lw_pos = torch.tensor(np.asarray(
        position_embedding_2d(win, win, dim), np.float32))
    temporal_pos = torch.tensor(np.asarray(
        position_embedding_1d(20, dim), np.float32))[:t]

    x = RNG.normal(size=(1, t, 8, 8, dim)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tmodel(torch.tensor(x), lw_pos, temporal_pos).numpy()

    model = VPTRFormerFAR(num_past_frames=10, num_future_frames=10,
                          d_model=dim, num_heads=heads, window=win,
                          num_encoder_layers=layers, dropout=0.0,
                          drop_path=0.0, rpe=False)
    variables = jax.tree_util.tree_map(
        jnp.asarray, import_far_transformer(_sd(tmodel), layers, rpe=False))
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-4)


class TorchDecBlock(nn.Module):
    """VidHRFormerBlockDecNAR re-derivation (VidHRFormer_modules.py:125-211),
    full-temporal enc-dec attention variant."""

    def __init__(self, enc_h, enc_w, dim, heads, win, ff, rpe):
        super().__init__()
        self.SLMHSA = TorchSLMHSA(dim, heads, win, rpe)
        self.SpatialFFN = TorchMlpDWBN(enc_h, enc_w, dim, 4 * dim, True)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)
        self.temporal_MHSA = nn.MultiheadAttention(dim, heads, dropout=0.0)
        self.linear1 = nn.Linear(dim, ff)
        self.linear2 = nn.Linear(ff, dim)
        self.norm4 = nn.LayerNorm(dim)
        self.EncDecAttn = nn.MultiheadAttention(dim, heads, dropout=0.0)
        self.SpatialFFN1 = TorchMlpDWBN(enc_h, enc_w, dim, 4 * dim, True)
        self.norm5 = nn.LayerNorm(dim)
        self.norm6 = nn.LayerNorm(dim)

    def forward(self, tgt, query_pos, memory, lw_pos, fut_pos, past_pos):
        n, t2, h, w, c = tgt.shape
        t1 = memory.shape[1]
        tgt2 = self.norm1(tgt)
        tgt2 = tgt + self.SLMHSA(tgt2 + query_pos, lw_pos, value=tgt2)
        tgt2 = tgt2 + self.SpatialFFN(self.norm2(tgt2))
        tgt2 = tgt2.permute(1, 0, 2, 3, 4).reshape(t2, n * h * w, c)
        tgt = self.norm3(tgt2)
        q = tgt + fut_pos[:, None, :]
        tgt2 = tgt2 + self.temporal_MHSA(q, q, tgt)[0]
        tgt = self.norm4(tgt2)
        tgt2 = tgt2 + self.linear2(F.gelu(self.linear1(tgt)))
        tgt = self.norm5(tgt2)
        mem = memory.permute(1, 0, 2, 3, 4).reshape(t1, n * h * w, c)
        qp = query_pos.permute(1, 0, 2, 3, 4).reshape(t2, n * h * w, c)
        tgt2 = tgt2 + self.EncDecAttn(
            query=tgt + qp + fut_pos[:, None, :],
            key=mem + past_pos[:, None, :], value=mem)[0]
        tgt2 = tgt2.reshape(t2, n, h, w, c).permute(1, 0, 2, 3, 4)
        return tgt2 + self.SpatialFFN1(self.norm6(tgt2))


class TorchNAR(nn.Module):
    """VPTRFormerNAR re-derivation (VPTR_modules.py:98-152)."""

    def __init__(self, n_enc, n_dec, dim, heads, win, enc_h, enc_w, tf):
        super().__init__()
        enc = nn.Module()
        enc.layers = nn.ModuleList([
            TorchEncBlock(enc_h, enc_w, dim, heads, win, 4 * dim,
                          far=False, rpe=True) for _ in range(n_enc)])
        enc.norm = nn.LayerNorm(dim)
        dec = nn.Module()
        dec.layers = nn.ModuleList([
            TorchDecBlock(enc_h, enc_w, dim, heads, win, 4 * dim, rpe=True)
            for _ in range(n_dec)])
        dec.norm = nn.LayerNorm(dim)
        self.transformer = nn.Module()
        self.transformer.encoder = enc
        self.transformer.decoder = dec
        self.frame_queries = nn.Parameter(
            torch.randn(tf, enc_h, enc_w, dim) * 0.02)
        self.NCE_projector = nn.Sequential(
            nn.Linear(dim, dim), nn.ReLU(), nn.Linear(dim, dim))

    def forward(self, src, lw_pos, temporal_pos):
        n, tp = src.shape[:2]
        tf = self.frame_queries.shape[0]
        x = src
        for layer in self.transformer.encoder.layers:
            x = layer(x, lw_pos, temporal_pos[:tp])
        memory = self.transformer.encoder.norm(x)
        query_pos = self.frame_queries[None].repeat(n, 1, 1, 1, 1)
        tgt = torch.zeros_like(query_pos)
        for layer in self.transformer.decoder.layers:
            tgt = layer(tgt, query_pos, memory, lw_pos,
                        temporal_pos[tp:tp + tf], temporal_pos[:tp])
        return F.relu(self.transformer.decoder.norm(tgt))


def test_nar_matches_torch():
    """NAR enc-dec (rpe=True split projections + bias table, BatchNorm
    conv-FFN encoder, frame queries, NCE head) forward parity at d_model
    528."""
    dim, heads, win, n_enc, n_dec, tp, tf = 528, 8, 4, 2, 2, 3, 3
    tmodel = TorchNAR(n_enc, n_dec, dim, heads, win, 8, 8, tf).eval()
    _randomize_bn(tmodel)

    lw_pos = torch.tensor(np.asarray(
        position_embedding_2d(win, win, dim), np.float32))
    temporal_pos = torch.tensor(np.asarray(
        position_embedding_1d(tp + tf, dim), np.float32))

    x = RNG.normal(size=(2, tp, 8, 8, dim)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tmodel(torch.tensor(x), lw_pos, temporal_pos).numpy()
        want_nce = tmodel.NCE_projector(torch.tensor(want)).numpy()

    model = VPTRFormerNAR(num_past_frames=tp, num_future_frames=tf,
                          d_model=dim, num_heads=heads, window=win,
                          num_encoder_layers=n_enc, num_decoder_layers=n_dec,
                          dropout=0.0, drop_path=0.0, rpe=True)
    variables = jax.tree_util.tree_map(
        jnp.asarray,
        import_nar_transformer(_sd(tmodel), n_enc, n_dec, rpe=True))
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-4)

    got_nce = np.asarray(model.apply(
        variables, jnp.asarray(got), method=model.nce_project))
    np.testing.assert_allclose(got_nce, want_nce, atol=2e-3, rtol=2e-4)


def test_reference_checkpoint_file_roundtrip(tmp_path):
    """Full file-level path: save a reference-format epoch_N.tar
    (utils/train_summary.py:143-149 layout), auto-detect geometry + convert
    every module via import_reference_checkpoint, and match the torch
    forwards."""
    from vptr_tpu.models.autoencoder import ResnetEncoder
    from vptr_tpu.utils.torch_import import import_reference_checkpoint

    dim, heads, layers = 48, 8, 2
    tenc = TorchVPTREnc(feat_dim=dim, n_res=2).eval()
    tfar = TorchFAR(layers, dim, heads, 4, 8, 8).eval()
    _randomize_bn(tenc)
    path = tmp_path / "epoch_3.tar"
    torch.save({
        "epoch": 3, "loss_dict": {"T_total": ([0.5], [0.4]), "epochs": 3},
        "Module_state_dict": {"VPTR_Enc": tenc.state_dict(),
                              "VPTR_Transformer": tfar.state_dict()},
        "optimizer_state_dict": {}, "code": {"train_FAR.py": b"src bytes"},
    }, str(path))

    converted = import_reference_checkpoint(str(path))
    assert set(converted) == {"VPTR_Enc", "VPTR_Transformer"}

    # encoder forward parity (geometry auto-detected: 3 downs, 2 res blocks)
    x = RNG.normal(size=(2, 64, 64, 1)).astype(np.float32) * 0.5
    with torch.no_grad():
        want_feat = tenc(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    enc_vars = jax.tree_util.tree_map(jnp.asarray, converted["VPTR_Enc"])
    renc = ResnetEncoder(feat_dim=dim, n_downsampling=3, n_res_blocks=2)
    got = renc.apply(
        {"params": enc_vars["params"]["encoder"],
         "batch_stats": enc_vars["batch_stats"]["encoder"]},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(got), want_feat.transpose(0, 2, 3, 1),
        atol=2e-3, rtol=2e-4)

    # transformer forward parity (layer count / rpe auto-detected)
    lw_pos = torch.tensor(np.asarray(
        position_embedding_2d(4, 4, dim), np.float32))
    temporal_pos = torch.tensor(np.asarray(
        position_embedding_1d(4, dim), np.float32))
    f = RNG.normal(size=(1, 3, 8, 8, dim)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tfar(torch.tensor(f), lw_pos, temporal_pos[:3]).numpy()
    model = VPTRFormerFAR(num_past_frames=2, num_future_frames=2,
                          d_model=dim, num_heads=heads, window=4,
                          num_encoder_layers=layers, dropout=0.0,
                          drop_path=0.0, rpe=False)
    variables = jax.tree_util.tree_map(jnp.asarray,
                                       converted["VPTR_Transformer"])
    got = np.asarray(model.apply(variables, jnp.asarray(f), train=False))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-4)

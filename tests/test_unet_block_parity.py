"""UNet-stack block-level activation parity vs minimal torch
re-declarations of the reference modules (src/models/resnet.py
ResnetBlock3D, attention.py BasicTransformerBlock + transformer_3d.py
wrapper, motion_module.py VanillaTemporalModule + mutual_self_attention.py
bank-concat semantics) — SURVEY §4 test-pyramid item (a). Torch modules are
re-stated from the cited semantics, not copied."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mimo_tpu.models import unet as U
from mimo_tpu.models import layers as L


def _t(x):
    return torch.tensor(np.asarray(x))


def _set_linear(mod, p, bias=True):
    with torch.no_grad():
        mod.weight.copy_(_t(p["kernel"]).T)
        if bias and mod.bias is not None and "bias" in p:
            mod.bias.copy_(_t(p["bias"]))


def _set_conv(mod, p):
    with torch.no_grad():
        mod.weight.copy_(_t(p["kernel"]).permute(3, 2, 0, 1))
        mod.bias.copy_(_t(p["bias"]))


def _set_norm(mod, p):
    with torch.no_grad():
        mod.weight.copy_(_t(p["scale"]))
        mod.bias.copy_(_t(p["bias"]))


class TorchAttn(nn.Module):
    """diffusers Attention: bias-free to_q/k/v, biased to_out."""

    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.h = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.Linear(dim, dim)

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        b, n, c = q.shape
        m = k.shape[1]
        d = c // self.h
        q = q.view(b, n, self.h, d).transpose(1, 2)
        k = k.view(b, m, self.h, d).transpose(1, 2)
        v = v.view(b, m, self.h, d).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        return self.to_out(o.transpose(1, 2).reshape(b, n, c))

    def load(self, p):
        _set_linear(self.to_q, p["to_q"], bias=False)
        _set_linear(self.to_k, p["to_k"], bias=False)
        _set_linear(self.to_v, p["to_v"], bias=False)
        _set_linear(self.to_out, p["to_out"])


class TorchGEGLU(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.proj_in = nn.Linear(dim, dim * mult * 2)
        self.proj_out = nn.Linear(dim * mult, dim)

    def forward(self, x):
        h, gate = self.proj_in(x).chunk(2, -1)
        return self.proj_out(h * F.gelu(gate))


def test_resnet_block_matches_torch():
    """ResnetBlock3D (resnet.py:123-252): GN -> SiLU -> conv -> +temb ->
    GN -> SiLU -> conv (+ 1x1 shortcut)."""
    c_in, c_out, temb_dim, groups = 8, 12, 16, 4
    p = U.resnet_init(jax.random.PRNGKey(0), c_in, c_out, temb_dim)
    # non-trivial norms
    p["norm1"] = {"scale": jnp.linspace(0.5, 1.5, c_in),
                  "bias": jnp.linspace(-0.1, 0.1, c_in)}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, c_in))
    temb = jax.random.normal(jax.random.PRNGKey(2), (2, temb_dim))
    got = np.asarray(U.resnet_apply(p, x, temb, groups, 1e-5))

    pn = jax.tree.map(np.asarray, p)
    n1 = nn.GroupNorm(groups, c_in)
    conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
    tproj = nn.Linear(temb_dim, c_out)
    n2 = nn.GroupNorm(groups, c_out)
    conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
    short = nn.Conv2d(c_in, c_out, 1)
    _set_norm(n1, pn["norm1"]); _set_conv(conv1, pn["conv1"])
    _set_linear(tproj, pn["temb_proj"]); _set_norm(n2, pn["norm2"])
    _set_conv(conv2, pn["conv2"]); _set_conv(short, pn["shortcut"])
    with torch.no_grad():
        xt = _t(x).permute(0, 3, 1, 2)
        h = conv1(F.silu(n1(xt)))
        h = h + tproj(F.silu(_t(temb)))[:, :, None, None]
        h = conv2(F.silu(n2(h)))
        want = (short(xt) + h).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_spatial_transformer_matches_torch_with_bank():
    """Transformer3DModel wrapper + hacked BasicTransformerBlock
    (transformer_3d.py:114-145, mutual_self_attention.py:154-216): GN ->
    1x1 proj_in -> [self-attn with bank-concat K/V on the cond half,
    plain on the uncond half (uc_mask) -> cross-attn -> GEGLU FF] ->
    1x1 proj_out + residual."""
    c, ctx_dim, heads, groups = 8, 12, 2, 4
    cfg = U.UNetConfig(block_out_channels=(c,), cross_attention_dim=ctx_dim,
                       num_heads=heads, norm_num_groups=groups)
    p = U.spatial_transformer_init(jax.random.PRNGKey(0), c, ctx_dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 5, c))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 3, ctx_dim))
    bank = jax.random.normal(jax.random.PRNGKey(3), (7, c))
    got = np.asarray(U.spatial_transformer_apply(
        p, x, ctx, cfg, bank_in=bank, cfg_split=True))

    pn = jax.tree.map(np.asarray, p)
    gn = nn.GroupNorm(groups, c, eps=1e-6)
    proj_in = nn.Conv2d(c, c, 1)
    n1 = nn.LayerNorm(c)
    attn1 = TorchAttn(c, c, heads)
    n2 = nn.LayerNorm(c)
    attn2 = TorchAttn(c, ctx_dim, heads)
    n3 = nn.LayerNorm(c)
    ff = TorchGEGLU(c)
    proj_out = nn.Conv2d(c, c, 1)
    _set_norm(gn, pn["norm"]); _set_conv(proj_in, pn["proj_in"])
    _set_norm(n1, pn["norm1"]); attn1.load(pn["attn1"])
    _set_norm(n2, pn["norm2"]); attn2.load(pn["attn2"])
    _set_norm(n3, pn["norm3"])
    _set_linear(ff.proj_in, pn["ff"]["proj_in"])
    _set_linear(ff.proj_out, pn["ff"]["proj_out"])
    _set_conv(proj_out, pn["proj_out"])

    with torch.no_grad():
        xt = _t(x).permute(0, 3, 1, 2)
        res = xt
        h = proj_in(gn(xt))
        tok = h.flatten(2).transpose(1, 2)
        y = n1(tok)
        # uncond half (batch 0..1): plain self-attn; cond half: K/V with
        # the bank appended (mutual_self_attention.py:154-197)
        bank_t = _t(bank)[None]
        out_u = attn1(y[:2])
        kv_c = torch.cat([y[2:], bank_t.expand(2, -1, -1)], dim=1)
        q_c = attn1.to_q(y[2:])
        k_c = attn1.to_k(kv_c)
        v_c = attn1.to_v(kv_c)
        b, n, cc = q_c.shape
        d = cc // heads
        qh = q_c.view(b, n, heads, d).transpose(1, 2)
        kh = k_c.view(b, -1, heads, d).transpose(1, 2)
        vh = v_c.view(b, -1, heads, d).transpose(1, 2)
        out_c = attn1.to_out(
            F.scaled_dot_product_attention(qh, kh, vh)
            .transpose(1, 2).reshape(b, n, cc))
        tok = tok + torch.cat([out_u, out_c], 0)
        tok = tok + attn2(n2(tok), _t(ctx))
        tok = tok + ff(n3(tok))
        h = tok.transpose(1, 2).reshape(4, c, 5, 5)
        want = (proj_out(h) + res).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_cross_attn_single_token_fast_path():
    """The single-context-token cross attention reduces exactly to
    to_out(to_v(ctx)) (models/unet.py fast path) — must equal full
    attention with one key."""
    c, heads = 8, 2
    p = L.mha_init(jax.random.PRNGKey(0), c, context_dim=12)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, c))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 12))
    fast = np.asarray(U._cross_attn_single_token(p, x, ctx))
    full = np.asarray(L.mha(p, x, ctx, heads))
    np.testing.assert_allclose(np.broadcast_to(fast, full.shape), full,
                               atol=2e-5)


def test_motion_module_matches_torch():
    """VanillaTemporalModule (motion_module.py:34-390): GN -> linear
    proj_in -> [LN -> +sinusoidal PE -> temporal self-attn over frames]
    x2 -> LN -> GEGLU FF -> zero-init linear proj_out + residual; the
    temporal attention reshapes (b f) s c -> (b s) f c
    (motion_module.py:361-374)."""
    c, heads, groups, F_ = 8, 2, 4, 3
    mcfg = U.MotionModuleConfig(num_heads=heads, norm_num_groups=groups)
    p = U.motion_module_init(jax.random.PRNGKey(0), c, mcfg)
    # give the zero proj_out real values so the whole path is exercised
    p["proj_out"] = {
        "kernel": jax.random.normal(jax.random.PRNGKey(9), (c, c)) * 0.2,
        "bias": jax.random.normal(jax.random.PRNGKey(10), (c,)) * 0.1}
    x = jax.random.normal(jax.random.PRNGKey(1), (2 * F_, 4, 4, c))
    got = np.asarray(U.motion_module_apply(p, x, F_, mcfg))

    pn = jax.tree.map(np.asarray, p)
    gn = nn.GroupNorm(groups, c, eps=1e-6)
    _set_norm(gn, pn["norm"])
    proj_in = nn.Linear(c, c)
    _set_linear(proj_in, pn["proj_in"])
    proj_out = nn.Linear(c, c)
    _set_linear(proj_out, pn["proj_out"])

    # sinusoidal PE (motion_module.py:264-279)
    pos = torch.arange(F_).float()[:, None]
    div = torch.exp(torch.arange(0, c, 2).float()
                    * (-math.log(10000.0) / c))
    pe = torch.zeros(F_, c)
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)

    with torch.no_grad():
        xt = _t(x).permute(0, 3, 1, 2)
        res = xt
        h = gn(xt)
        # (b f) c h w -> (b, f, s, c) tokens
        tok = h.flatten(2).transpose(1, 2).reshape(2, F_, 16, c)
        tok = proj_in(tok)
        for blk in pn["blocks"]:
            for a in blk["attns"]:
                n_ = nn.LayerNorm(c)
                _set_norm(n_, a["norm"])
                attn = TorchAttn(c, c, heads)
                attn.load(a["attn"])
                y = n_(tok) + pe[None, :, None, :]
                # (b, f, s, c) -> (b*s, f, c) temporal attention
                yt = y.permute(0, 2, 1, 3).reshape(2 * 16, F_, c)
                o = attn(yt).reshape(2, 16, F_, c).permute(0, 2, 1, 3)
                tok = tok + o
            ffn = nn.LayerNorm(c)
            _set_norm(ffn, blk["ff_norm"])
            ff = TorchGEGLU(c)
            _set_linear(ff.proj_in, blk["ff"]["proj_in"])
            _set_linear(ff.proj_out, blk["ff"]["proj_out"])
            tok = tok + ff(ffn(tok))
        tok = proj_out(tok)
        h = tok.reshape(2, F_, 16, c).reshape(2 * F_, 16, c)
        h = h.transpose(1, 2).reshape(2 * F_, c, 4, 4)
        want = (h + res).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=3e-5)

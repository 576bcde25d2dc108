"""SAM2 activation parity vs minimal torch re-instantiations of the
reference modules (semantics re-declared from
video_decomp/segment-anything-2-main/sam2/modeling/*, cited per test; no
reference code copied). Weights flow through the same transposes as
convert_sam2, so these tests validate BOTH the architecture and the
converter's layout conventions."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mimo_tpu.decomp import sam2 as S2
from mimo_tpu.decomp import hiera as HI
from mimo_tpu.models import layers as L


def _t(x):
    return torch.tensor(np.asarray(x))


def _set_linear(mod: nn.Linear, p):
    with torch.no_grad():
        mod.weight.copy_(_t(p["kernel"]).T)
        mod.bias.copy_(_t(p["bias"]))


def _set_conv(mod: nn.Conv2d, p):
    with torch.no_grad():
        mod.weight.copy_(_t(p["kernel"]).permute(3, 2, 0, 1))
        if mod.bias is not None:
            mod.bias.copy_(_t(p["bias"]))


def _set_ln(mod, p):
    with torch.no_grad():
        mod.weight.copy_(_t(p["scale"]))
        mod.bias.copy_(_t(p["bias"]))


# --------------------------------------------------------------------------
# torch re-declarations (reference semantics, not reference code)
# --------------------------------------------------------------------------


def compute_axial_cis(dim, end_x, end_y, theta=10000.0):
    """position_encoding.py:167-183 semantics."""
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 4)[: dim // 4].float()
                             / dim))
    t = torch.arange(end_x * end_y, dtype=torch.float32)
    t_x, t_y = (t % end_x).float(), torch.div(t, end_x,
                                              rounding_mode="floor").float()
    fx, fy = torch.outer(t_x, freqs), torch.outer(t_y, freqs)
    return torch.cat([torch.polar(torch.ones_like(fx), fx),
                      torch.polar(torch.ones_like(fy), fy)], dim=-1)


def apply_rotary_enc(xq, xk, freqs_cis, repeat_freqs_k=False):
    """position_encoding.py:194-216 semantics."""
    xq_ = torch.view_as_complex(xq.float().reshape(*xq.shape[:-1], -1, 2))
    xk_ = torch.view_as_complex(xk.float().reshape(*xk.shape[:-1], -1, 2))
    fc = freqs_cis.view(*([1] * (xq_.ndim - 2)), *freqs_cis.shape)
    xq_out = torch.view_as_real(xq_ * fc).flatten(3)
    if repeat_freqs_k:
        r = xk_.shape[-2] // xq_.shape[-2]
        fc = fc.repeat(*([1] * (fc.ndim - 2)), r, 1)
    xk_out = torch.view_as_real(xk_ * fc).flatten(3)
    return xq_out.type_as(xq), xk_out.type_as(xk)


class TorchRoPEAttention(nn.Module):
    """sam/transformer.py:227-360 Attention + RoPEAttention semantics."""

    def __init__(self, dim, heads, kv_in=None, rope_k_repeat=False,
                 feat_size=4):
        super().__init__()
        kv_in = kv_in or dim
        self.heads = heads
        self.q_proj = nn.Linear(dim, dim)
        self.k_proj = nn.Linear(kv_in, dim)
        self.v_proj = nn.Linear(kv_in, dim)
        self.out_proj = nn.Linear(dim, dim)
        self.rope_k_repeat = rope_k_repeat
        self.freqs_cis = compute_axial_cis(dim // heads, feat_size,
                                           feat_size)

    def _split(self, x):
        b, n, c = x.shape
        return x.reshape(b, n, self.heads, c // self.heads).transpose(1, 2)

    def forward(self, q, k, v, num_k_exclude_rope=0):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        q, k, v = self._split(q), self._split(k), self._split(v)
        num_k_rope = k.size(-2) - num_k_exclude_rope
        q, k[:, :, :num_k_rope] = apply_rotary_enc(
            q, k[:, :, :num_k_rope], freqs_cis=self.freqs_cis,
            repeat_freqs_k=self.rope_k_repeat)
        out = F.scaled_dot_product_attention(q, k, v)
        b, h, n, c = out.shape
        out = out.transpose(1, 2).reshape(b, n, h * c)
        return self.out_proj(out)


class TorchMemAttnLayer(nn.Module):
    """memory_attention.py:18-101 MemoryAttentionLayer semantics with the
    sam2_hiera_l.yaml flags (pos_enc_at_attn=False,
    pos_enc_at_cross_attn_keys=True, pos_enc_at_cross_attn_queries=False,
    activation relu)."""

    def __init__(self, d, ff, heads, kv_in, feat_size):
        super().__init__()
        self.self_attn = TorchRoPEAttention(d, heads, feat_size=feat_size)
        self.cross_attn_image = TorchRoPEAttention(
            d, heads, kv_in=kv_in, rope_k_repeat=True, feat_size=feat_size)
        self.linear1 = nn.Linear(d, ff)
        self.linear2 = nn.Linear(ff, d)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.norm3 = nn.LayerNorm(d)

    def forward(self, tgt, memory, pos, query_pos, num_k_exclude_rope=0):
        tgt2 = self.norm1(tgt)
        tgt = tgt + self.self_attn(tgt2, tgt2, tgt2)
        tgt2 = self.norm2(tgt)
        tgt = tgt + self.cross_attn_image(
            tgt2, memory + pos, memory,
            num_k_exclude_rope=num_k_exclude_rope)
        tgt2 = self.norm3(tgt)
        return tgt + self.linear2(F.relu(self.linear1(tgt2)))


class TorchLayerNorm2d(nn.Module):
    """sam2_utils.py:137-149 semantics."""

    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class TorchMemoryEncoder(nn.Module):
    """memory_encoder.py:17-190 semantics (MaskDownSampler + pix_feat_proj
    + 2 CXBlocks + out_proj)."""

    def __init__(self, d, out_dim):
        super().__init__()
        chans = [1]
        for _ in range(4):
            chans.append(min(chans[-1] * 4, d))
        downs = []
        for cin, cout in zip(chans[:-1], chans[1:]):
            downs += [nn.Conv2d(cin, cout, 3, stride=2, padding=1),
                      TorchLayerNorm2d(cout), nn.GELU()]
        downs.append(nn.Conv2d(d, d, 1))
        self.mask_down = nn.Sequential(*downs)
        self.pix_proj = nn.Conv2d(d, d, 1)
        self.blocks = nn.ModuleList()
        for _ in range(2):
            blk = nn.ModuleDict({
                "dwconv": nn.Conv2d(d, d, 7, padding=3, groups=d),
                "norm": TorchLayerNorm2d(d, eps=1e-6),
                "pw1": nn.Linear(d, 4 * d),
                "pw2": nn.Linear(4 * d, d),
            })
            blk.gamma = nn.Parameter(1e-6 * torch.ones(d))
            self.blocks.append(blk)
        self.out_proj = nn.Conv2d(d, out_dim, 1)

    def forward(self, pix_feat, mask_for_mem):
        h = self.mask_down(mask_for_mem)
        x = self.pix_proj(pix_feat) + h
        for blk in self.blocks:
            y = blk["dwconv"](x)
            y = blk["norm"](y)
            y = y.permute(0, 2, 3, 1)
            y = blk["pw2"](F.gelu(blk["pw1"](y)))
            y = blk.gamma * y
            x = x + y.permute(0, 3, 1, 2)
        return self.out_proj(x)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def _sync_rope_attn(tmod: TorchRoPEAttention, p):
    _set_linear(tmod.q_proj, p["q"])
    _set_linear(tmod.k_proj, p["k"])
    _set_linear(tmod.v_proj, p["v"])
    _set_linear(tmod.out_proj, p["out"])


def test_rope_self_attention_matches_torch():
    rng = jax.random.PRNGKey(0)
    d, heads, g = 16, 2, 4
    p = S2._rope_attn_init(rng, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, g * g, d))

    ang = S2.axial_rope_angles(d // heads, g, g)
    cos, sin = jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))
    got = np.asarray(S2._rope_attention(p, x, x, x, heads, cos, sin))

    tmod = TorchRoPEAttention(d, heads, feat_size=g).eval()
    _sync_rope_attn(tmod, jax.tree.map(np.asarray, p))
    with torch.no_grad():
        want = tmod(_t(x), _t(x), _t(x)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_rope_cross_attention_matches_torch():
    """Cross-attention into M memory slots + excluded pointer tokens,
    rope_k_repeat=True (transformer.py:296-338)."""
    rng = jax.random.PRNGKey(0)
    d, heads, g, M, kv_in, n_ptr = 16, 2, 4, 3, 8, 4
    p = S2._rope_attn_init(rng, d, kv_in=kv_in)
    S = g * g
    q = jax.random.normal(jax.random.PRNGKey(1), (1, S, d))
    kv = jax.random.normal(jax.random.PRNGKey(2), (1, M * S + n_ptr, kv_in))

    ang = S2.axial_rope_angles(d // heads, g, g)
    cos, sin = jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))
    got = np.asarray(S2._rope_attention(
        p, q, kv, kv, heads, cos, sin, repeat_k=M, k_rope_len=M * S))

    tmod = TorchRoPEAttention(d, heads, kv_in=kv_in, rope_k_repeat=True,
                              feat_size=g).eval()
    _sync_rope_attn(tmod, jax.tree.map(np.asarray, p))
    with torch.no_grad():
        want = tmod(_t(q), _t(kv), _t(kv), num_k_exclude_rope=n_ptr).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_memory_attention_stack_matches_torch():
    """Full MemoryAttention (memory_attention.py:104-169): 0.1*pos input
    add, per-layer self+cross+FF, final norm — all slots valid so the
    masked fixed-size formulation must equal the reference's dense one."""
    cfg = S2.tiny_sam2_config()
    params = S2.sam2_init(jax.random.PRNGKey(0), cfg)
    g = 4
    d, md = cfg.dim, cfg.mem_dim
    M = cfg.num_maskmem
    n_ptr_tok = 2 * (d // md)

    feat = jax.random.normal(jax.random.PRNGKey(1), (g, g, d))
    feat_pos = jax.random.normal(jax.random.PRNGKey(2), (g, g, d))
    mem = jax.random.normal(jax.random.PRNGKey(3), (M, g, g, md))
    mem_pos = jax.random.normal(jax.random.PRNGKey(4), (M, g, g, md))
    ptr_tok = jax.random.normal(jax.random.PRNGKey(5), (n_ptr_tok, md))

    got = np.asarray(S2.memory_attention(
        params, cfg, feat, feat_pos, mem, mem_pos, jnp.ones((M,)),
        ptr_tok, jnp.ones((n_ptr_tok,))))

    layers = []
    for lp in params["mem_attn"]["layers"]:
        t = TorchMemAttnLayer(d, cfg.mem_ff, cfg.mem_heads, md, g).eval()
        lpn = jax.tree.map(np.asarray, lp)
        _sync_rope_attn(t.self_attn, lpn["self"])
        _sync_rope_attn(t.cross_attn_image, lpn["cross"])
        _set_linear(t.linear1, lpn["lin1"])
        _set_linear(t.linear2, lpn["lin2"])
        _set_ln(t.norm1, lpn["norm1"])
        _set_ln(t.norm2, lpn["norm2"])
        _set_ln(t.norm3, lpn["norm3"])
        layers.append(t)
    final_norm = nn.LayerNorm(d).eval()
    _set_ln(final_norm, jax.tree.map(np.asarray,
                                     params["mem_attn"]["norm"]))

    S = g * g
    x = _t(feat).reshape(1, S, d) + 0.1 * _t(feat_pos).reshape(1, S, d)
    memory = torch.cat([_t(mem).reshape(1, M * S, md),
                        _t(ptr_tok)[None]], dim=1)
    pos = torch.cat([_t(mem_pos).reshape(1, M * S, md),
                     torch.zeros(1, n_ptr_tok, md)], dim=1)
    with torch.no_grad():
        for t in layers:
            x = t(x, memory, pos, None, num_k_exclude_rope=n_ptr_tok)
        want = final_norm(x).reshape(g, g, d).numpy()
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_memory_encoder_matches_torch():
    cfg = S2.tiny_sam2_config()
    params = S2.sam2_init(jax.random.PRNGKey(0), cfg)
    g = cfg.image_size // 16
    d, md = cfg.dim, cfg.mem_dim
    feat = jax.random.normal(jax.random.PRNGKey(1), (g, g, d))
    mask = jax.random.normal(jax.random.PRNGKey(2),
                             (cfg.image_size, cfg.image_size)) * 5

    got = np.asarray(S2.encode_memory(params, cfg, feat, mask))

    me = jax.tree.map(np.asarray, params["mem_enc"])
    tmod = TorchMemoryEncoder(d, md).eval()
    convs = [m for m in tmod.mask_down if isinstance(m, nn.Conv2d)]
    lns = [m for m in tmod.mask_down if isinstance(m, TorchLayerNorm2d)]
    for i, c in enumerate(convs):
        _set_conv(c, me["mask_down"][i])
    for i, n in enumerate(lns):
        _set_ln(n, me["mask_down_ln"][i])
    _set_conv(tmod.pix_proj, me["pix_proj"])
    for i, blk in enumerate(tmod.blocks):
        fb = me["fuser"][i]
        with torch.no_grad():
            blk["dwconv"].weight.copy_(
                _t(fb["dwconv"]["kernel"]).permute(3, 2, 0, 1))
            blk["dwconv"].bias.copy_(_t(fb["dwconv"]["bias"]))
        _set_ln(blk["norm"], fb["norm"])
        _set_linear(blk["pw1"], fb["pw1"])
        _set_linear(blk["pw2"], fb["pw2"])
        with torch.no_grad():
            blk.gamma.copy_(_t(fb["gamma"]))
    _set_conv(tmod.out_proj, me["out_proj"])

    with torch.no_grad():
        want = tmod(_t(feat)[None].permute(0, 3, 1, 2),
                    _t(mask)[None, None]).permute(0, 2, 3, 1)[0].numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


class TorchMultiScaleBlock(nn.Module):
    """hieradet.py:86-170 MultiScaleBlock semantics (windowed attention,
    q pooling at stage transitions, lagged window size handled by the
    caller via `window_size`)."""

    def __init__(self, dim, dim_out, heads, window_size, q_pool):
        super().__init__()
        self.dim, self.dim_out = dim, dim_out
        self.heads = heads
        self.window_size = window_size
        self.pool = nn.MaxPool2d(2, 2) if q_pool else None
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, dim_out * 3)
        self.proj_attn = nn.Linear(dim_out, dim_out)
        self.norm2 = nn.LayerNorm(dim_out, eps=1e-6)
        self.fc1 = nn.Linear(dim_out, dim_out * 4)
        self.fc2 = nn.Linear(dim_out * 4, dim_out)
        if dim != dim_out:
            self.proj = nn.Linear(dim, dim_out)

    def _attn(self, x):
        B, H, W, _ = x.shape
        qkv = self.qkv(x).reshape(B, H * W, 3, self.heads, -1)
        q, k, v = torch.unbind(qkv, 2)
        if self.pool is not None:
            q = q.reshape(B, H, W, -1).permute(0, 3, 1, 2)
            q = self.pool(q).permute(0, 2, 3, 1)
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, self.heads, -1)
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        out = out.transpose(1, 2).reshape(B, H, W, -1)
        return self.proj_attn(out)

    @staticmethod
    def _win_part(x, ws):
        B, H, W, C = x.shape
        ph, pw = (-H) % ws, (-W) % ws
        if ph or pw:
            x = F.pad(x, (0, 0, 0, pw, 0, ph))
        Hp, Wp = H + ph, W + pw
        x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
        return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C),
                (Hp, Wp))

    @staticmethod
    def _win_unpart(x, ws, pad_hw, hw):
        Hp, Wp = pad_hw
        H, W = hw
        B = x.shape[0] // (Hp * Wp // ws // ws)
        x = x.view(B, Hp // ws, Wp // ws, ws, ws, -1)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
        return x[:, :H, :W]

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.dim != self.dim_out:
            sc = self.proj(x)
            sc = sc.permute(0, 3, 1, 2)
            sc = self.pool(sc).permute(0, 2, 3, 1)
            shortcut = sc
        ws = self.window_size
        if ws > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = self._win_part(x, ws)
        x = self._attn(x)
        if self.pool is not None:
            ws = self.window_size // 2
            H, W = shortcut.shape[1:3]
            pad_hw = (H + (-H) % ws, W + (-W) % ws)
        if self.window_size > 0:
            x = self._win_unpart(x, ws, pad_hw, (H, W))
        x = shortcut + x
        return x + self.fc2(F.gelu(self.fc1(self.norm2(x))))


@pytest.mark.parametrize("q_pool,window", [(False, 2), (True, 2),
                                           (False, 0)])
def test_hiera_block_matches_torch(q_pool, window):
    cfg = HI.tiny_hiera_config()
    din, heads = 8, 2
    dout = din * 2 if q_pool else din
    g = 8
    key = jax.random.PRNGKey(0)
    blk = {
        "ln1": L.layer_norm_init(din),
        "qkv": L.linear_init(jax.random.PRNGKey(1), din, 3 * dout),
        "proj_attn": L.linear_init(jax.random.PRNGKey(2), dout, dout),
        "ln2": L.layer_norm_init(dout),
        "fc1": L.linear_init(jax.random.PRNGKey(3), dout, dout * 4),
        "fc2": L.linear_init(jax.random.PRNGKey(4), dout * 4, dout),
    }
    # give norms non-trivial params
    blk["ln1"] = {"scale": jnp.ones(din) * 1.3, "bias": jnp.ones(din) * .1}
    if q_pool:
        blk["proj"] = L.linear_init(jax.random.PRNGKey(5), din, dout)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, g, g, din))

    # run our block body by building a one-block hiera-style pass
    import dataclasses
    tokens = x.reshape(2, g * g, din)
    y = L.layer_norm(blk["ln1"], tokens, 1e-6)
    from mimo_tpu.decomp.vit import _window_partition, _window_unpartition
    if q_pool:
        shortcut = L.linear(blk["proj"], y)
        shortcut = HI._maxpool2(shortcut.reshape(2, g, g, dout))
        shortcut = shortcut.reshape(2, -1, dout)
    else:
        shortcut = tokens
    if window and not q_pool:
        yw, padded = _window_partition(y, g, g, window)
        aw, _, _ = HI._attn(blk, yw, heads, dout, False, window, window)
        a = _window_unpartition(aw, 2, g, g, window, padded)
        oh = ow = g
    elif window and q_pool:
        yw, (Hp, Wp) = _window_partition(y, g, g, window)
        aw, _, _ = HI._attn(blk, yw, heads, dout, True, window, window)
        oh, ow = g // 2, g // 2
        a = _window_unpartition(aw, 2, oh, ow, window // 2,
                                (Hp // 2, Wp // 2))
    else:
        a, oh, ow = HI._attn(blk, y, heads, dout, q_pool, g, g)
    t2 = shortcut + a
    y2 = L.layer_norm(blk["ln2"], t2, 1e-6)
    got = t2 + L.linear(blk["fc2"], jax.nn.gelu(
        L.linear(blk["fc1"], y2).astype(jnp.float32), approximate=False))
    got = np.asarray(got).reshape(2, oh, ow, dout)

    tmod = TorchMultiScaleBlock(din, dout, heads, window, q_pool).eval()
    bn = jax.tree.map(np.asarray, blk)
    _set_ln(tmod.norm1, bn["ln1"])
    _set_linear(tmod.qkv, bn["qkv"])
    _set_linear(tmod.proj_attn, bn["proj_attn"])
    _set_ln(tmod.norm2, bn["ln2"])
    _set_linear(tmod.fc1, bn["fc1"])
    _set_linear(tmod.fc2, bn["fc2"])
    if q_pool:
        _set_linear(tmod.proj, bn["proj"])
    with torch.no_grad():
        want = tmod(_t(x)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)

"""HMR2/HaMeR head + ViTPose-style backbone activation parity vs minimal
torch re-declarations of hmr2/models/components/pose_transformer.py and
models/backbones/vit.py semantics (no reference code copied)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mimo_tpu.decomp import hmr as HM
from mimo_tpu.decomp import vit as V
from mimo_tpu.models import layers as L


def _t(x):
    return torch.tensor(np.asarray(x))


def _set_linear(mod, p, bias=True):
    with torch.no_grad():
        mod.weight.copy_(_t(p["kernel"]).T)
        if bias and mod.bias is not None:
            mod.bias.copy_(_t(p["bias"]))


def _set_ln(mod, p):
    with torch.no_grad():
        mod.weight.copy_(_t(p["scale"]))
        mod.bias.copy_(_t(p["bias"]))


class TorchHeadLayer(nn.Module):
    """One TransformerCrossAttn layer (pose_transformer.py:127-206):
    PreNorm(self-attn) + PreNorm(cross-attn) + PreNorm(FeedForward), all
    residual; attention inner dim = heads*dim_head with bias-free packed
    projections and biased output projections."""

    def __init__(self, dim, ctx_dim, heads, dim_head, mlp_dim):
        super().__init__()
        inner = heads * dim_head
        self.h, self.dh = heads, dim_head
        self.n1 = nn.LayerNorm(dim)
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.sa_out = nn.Linear(inner, dim)
        self.n2 = nn.LayerNorm(dim)
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(ctx_dim, inner * 2, bias=False)
        self.ca_out = nn.Linear(inner, dim)
        self.n3 = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, mlp_dim)
        self.fc2 = nn.Linear(mlp_dim, dim)

    def _attn(self, q, k, v):
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.view(b, n, self.h, self.dh).transpose(1, 2)
        k = k.view(b, m, self.h, self.dh).transpose(1, 2)
        v = v.view(b, m, self.h, self.dh).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) * self.dh ** -0.5, -1)
        return (a @ v).transpose(1, 2).reshape(b, n, -1)

    def forward(self, x, ctx):
        y = self.n1(x)
        qkv = self.to_qkv(y).chunk(3, dim=-1)
        x = x + self.sa_out(self._attn(*qkv))
        y = self.n2(x)
        kv = self.to_kv(ctx).chunk(2, dim=-1)
        x = x + self.ca_out(self._attn(self.to_q(y), *kv))
        y = self.n3(x)
        return x + self.fc2(F.gelu(self.fc1(y)))


def test_hmr_head_matches_torch():
    cfg = HM.tiny_hmr_config()
    params = HM.hmr_init(jax.random.PRNGKey(0), cfg)
    B, S = 2, 7
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, S, cfg.backbone.dim))

    # run our head body only (bypass the backbone): replicate hmr_forward
    pose = jnp.broadcast_to(params["mean_pose"][None],
                            (B, cfg.num_joints * 6))
    betas = jnp.broadcast_to(params["mean_betas"][None], (B, cfg.num_betas))
    cam = jnp.broadcast_to(params["mean_cam"][None], (B, 3))
    got_list = []
    for _ in range(cfg.ief_iters):
        tok_in = jnp.concatenate([pose, betas, cam], axis=-1)[:, None]
        token = L.linear(params["token_embed"], tok_in)
        token = token + params["pos_embed"][None]
        for blk in params["layers"]:
            y = L.layer_norm(blk["ln1"], token)
            token = token + HM._head_attn(y, None, blk["qkv"], None,
                                          blk["attn_out"], cfg.head_heads,
                                          cfg.head_dim_head)
            y = L.layer_norm(blk["ln2"], token)
            token = token + HM._head_attn(y, ctx, blk["to_q"],
                                          blk["to_kv"], blk["cross_out"],
                                          cfg.head_heads, cfg.head_dim_head)
            y = L.layer_norm(blk["ln3"], token)
            h = jax.nn.gelu(L.linear(blk["fc1"], y).astype(jnp.float32),
                            approximate=False)
            token = token + L.linear(blk["fc2"], h)
        feat = token[:, 0]
        pose = pose + L.linear(params["dec_pose"], feat)
        betas = betas + L.linear(params["dec_betas"], feat)
        cam = cam + L.linear(params["dec_cam"], feat)
        got_list.append((np.asarray(pose), np.asarray(betas),
                         np.asarray(cam)))

    # torch re-declaration
    tok_embed = nn.Linear(cfg.num_joints * 6 + cfg.num_betas + 3,
                          cfg.head_dim)
    _set_linear(tok_embed, jax.tree.map(np.asarray, params["token_embed"]))
    layers = []
    for blk in params["layers"]:
        t = TorchHeadLayer(cfg.head_dim, cfg.backbone.dim, cfg.head_heads,
                           cfg.head_dim_head, cfg.mlp_dim).eval()
        bn = jax.tree.map(np.asarray, blk)
        _set_ln(t.n1, bn["ln1"])
        _set_linear(t.to_qkv, bn["qkv"], bias=False)
        _set_linear(t.sa_out, bn["attn_out"])
        _set_ln(t.n2, bn["ln2"])
        _set_linear(t.to_q, bn["to_q"], bias=False)
        _set_linear(t.to_kv, bn["to_kv"], bias=False)
        _set_linear(t.ca_out, bn["cross_out"])
        _set_ln(t.n3, bn["ln3"])
        _set_linear(t.fc1, bn["fc1"])
        _set_linear(t.fc2, bn["fc2"])
        layers.append(t)
    decpose = nn.Linear(cfg.head_dim, cfg.num_joints * 6)
    decshape = nn.Linear(cfg.head_dim, cfg.num_betas)
    deccam = nn.Linear(cfg.head_dim, 3)
    _set_linear(decpose, jax.tree.map(np.asarray, params["dec_pose"]))
    _set_linear(decshape, jax.tree.map(np.asarray, params["dec_betas"]))
    _set_linear(deccam, jax.tree.map(np.asarray, params["dec_cam"]))

    ctx_t = _t(ctx)
    pose_t = _t(params["mean_pose"]).expand(B, -1).clone()
    betas_t = _t(params["mean_betas"]).expand(B, -1).clone()
    cam_t = _t(params["mean_cam"]).expand(B, -1).clone()
    pe = _t(params["pos_embed"])[None]
    with torch.no_grad():
        for it in range(cfg.ief_iters):
            token = tok_embed(torch.cat([pose_t, betas_t, cam_t],
                                        -1)[:, None])
            token = token + pe
            for t in layers:
                token = t(token, ctx_t)
            feat = token[:, 0]
            pose_t = pose_t + decpose(feat)
            betas_t = betas_t + decshape(feat)
            cam_t = cam_t + deccam(feat)
            gp, gb, gc = got_list[it]
            np.testing.assert_allclose(gp, pose_t.numpy(), atol=2e-5)
            np.testing.assert_allclose(gb, betas_t.numpy(), atol=2e-5)
            np.testing.assert_allclose(gc, cam_t.numpy(), atol=2e-5)


def test_vitpose_backbone_quirks_match_torch():
    """Patch conv padding=4 and the cls-slot pos embed added to all tokens
    (ViTPose vit.py:157,320)."""
    cfg = V.ViTConfig(img_size=(32, 32), patch_size=16, dim=16, depth=1,
                      num_heads=2, use_cls_token=False, patch_padding=4,
                      cls_pos_to_all=True)
    p = V.vit_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    got = np.asarray(V.vit_apply(p, cfg, x))

    gh, gw = cfg.grid
    assert (gh, gw) == (2, 2)   # (32 + 8 - 16)//16 + 1
    pn = jax.tree.map(np.asarray, p)
    conv = nn.Conv2d(3, 16, 16, stride=16, padding=4)
    with torch.no_grad():
        conv.weight.copy_(_t(pn["patch_embed"]["kernel"]).permute(3, 2, 0, 1))
        conv.bias.copy_(_t(pn["patch_embed"]["bias"]))
    blk = pn["blocks"][0]
    n1, n2 = nn.LayerNorm(16, eps=1e-6), nn.LayerNorm(16, eps=1e-6)
    qkv = nn.Linear(16, 48)
    proj = nn.Linear(16, 16)
    fc1, fc2 = nn.Linear(16, 64), nn.Linear(64, 16)
    lnf = nn.LayerNorm(16, eps=1e-6)
    _set_ln(n1, blk["ln1"]); _set_linear(qkv, blk["qkv"])
    _set_linear(proj, blk["proj"]); _set_ln(n2, blk["ln2"])
    _set_linear(fc1, blk["fc1"]); _set_linear(fc2, blk["fc2"])
    _set_ln(lnf, pn["ln_out"])
    with torch.no_grad():
        h = conv(_t(x).permute(0, 3, 1, 2))
        tok = h.flatten(2).transpose(1, 2)
        pe = _t(pn["pos_embed"])[None]
        tok = tok + pe[:, 1:] + pe[:, :1]
        y = n1(tok)
        q, k, v = qkv(y).chunk(3, -1)
        q = q.view(1, -1, 2, 8).transpose(1, 2)
        k = k.view(1, -1, 2, 8).transpose(1, 2)
        v = v.view(1, -1, 2, 8).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) * 8 ** -0.5, -1)
        o = (a @ v).transpose(1, 2).reshape(1, -1, 16)
        tok = tok + proj(o)
        tok = tok + fc2(F.gelu(fc1(n2(tok))))
        want = lnf(tok).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)

"""Decomp converter tests: synthesize checkpoints with published naming from
our tiny param trees (inverse mapping), convert, require exact equality;
plus the deconv transform parity vs torch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_tpu.decomp import sam as SAM
from mimo_tpu.decomp import vitpose as VP
from mimo_tpu.weights import convert_decomp as WD
from tests.test_convert import _trees_equal, _emit_linear, _emit_norm


def _inv_conv(p):
    return np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))


def _inv_deconv(p):
    k = np.asarray(p["kernel"])[::-1, ::-1]  # unflip
    return np.transpose(k, (2, 3, 0, 1))     # HWIO -> (in, out, kh, kw)


def _emit_conv(sd, prefix, p, bias=True):
    sd[prefix + ".weight"] = _inv_conv(p)
    if bias and "bias" in p:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


def _emit_deconv(sd, prefix, p):
    sd[prefix + ".weight"] = _inv_deconv(p)
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _emit_vit_block(sd, prefix, blk, mlp=("mlp.lin1", "mlp.lin2")):
    _emit_norm(sd, f"{prefix}.norm1", blk["ln1"])
    _emit_linear(sd, f"{prefix}.attn.qkv", blk["qkv"])
    _emit_linear(sd, f"{prefix}.attn.proj", blk["proj"])
    _emit_norm(sd, f"{prefix}.norm2", blk["ln2"])
    _emit_linear(sd, f"{prefix}.{mlp[0]}", blk["fc1"])
    _emit_linear(sd, f"{prefix}.{mlp[1]}", blk["fc2"])
    if "rel_pos_h" in blk:
        sd[f"{prefix}.attn.rel_pos_h"] = np.asarray(blk["rel_pos_h"])
        sd[f"{prefix}.attn.rel_pos_w"] = np.asarray(blk["rel_pos_w"])


def _emit_sam_attn(sd, prefix, p):
    _emit_linear(sd, f"{prefix}.q_proj", p["to_q"])
    _emit_linear(sd, f"{prefix}.k_proj", p["to_k"])
    _emit_linear(sd, f"{prefix}.v_proj", p["to_v"])
    _emit_linear(sd, f"{prefix}.out_proj", p["to_out"])


def _emit_mlp3(sd, prefix, p):
    _emit_linear(sd, f"{prefix}.layers.0", p["fc1"])
    _emit_linear(sd, f"{prefix}.layers.1", p["fc2"])
    _emit_linear(sd, f"{prefix}.layers.2", p["fc3"])


def test_sam_converter_roundtrip():
    cfg = SAM.tiny_sam_config()
    params = jax.tree.map(np.asarray,
                          SAM.sam_init(jax.random.PRNGKey(0), cfg))
    g = cfg.encoder.img_size[0] // cfg.encoder.patch_size
    sd = {}
    enc = params["encoder"]
    _emit_conv(sd, "image_encoder.patch_embed.proj", enc["patch_embed"])
    sd["image_encoder.pos_embed"] = enc["pos_embed"].reshape(
        1, g, g, cfg.encoder.dim)
    for i, blk in enumerate(enc["blocks"]):
        _emit_vit_block(sd, f"image_encoder.blocks.{i}", blk)
    _emit_conv(sd, "image_encoder.neck.0", params["neck_conv1"], bias=False)
    _emit_norm(sd, "image_encoder.neck.1", params["neck_ln1"])
    _emit_conv(sd, "image_encoder.neck.2", params["neck_conv2"], bias=False)
    _emit_norm(sd, "image_encoder.neck.3", params["neck_ln2"])
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = \
        np.asarray(params["pe_gaussian"])
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = \
            np.asarray(params["point_embed"][i])[None]
    sd["prompt_encoder.not_a_point_embed.weight"] = \
        np.asarray(params["not_a_point"])[None]
    sd["prompt_encoder.no_mask_embed.weight"] = \
        np.asarray(params["no_mask_embed"])[None]
    sd["mask_decoder.iou_token.weight"] = np.asarray(params["iou_token"])[None]
    sd["mask_decoder.mask_tokens.weight"] = np.asarray(params["mask_tokens"])
    for i, blk in enumerate(params["decoder"]):
        lp = f"mask_decoder.transformer.layers.{i}"
        _emit_sam_attn(sd, f"{lp}.self_attn", blk["self_attn"])
        _emit_norm(sd, f"{lp}.norm1", blk["ln1"])
        _emit_sam_attn(sd, f"{lp}.cross_attn_token_to_image", blk["t2i"])
        _emit_norm(sd, f"{lp}.norm2", blk["ln2"])
        _emit_linear(sd, f"{lp}.mlp.lin1", blk["mlp_fc1"])
        _emit_linear(sd, f"{lp}.mlp.lin2", blk["mlp_fc2"])
        _emit_norm(sd, f"{lp}.norm3", blk["ln3"])
        _emit_sam_attn(sd, f"{lp}.cross_attn_image_to_token", blk["i2t"])
        _emit_norm(sd, f"{lp}.norm4", blk["ln4"])
    _emit_sam_attn(sd, "mask_decoder.transformer.final_attn_token_to_image",
                   params["final_attn"])
    _emit_norm(sd, "mask_decoder.transformer.norm_final_attn",
               params["final_ln"])
    _emit_deconv(sd, "mask_decoder.output_upscaling.0", params["up1"])
    _emit_norm(sd, "mask_decoder.output_upscaling.1", params["up_ln"])
    _emit_deconv(sd, "mask_decoder.output_upscaling.3", params["up2"])
    for i, m in enumerate(params["mask_mlps"]):
        _emit_mlp3(sd, f"mask_decoder.output_hypernetworks_mlps.{i}", m)
    _emit_mlp3(sd, "mask_decoder.iou_prediction_head", params["iou_mlp"])

    got = WD.convert_sam(sd, cfg)
    _trees_equal(got, params)


def test_vitpose_converter_roundtrip():
    cfg = VP.tiny_vitpose_config()
    params = jax.tree.map(np.asarray,
                          VP.vitpose_init(jax.random.PRNGKey(0), cfg))
    sd = {}
    bb = params["backbone"]
    _emit_conv(sd, "backbone.patch_embed.proj", bb["patch_embed"])
    sd["backbone.pos_embed"] = bb["pos_embed"][None]
    for i, blk in enumerate(bb["blocks"]):
        _emit_vit_block(sd, f"backbone.blocks.{i}",
                        blk, mlp=("mlp.fc1", "mlp.fc2"))
    _emit_norm(sd, "backbone.last_norm", bb["ln_out"])
    for i, dc in enumerate(params["deconvs"]):
        _emit_deconv(sd, f"keypoint_head.deconv_layers.{3 * i}",
                     dc["deconv"])
        base = f"keypoint_head.deconv_layers.{3 * i + 1}"
        sd[base + ".weight"] = np.asarray(dc["bn_scale"])
        sd[base + ".bias"] = np.asarray(dc["bn_bias"])
        sd[base + ".running_mean"] = np.asarray(dc["bn_mean"])
        sd[base + ".running_var"] = np.asarray(dc["bn_var"])
    _emit_conv(sd, "keypoint_head.final_layer", params["final"])

    got = WD.convert_vitpose(sd, cfg)
    _trees_equal(got, params)


def test_deconv_transform_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 2, 2, 2)).astype(np.float32)  # (I,O,kh,kw)
    x = rng.standard_normal((1, 4, 5, 3)).astype(np.float32)
    want = torch.nn.functional.conv_transpose2d(
        torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(w),
        stride=2).permute(0, 2, 3, 1).numpy()
    k = WD._t_deconv(w)
    got = jax.lax.conv_transpose(
        jnp.asarray(x), jnp.asarray(k), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_raft_converter_roundtrip():
    from mimo_tpu.decomp import raft as R
    cfg = R.tiny_raft_config()
    params = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x,
        R.raft_init(jax.random.PRNGKey(0), cfg))
    sd = {}

    rng = np.random.default_rng(7)
    bn_expect = {}  # emitted BN stats -> expected folded affine, by prefix

    def emit_bn(prefix, c):
        w = rng.standard_normal(c).astype(np.float32) + 1.0
        b = rng.standard_normal(c).astype(np.float32)
        rm = rng.standard_normal(c).astype(np.float32)
        rv = (rng.random(c).astype(np.float32) + 0.5)
        sd[f"{prefix}.weight"] = w
        sd[f"{prefix}.bias"] = b
        sd[f"{prefix}.running_mean"] = rm
        sd[f"{prefix}.running_var"] = rv
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(100, np.int64)
        scale = w / np.sqrt(rv + 1e-5)
        bn_expect[prefix] = {"scale": scale, "bias": b - rm * scale}

    def emit_enc(prefix, enc, norm_fn):
        _emit_conv(sd, f"module.{prefix}.conv1", enc["stem"])
        if norm_fn == "batch":
            emit_bn(f"module.{prefix}.norm1", enc["stem_n"]["scale"].shape[0])
        for li, layer in enumerate(("layer1", "layer2", "layer3"), 1):
            for bi, blk in enumerate(enc[layer]):
                bp = f"module.{prefix}.{layer}.{bi}"
                _emit_conv(sd, f"{bp}.conv1", blk["conv1"])
                _emit_conv(sd, f"{bp}.conv2", blk["conv2"])
                if norm_fn == "batch":
                    c = blk["n1"]["scale"].shape[0]
                    emit_bn(f"{bp}.norm1", c)
                    emit_bn(f"{bp}.norm2", c)
                if "down" in blk:
                    _emit_conv(sd, f"{bp}.downsample.0", blk["down"])
                    if norm_fn == "batch":
                        emit_bn(f"{bp}.norm3", blk["dn"]["scale"].shape[0])
        _emit_conv(sd, f"module.{prefix}.conv2", enc["head"])

    emit_enc("fnet", params["fnet"], "instance")
    emit_enc("cnet", params["cnet"], "batch")
    u = params["update"]
    _emit_conv(sd, "module.update_block.encoder.convc1", u["mc1"])
    _emit_conv(sd, "module.update_block.encoder.convc2", u["mc2"])
    _emit_conv(sd, "module.update_block.encoder.convf1", u["mf1"])
    _emit_conv(sd, "module.update_block.encoder.convf2", u["mf2"])
    _emit_conv(sd, "module.update_block.encoder.conv", u["mout"])
    for k_ours, k_ref in (("z1", "convz1"), ("r1", "convr1"),
                          ("q1", "convq1"), ("z2", "convz2"),
                          ("r2", "convr2"), ("q2", "convq2")):
        _emit_conv(sd, f"module.update_block.gru.{k_ref}", u["gru"][k_ours])
    _emit_conv(sd, "module.update_block.flow_head.conv1", u["fh1"])
    _emit_conv(sd, "module.update_block.flow_head.conv2", u["fh2"])
    _emit_conv(sd, "module.update_block.mask.0", u["up1"])
    _emit_conv(sd, "module.update_block.mask.2", u["up2"])

    got = WD.convert_raft(sd, cfg)
    import copy
    want = copy.deepcopy(params)

    # fnet: affine=False instance norms convert to identity params
    enc = want["fnet"]
    enc["stem_n"] = {"scale": np.ones_like(enc["stem_n"]["scale"]),
                     "bias": np.zeros_like(enc["stem_n"]["bias"])}
    for layer in ("layer1", "layer2", "layer3"):
        for blk in enc[layer]:
            for nk in ("n1", "n2", "dn"):
                if nk in blk:
                    blk[nk] = {"scale": np.ones_like(blk[nk]["scale"]),
                               "bias": np.zeros_like(blk[nk]["bias"])}

    # cnet: eval-mode BatchNorm folds into a fixed affine
    enc = want["cnet"]
    enc["stem_n"] = bn_expect["module.cnet.norm1"]
    for layer in ("layer1", "layer2", "layer3"):
        for bi, blk in enumerate(enc[layer]):
            bp = f"module.cnet.{layer}.{bi}"
            blk["n1"] = bn_expect[f"{bp}.norm1"]
            blk["n2"] = bn_expect[f"{bp}.norm2"]
            if "dn" in blk:
                blk["dn"] = bn_expect[f"{bp}.norm3"]
    _trees_equal(got, want)


def test_raft_folded_bn_matches_torch_eval_batchnorm():
    """The folded affine applied by decomp.raft kind='affine' must equal
    torch eval-mode BatchNorm2d on the same stats."""
    import torch
    from mimo_tpu.decomp import raft as R
    rng = np.random.default_rng(3)
    c = 6
    w = rng.standard_normal(c).astype(np.float32) + 1.0
    b = rng.standard_normal(c).astype(np.float32)
    rm = rng.standard_normal(c).astype(np.float32)
    rv = (rng.random(c).astype(np.float32) + 0.5)
    x = rng.standard_normal((2, 5, 4, c)).astype(np.float32)

    bn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(w))
        bn.bias.copy_(torch.tensor(b))
        bn.running_mean.copy_(torch.tensor(rm))
        bn.running_var.copy_(torch.tensor(rv))
        want = bn(torch.tensor(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()

    scale = w / np.sqrt(rv + 1e-5)
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(b - rm * scale)}
    got = np.asarray(R._norm(p, jnp.asarray(x), "affine"))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sam2_converter_roundtrip():
    """Inverse-emit a synthetic sam2.1 checkpoint from our tiny tree, run
    convert_sam2, require exact equality (the converter key map is then a
    bijection onto the published naming)."""
    from mimo_tpu.decomp import sam2 as S2
    cfg = S2.tiny_sam2_config()
    params = jax.tree.map(np.asarray, S2.sam2_init(jax.random.PRNGKey(0),
                                                   cfg))
    sd = {}

    def emit_rope_attn(prefix, p):
        _emit_linear(sd, f"{prefix}.q_proj", p["q"])
        _emit_linear(sd, f"{prefix}.k_proj", p["k"])
        _emit_linear(sd, f"{prefix}.v_proj", p["v"])
        _emit_linear(sd, f"{prefix}.out_proj", p["out"])

    # trunk
    tk = "image_encoder.trunk"
    _emit_conv(sd, f"{tk}.patch_embed.proj", params["trunk"]["patch_embed"])
    sd[f"{tk}.pos_embed"] = np.transpose(
        params["trunk"]["pos_bkg"], (2, 0, 1))[None]
    sd[f"{tk}.pos_embed_window"] = np.transpose(
        params["trunk"]["pos_win"], (2, 0, 1))[None]
    for i, blk in enumerate(params["trunk"]["blocks"]):
        bp = f"{tk}.blocks.{i}"
        _emit_norm(sd, f"{bp}.norm1", blk["ln1"])
        _emit_linear(sd, f"{bp}.attn.qkv", blk["qkv"])
        _emit_linear(sd, f"{bp}.attn.proj", blk["proj_attn"])
        _emit_norm(sd, f"{bp}.norm2", blk["ln2"])
        _emit_linear(sd, f"{bp}.mlp.layers.0", blk["fc1"])
        _emit_linear(sd, f"{bp}.mlp.layers.1", blk["fc2"])
        if "proj" in blk:
            _emit_linear(sd, f"{bp}.proj", blk["proj"])
    for i, nc in enumerate(params["trunk"]["neck"]):
        _emit_conv(sd, f"image_encoder.neck.convs.{i}.conv", nc)

    # memory attention
    for i, lyr in enumerate(params["mem_attn"]["layers"]):
        lp = f"memory_attention.layers.{i}"
        emit_rope_attn(f"{lp}.self_attn", lyr["self"])
        emit_rope_attn(f"{lp}.cross_attn_image", lyr["cross"])
        _emit_linear(sd, f"{lp}.linear1", lyr["lin1"])
        _emit_linear(sd, f"{lp}.linear2", lyr["lin2"])
        for n in (1, 2, 3):
            _emit_norm(sd, f"{lp}.norm{n}", lyr[f"norm{n}"])
    _emit_norm(sd, "memory_attention.norm", params["mem_attn"]["norm"])

    # memory encoder
    me = params["mem_enc"]
    for i in range(4):
        _emit_conv(sd, f"memory_encoder.mask_downsampler.encoder.{3 * i}",
                   me["mask_down"][i])
        _emit_norm(sd, f"memory_encoder.mask_downsampler.encoder.{3 * i + 1}",
                   me["mask_down_ln"][i])
    _emit_conv(sd, "memory_encoder.mask_downsampler.encoder.12",
               me["mask_down"][4])
    _emit_conv(sd, "memory_encoder.pix_feat_proj", me["pix_proj"])
    for i, fb in enumerate(me["fuser"]):
        fp = f"memory_encoder.fuser.layers.{i}"
        _emit_conv(sd, f"{fp}.dwconv", fb["dwconv"])
        _emit_norm(sd, f"{fp}.norm", fb["norm"])
        _emit_linear(sd, f"{fp}.pwconv1", fb["pw1"])
        _emit_linear(sd, f"{fp}.pwconv2", fb["pw2"])
        sd[f"{fp}.gamma"] = np.asarray(fb["gamma"])
    _emit_conv(sd, "memory_encoder.out_proj", me["out_proj"])

    # top-level
    sd["maskmem_tpos_enc"] = params["maskmem_tpos_enc"][:, None, None, :]
    sd["no_mem_embed"] = params["no_mem_embed"][None, None]
    sd["no_mem_pos_enc"] = params["no_mem_pos_enc"][None, None]
    sd["no_obj_ptr"] = params["no_obj_ptr"][None]
    _emit_mlp3(sd, "obj_ptr_proj", params["obj_ptr_proj"])

    # prompt encoder
    pr = params["prompt"]
    pe = "sam_prompt_encoder"
    sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"] = \
        np.asarray(pr["pe_gaussian"])
    for i in range(4):
        sd[f"{pe}.point_embeddings.{i}.weight"] = pr["point_embed"][i][None]
    sd[f"{pe}.not_a_point_embed.weight"] = pr["not_a_point"][None]
    sd[f"{pe}.no_mask_embed.weight"] = pr["no_mask_embed"][None]
    for i, idx in enumerate((0, 3, 6)):
        _emit_conv(sd, f"{pe}.mask_downscaling.{idx}", pr["mask_down"][i])
    for i, idx in enumerate((1, 4)):
        _emit_norm(sd, f"{pe}.mask_downscaling.{idx}", pr["mask_down_ln"][i])

    # mask decoder
    dd = params["decoder"]
    md = "sam_mask_decoder"
    sd[f"{md}.obj_score_token.weight"] = dd["obj_token"][None]
    sd[f"{md}.iou_token.weight"] = dd["iou_token"][None]
    sd[f"{md}.mask_tokens.weight"] = np.asarray(dd["mask_tokens"])
    for i, blk in enumerate(dd["transformer"]):
        lp = f"{md}.transformer.layers.{i}"
        _emit_sam_attn(sd, f"{lp}.self_attn", blk["self_attn"])
        _emit_sam_attn(sd, f"{lp}.cross_attn_token_to_image", blk["t2i"])
        _emit_sam_attn(sd, f"{lp}.cross_attn_image_to_token", blk["i2t"])
        _emit_linear(sd, f"{lp}.mlp.layers.0", blk["mlp_fc1"])
        _emit_linear(sd, f"{lp}.mlp.layers.1", blk["mlp_fc2"])
        for n in (1, 2, 3, 4):
            _emit_norm(sd, f"{lp}.norm{n}", blk[f"ln{n}"])
    _emit_sam_attn(sd, f"{md}.transformer.final_attn_token_to_image",
                   dd["final_attn"])
    _emit_norm(sd, f"{md}.transformer.norm_final_attn", dd["final_ln"])
    _emit_deconv(sd, f"{md}.output_upscaling.0", dd["up1"])
    _emit_norm(sd, f"{md}.output_upscaling.1", dd["up_ln"])
    _emit_deconv(sd, f"{md}.output_upscaling.3", dd["up2"])
    _emit_conv(sd, f"{md}.conv_s0", dd["conv_s0"])
    _emit_conv(sd, f"{md}.conv_s1", dd["conv_s1"])
    for i in range(cfg.num_mask_tokens):
        _emit_mlp3(sd, f"{md}.output_hypernetworks_mlps.{i}",
                   dd["mask_mlps"][i])
    _emit_mlp3(sd, f"{md}.iou_prediction_head", dd["iou_mlp"])
    _emit_mlp3(sd, f"{md}.pred_obj_score_head", dd["obj_mlp"])

    got = WD.convert_sam2({"model": sd}, cfg)
    _trees_equal(got, params)


def test_propainter_converter_roundtrip():
    from mimo_tpu.decomp import propainter as PP
    cfg = PP.tiny_propainter_config()
    params = jax.tree.map(np.asarray,
                          PP.propainter_init(jax.random.PRNGKey(0), cfg))

    def emit_conv3d_spatial(sd, prefix, p):
        k = np.transpose(p["kernel"], (3, 2, 0, 1))[:, :, None]  # O I 1 kh kw
        sd[prefix + ".weight"] = k
        if "bias" in p:
            sd[prefix + ".bias"] = p["bias"]

    def emit_conv3d_temporal(sd, prefix, p):
        k = np.transpose(p["kernel"], (2, 1, 0))[:, :, :, None, None]
        sd[prefix + ".weight"] = k
        sd[prefix + ".bias"] = p["bias"]

    def emit_p3d(sd, prefix, p):
        emit_conv3d_spatial(sd, f"{prefix}.conv1.0", p["spatial"])
        emit_conv3d_temporal(sd, f"{prefix}.conv2.0", p["temporal"])

    def emit_align(sd, prefix, p):
        for i, ck in zip((0, 2, 4, 6), ("c1", "c2", "c3", "c4")):
            _emit_conv(sd, f"{prefix}.conv_offset.{i}", p["offset"][ck])
        sd[prefix + ".weight"] = _inv_conv(p)
        sd[prefix + ".bias"] = np.asarray(p["bias"])

    # ---- flow completion net ----
    fsd = {}
    fl = params["flow"]
    emit_conv3d_spatial(fsd, "downsample.0", fl["down"])
    emit_p3d(fsd, "encoder1.0", fl["enc1a"])
    emit_p3d(fsd, "encoder1.2", fl["enc1b"])
    emit_p3d(fsd, "encoder2.0", fl["enc2a"])
    emit_p3d(fsd, "encoder2.2", fl["enc2b"])
    for i in range(3):
        emit_conv3d_spatial(fsd, f"mid_dilation.{2 * i}", fl["mid"][i])
    pr = fl["prop"]
    emit_align(fsd, "feat_prop_module.deform_align.backward_",
               pr["align_bwd"])
    emit_align(fsd, "feat_prop_module.deform_align.forward_",
               pr["align_fwd"])
    for d, key in (("backward_", "backbone_bwd"), ("forward_",
                                                   "backbone_fwd")):
        _emit_conv(fsd, f"feat_prop_module.backbone.{d}0", pr[key][0])
        _emit_conv(fsd, f"feat_prop_module.backbone.{d}2", pr[key][1])
    # fix separator: reference keys are backbone.backward_.0
    for k in list(fsd):
        if ".backbone.backward_0" in k or ".backbone.forward_0" in k \
                or ".backbone.backward_2" in k or ".backbone.forward_2" in k:
            fsd[k.replace("_0", "_.0").replace("_2", "_.2")] = fsd.pop(k)
    _emit_conv(fsd, "feat_prop_module.fusion", pr["fusion"])
    _emit_conv(fsd, "decoder2.0", fl["dec2"][0])
    _emit_conv(fsd, "decoder2.2.conv", fl["dec2"][1])
    _emit_conv(fsd, "decoder1.0", fl["dec1"][0])
    _emit_conv(fsd, "decoder1.2.conv", fl["dec1"][1])
    _emit_conv(fsd, "upsample.0", fl["up"][0])
    _emit_conv(fsd, "upsample.2.conv", fl["up"][1])

    # ---- generator ----
    gsd = {}
    g = params["gen"]
    for i, conv in enumerate(g["enc"]):
        _emit_conv(gsd, f"encoder.layers.{2 * i}", conv)
    _emit_linear(gsd, "ss.embedding", g["ss"])
    _emit_linear(gsd, "sc.embedding", g["sc"])
    _emit_conv(gsd, "sc.bias_conv", g["sc_bias"])
    for i, blk in enumerate(g["blocks"]):
        tp = f"transformers.transformer.{i}"
        _emit_norm(gsd, f"{tp}.norm1", blk["ln1"])
        _emit_linear(gsd, f"{tp}.attention.query", blk["q"])
        _emit_linear(gsd, f"{tp}.attention.key", blk["k"])
        _emit_linear(gsd, f"{tp}.attention.value", blk["v"])
        _emit_linear(gsd, f"{tp}.attention.proj", blk["proj"])
        _emit_conv(gsd, f"{tp}.attention.pool_layer", blk["pool"])
        gsd[f"{tp}.attention.valid_ind_rolled"] = np.arange(3)
        _emit_norm(gsd, f"{tp}.norm2", blk["ln2"])
        _emit_linear(gsd, f"{tp}.mlp.fc1.0", blk["ff1"])
        _emit_linear(gsd, f"{tp}.mlp.fc2.1", blk["ff2"])
    emit_align(gsd, "feat_prop_module.deform_align.backward_1",
               g["align_bwd"])
    emit_align(gsd, "feat_prop_module.deform_align.forward_1",
               g["align_fwd"])
    for d, key in (("backward_1", "backbone_bwd"),
                   ("forward_1", "backbone_fwd")):
        _emit_conv(gsd, f"feat_prop_module.backbone.{d}.0", params["gen"][key][0])
        _emit_conv(gsd, f"feat_prop_module.backbone.{d}.2", params["gen"][key][1])
    _emit_conv(gsd, "feat_prop_module.fuse.0", g["fuse"][0])
    _emit_conv(gsd, "feat_prop_module.fuse.2", g["fuse"][1])
    _emit_conv(gsd, "decoder.0.conv", g["dec"][0])
    _emit_conv(gsd, "decoder.2", g["dec"][1])
    _emit_conv(gsd, "decoder.4.conv", g["dec"][2])
    _emit_conv(gsd, "decoder.6", g["dec"][3])

    got = WD.convert_propainter(gsd, fsd, cfg)
    _trees_equal(got, params)


def _emit_hmr_ckpt(params, cfg, head="smpl_head", pose_buf="init_body_pose"):
    sd = {}
    bb = params["backbone"]
    _emit_conv(sd, "backbone.patch_embed.proj", bb["patch_embed"])
    sd["backbone.pos_embed"] = bb["pos_embed"][None]
    for i, blk in enumerate(bb["blocks"]):
        _emit_vit_block(sd, f"backbone.blocks.{i}", blk,
                        mlp=("mlp.fc1", "mlp.fc2"))
    _emit_norm(sd, "backbone.last_norm", bb["ln_out"])

    tr = f"{head}.transformer"
    _emit_linear(sd, f"{tr}.to_token_embedding", params["token_embed"])
    sd[f"{tr}.pos_embedding"] = params["pos_embed"][None]
    for i, blk in enumerate(params["layers"]):
        lp = f"{tr}.transformer.layers.{i}"
        _emit_norm(sd, f"{lp}.0.norm", blk["ln1"])
        _emit_linear(sd, f"{lp}.0.fn.to_qkv", blk["qkv"])
        _emit_linear(sd, f"{lp}.0.fn.to_out.0", blk["attn_out"])
        _emit_norm(sd, f"{lp}.1.norm", blk["ln2"])
        _emit_linear(sd, f"{lp}.1.fn.to_q", blk["to_q"])
        _emit_linear(sd, f"{lp}.1.fn.to_kv", blk["to_kv"])
        _emit_linear(sd, f"{lp}.1.fn.to_out.0", blk["cross_out"])
        _emit_norm(sd, f"{lp}.2.norm", blk["ln3"])
        _emit_linear(sd, f"{lp}.2.fn.net.0", blk["fc1"])
        _emit_linear(sd, f"{lp}.2.fn.net.3", blk["fc2"])
    _emit_linear(sd, f"{head}.decpose", params["dec_pose"])
    _emit_linear(sd, f"{head}.decshape", params["dec_betas"])
    _emit_linear(sd, f"{head}.deccam", params["dec_cam"])
    sd[f"{head}.{pose_buf}"] = params["mean_pose"][None]
    sd[f"{head}.init_betas"] = params["mean_betas"][None]
    sd[f"{head}.init_cam"] = params["mean_cam"][None]
    # training-only keys the converter must ignore
    sd["discriminator.D_conv.weight"] = np.zeros((1,), np.float32)
    return sd


def test_hmr2_converter_roundtrip():
    from mimo_tpu.decomp import hmr as HM
    cfg = HM.tiny_hmr_config()
    params = jax.tree.map(np.asarray,
                          HM.hmr_init(jax.random.PRNGKey(0), cfg))
    sd = _emit_hmr_ckpt(params, cfg)
    got = WD.convert_hmr2(sd, cfg)
    _trees_equal(got, params)


def test_hamer_converter_roundtrip():
    from mimo_tpu.decomp import hmr as HM
    cfg = HM.tiny_hmr_config(num_joints=4)
    params = jax.tree.map(np.asarray,
                          HM.hmr_init(jax.random.PRNGKey(1), cfg))
    sd = _emit_hmr_ckpt(params, cfg, head="mano_head",
                        pose_buf="init_hand_pose")
    got = WD.convert_hamer(sd, cfg)
    _trees_equal(got, params)

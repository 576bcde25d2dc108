"""Weight-converter tests: synthesize a diffusers-style state dict from our
param tree (inverse mapping), convert it back, and require exact equality."""

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu import config as C
from mimo_tpu.models import unet as U
from mimo_tpu.models import vae as V
from mimo_tpu.models import pose_guider as PG
from mimo_tpu.models import clip_vision as CV
from mimo_tpu.weights import convert as W


def _inv_linear(p):  # ours (in,out) -> torch (out,in)
    return np.asarray(p["kernel"]).T


def _inv_conv(p):  # HWIO -> OIHW
    return np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))


def _emit_linear(sd, prefix, p):
    sd[prefix + ".weight"] = _inv_linear(p)
    if "bias" in p:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


def _emit_conv(sd, prefix, p):
    sd[prefix + ".weight"] = _inv_conv(p)
    if "bias" in p:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


def _emit_norm(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _emit_resnet(sd, prefix, p):
    _emit_norm(sd, f"{prefix}.norm1", p["norm1"])
    _emit_conv(sd, f"{prefix}.conv1", p["conv1"])
    _emit_norm(sd, f"{prefix}.norm2", p["norm2"])
    _emit_conv(sd, f"{prefix}.conv2", p["conv2"])
    if "temb_proj" in p:
        _emit_linear(sd, f"{prefix}.time_emb_proj", p["temb_proj"])
    if "shortcut" in p:
        _emit_conv(sd, f"{prefix}.conv_shortcut", p["shortcut"])


def _emit_mha(sd, prefix, p):
    _emit_linear(sd, f"{prefix}.to_q", p["to_q"])
    _emit_linear(sd, f"{prefix}.to_k", p["to_k"])
    _emit_linear(sd, f"{prefix}.to_v", p["to_v"])
    _emit_linear(sd, f"{prefix}.to_out.0", p["to_out"])


def _emit_st(sd, prefix, p):
    _emit_norm(sd, f"{prefix}.norm", p["norm"])
    _emit_conv(sd, f"{prefix}.proj_in", p["proj_in"])
    blk = f"{prefix}.transformer_blocks.0"
    _emit_norm(sd, f"{blk}.norm1", p["norm1"])
    _emit_mha(sd, f"{blk}.attn1", p["attn1"])
    _emit_norm(sd, f"{blk}.norm2", p["norm2"])
    _emit_mha(sd, f"{blk}.attn2", p["attn2"])
    _emit_norm(sd, f"{blk}.norm3", p["norm3"])
    _emit_linear(sd, f"{blk}.ff.net.0.proj", p["ff"]["proj_in"])
    _emit_linear(sd, f"{blk}.ff.net.2", p["ff"]["proj_out"])
    _emit_conv(sd, f"{prefix}.proj_out", p["proj_out"])


def _emit_motion(sd, prefix, p):
    tt = f"{prefix}.temporal_transformer"
    _emit_norm(sd, f"{tt}.norm", p["norm"])
    _emit_linear(sd, f"{tt}.proj_in", p["proj_in"])
    for k, blk in enumerate(p["blocks"]):
        bp = f"{tt}.transformer_blocks.{k}"
        for a, ap in enumerate(blk["attns"]):
            _emit_norm(sd, f"{bp}.norms.{a}", ap["norm"])
            _emit_mha(sd, f"{bp}.attention_blocks.{a}", ap["attn"])
        _emit_norm(sd, f"{bp}.ff_norm", blk["ff_norm"])
        _emit_linear(sd, f"{bp}.ff.net.0.proj", blk["ff"]["proj_in"])
        _emit_linear(sd, f"{bp}.ff.net.2", blk["ff"]["proj_out"])
    _emit_linear(sd, f"{tt}.proj_out", p["proj_out"])


def _emit_unet(params, cfg):
    sd = {}
    _emit_conv(sd, "conv_in", params["conv_in"])
    _emit_linear(sd, "time_embedding.linear_1", params["time_mlp"]["fc1"])
    _emit_linear(sd, "time_embedding.linear_2", params["time_mlp"]["fc2"])
    for i, blk in enumerate(params["down"]):
        for j, rp in enumerate(blk["resnets"]):
            _emit_resnet(sd, f"down_blocks.{i}.resnets.{j}", rp)
            if blk["attns"] is not None:
                _emit_st(sd, f"down_blocks.{i}.attentions.{j}",
                         blk["attns"][j])
            if blk["motions"] is not None:
                _emit_motion(sd, f"down_blocks.{i}.motion_modules.{j}",
                             blk["motions"][j])
        if blk["downsample"] is not None:
            _emit_conv(sd, f"down_blocks.{i}.downsamplers.0.conv",
                       blk["downsample"])
    for j in (0, 1):
        _emit_resnet(sd, f"mid_block.resnets.{j}",
                     params["mid"]["resnets"][j])
    _emit_st(sd, "mid_block.attentions.0", params["mid"]["attns"][0])
    if params["mid"]["motions"] is not None:
        _emit_motion(sd, "mid_block.motion_modules.0",
                     params["mid"]["motions"][0])
    for i, blk in enumerate(params["up"]):
        for j, rp in enumerate(blk["resnets"]):
            _emit_resnet(sd, f"up_blocks.{i}.resnets.{j}", rp)
            if blk["attns"] is not None:
                _emit_st(sd, f"up_blocks.{i}.attentions.{j}", blk["attns"][j])
            if blk["motions"] is not None:
                _emit_motion(sd, f"up_blocks.{i}.motion_modules.{j}",
                             blk["motions"][j])
        if blk["upsample"] is not None:
            _emit_conv(sd, f"up_blocks.{i}.upsamplers.0.conv",
                       blk["upsample"])
    _emit_norm(sd, "conv_norm_out", params["norm_out"])
    _emit_conv(sd, "conv_out", params["conv_out"])
    return sd


def _trees_equal(a, b, path=""):
    if a is None or b is None:
        assert a is None and b is None, path
        return
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _trees_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _trees_equal(x, y, f"{path}/{i}")
    else:
        np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                                   np.asarray(b, dtype=np.float32),
                                   atol=1e-6, err_msg=path)


def test_unet_roundtrip_2d():
    cfg = C.tiny_unet_config(4, False)
    params = U.unet_init(jax.random.PRNGKey(0), cfg)
    sd = _emit_unet(params, cfg)
    got = W.convert_unet(sd, cfg, strict=True)
    _trees_equal(got, jax.tree.map(np.asarray, params))


def test_unet_roundtrip_3d_motion():
    cfg = C.tiny_unet_config(8, True)
    params = U.unet_init(jax.random.PRNGKey(1), cfg)
    sd = _emit_unet(params, cfg)
    got = W.convert_unet(sd, cfg, strict=True)
    _trees_equal(got, jax.tree.map(np.asarray, params))


def test_unet_conv_in_padding_4_to_8():
    cfg8 = C.tiny_unet_config(8, False)
    cfg4 = C.tiny_unet_config(4, False)
    params4 = U.unet_init(jax.random.PRNGKey(2), cfg4)
    sd = _emit_unet(params4, cfg4)
    got = W.convert_unet(sd, cfg8)
    k = got["conv_in"]["kernel"]
    assert k.shape[2] == 8
    np.testing.assert_allclose(k[:, :, 4:], 0.0)
    np.testing.assert_allclose(k[:, :, :4],
                               np.asarray(params4["conv_in"]["kernel"]))


def test_pose_guider_roundtrip():
    cfg = C.PoseGuiderConfig(block_out_channels=(8, 8, 16, 16),
                             embedding_channels=32)
    params = PG.pose_guider_init(jax.random.PRNGKey(0), cfg)
    sd = {}
    _emit_conv(sd, "conv_in", params["conv_in"])
    for i, blk in enumerate(params["blocks"]):
        _emit_conv(sd, f"blocks.{2 * i}", blk["conv_a"])
        _emit_conv(sd, f"blocks.{2 * i + 1}", blk["conv_b"])
    _emit_conv(sd, "conv_out", params["conv_out"])
    got = W.convert_pose_guider(sd, cfg)
    _trees_equal(got, jax.tree.map(np.asarray, params))


def test_vae_roundtrip():
    cfg = C.tiny_vae_config()
    params = V.vae_init(jax.random.PRNGKey(0), cfg)
    sd = {}
    _emit_conv(sd, "encoder.conv_in", params["encoder"]["conv_in"])
    for i, blk in enumerate(params["encoder"]["down"]):
        for j, rp in enumerate(blk["resnets"]):
            _emit_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", rp)
        if blk["downsample"] is not None:
            _emit_conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                       blk["downsample"])

    def emit_mid(prefix, p):
        _emit_resnet(sd, f"{prefix}.resnets.0", p["resnet1"])
        _emit_norm(sd, f"{prefix}.attentions.0.group_norm", p["attn"]["norm"])
        for nm in ("to_q", "to_k", "to_v"):
            _emit_linear(sd, f"{prefix}.attentions.0.{nm}", p["attn"][nm])
        _emit_linear(sd, f"{prefix}.attentions.0.to_out.0",
                     p["attn"]["to_out"])
        _emit_resnet(sd, f"{prefix}.resnets.1", p["resnet2"])

    emit_mid("encoder.mid_block", params["encoder"]["mid"])
    _emit_norm(sd, "encoder.conv_norm_out", params["encoder"]["norm_out"])
    _emit_conv(sd, "encoder.conv_out", params["encoder"]["conv_out"])
    _emit_conv(sd, "quant_conv", params["quant_conv"])
    _emit_conv(sd, "post_quant_conv", params["post_quant_conv"])
    _emit_conv(sd, "decoder.conv_in", params["decoder"]["conv_in"])
    emit_mid("decoder.mid_block", params["decoder"]["mid"])
    for i, blk in enumerate(params["decoder"]["up"]):
        for j, rp in enumerate(blk["resnets"]):
            _emit_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", rp)
        if blk["upsample"] is not None:
            _emit_conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                       blk["upsample"])
    _emit_norm(sd, "decoder.conv_norm_out", params["decoder"]["norm_out"])
    _emit_conv(sd, "decoder.conv_out", params["decoder"]["conv_out"])

    got = W.convert_vae(sd, cfg)
    _trees_equal(got, jax.tree.map(np.asarray, params))


def test_clip_roundtrip():
    cfg = C.tiny_clip_config()
    params = CV.clip_vision_init(jax.random.PRNGKey(0), cfg)
    sd = {}
    vm = "vision_model"
    sd[f"{vm}.embeddings.patch_embedding.weight"] = np.transpose(
        np.asarray(params["patch_embed"]["kernel"]), (3, 2, 0, 1))
    sd[f"{vm}.embeddings.class_embedding"] = np.asarray(params["class_embed"])
    sd[f"{vm}.embeddings.position_embedding.weight"] = np.asarray(
        params["pos_embed"])
    _emit_norm(sd, f"{vm}.pre_layrnorm", params["pre_ln"])
    for i, lp in enumerate(params["layers"]):
        pre = f"{vm}.encoder.layers.{i}"
        _emit_norm(sd, f"{pre}.layer_norm1", lp["ln1"])
        _emit_linear(sd, f"{pre}.self_attn.q_proj", lp["q"])
        _emit_linear(sd, f"{pre}.self_attn.k_proj", lp["k"])
        _emit_linear(sd, f"{pre}.self_attn.v_proj", lp["v"])
        _emit_linear(sd, f"{pre}.self_attn.out_proj", lp["out"])
        _emit_norm(sd, f"{pre}.layer_norm2", lp["ln2"])
        _emit_linear(sd, f"{pre}.mlp.fc1", lp["fc1"])
        _emit_linear(sd, f"{pre}.mlp.fc2", lp["fc2"])
    _emit_norm(sd, f"{vm}.post_layernorm", params["post_ln"])
    _emit_linear(sd, "visual_projection", params["projection"])
    got = W.convert_clip_vision(sd, cfg)
    _trees_equal(got, jax.tree.map(np.asarray, params))


def test_flatten_unflatten_roundtrip(tmp_path):
    cfg = C.tiny_unet_config(8, True)
    params = jax.tree.map(np.asarray, U.unet_init(jax.random.PRNGKey(0), cfg))
    path = str(tmp_path / "p.npz")
    W.save_npz(params, path)
    loaded = W.load_npz(path)
    _trees_equal(loaded, params)

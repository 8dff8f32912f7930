"""Torch parity at the reference's DEPLOYED shapes (VERDICT r2 #3).

The standard parity suite (test_reference_parity.py) runs reduced configs
for CI speed; padding/grouping/tiling bugs that only appear at real channel
counts would slip through. This file re-runs one parity test per codec
family at reference-default dims:

  * HiFT 512 base channels, upsample (8,5,3)  — hifigan/generator.py:223-
  * flow UNet channels (256,), n_blocks 4, mid 12, heads 8x64
    — flow/decoder.py:87-99 + model/flow/train_sfm_flow_detailed.yaml:99-107
  * UpsampleConformer 512/8h/2048ffn/6 blocks — train_sfm_flow_detailed.yaml:53-65
  * BiCodec full stack (vocos 384/2048/12, wave-gen 1536, speaker 128->1024)
  * S3 tokenizer 1280x12x20h (importer + forward at full dims)
  * CAM++ full D-TDNN (importer + forward at full dims)

Runs in CI (~70 s total); RWKVTTS_SKIP_FULLSHAPE=1 opts out for quick
iterations.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RWKVTTS_SKIP_FULLSHAPE") == "1",
    reason="full-shape parity skipped by RWKVTTS_SKIP_FULLSHAPE",
)

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import reference_shims  # noqa: E402

from rwkvtts_tpu.codecs import bicodec, cosy_import, hift as hift_lib  # noqa: E402
from rwkvtts_tpu.codecs import torch_import  # noqa: E402

reference_shims.install()


def _sd(mod):
    return {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()}


def _j(x):
    return jnp.asarray(x.detach().cpu().numpy())


def test_full_hift_decode_matches():
    gen_mod = reference_shims.import_ref("cosyvoice.hifigan.generator")
    f0_mod = reference_shims.import_ref("cosyvoice.hifigan.f0_predictor")
    torch.manual_seed(0)
    cfg = hift_lib.HiFTConfig()  # deployed defaults: 80 -> 512, (8,5,3)
    tm = gen_mod.HiFTGenerator(
        in_channels=cfg.in_channels,
        base_channels=cfg.base_channels,
        nb_harmonics=cfg.nb_harmonics,
        sampling_rate=cfg.sampling_rate,
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        istft_params={"n_fft": cfg.istft_n_fft, "hop_len": cfg.istft_hop_len},
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        source_resblock_kernel_sizes=list(cfg.source_resblock_kernel_sizes),
        source_resblock_dilation_sizes=[
            list(d) for d in cfg.source_resblock_dilation_sizes
        ],
        f0_predictor=f0_mod.ConvRNNF0Predictor(
            num_class=1, in_channels=cfg.in_channels,
            cond_channels=cfg.f0_cond_channels,
        ),
    ).eval()
    params = cosy_import.hift_from_state_dict(_sd(tm), cfg)
    torch.manual_seed(1)
    B, T = 1, 12
    mel = torch.randn(B, cfg.in_channels, T)
    s = torch.randn(B, 1, T * cfg.total_upsample) * 0.1
    with torch.no_grad():
        ref = tm.decode(x=mel, s=s).numpy()
    out = hift_lib.decode(
        params, cfg, _j(mel.transpose(1, 2)), _j(s.squeeze(1))
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)


def test_full_flow_estimator_matches():
    from rwkvtts_tpu.codecs import flow as flow_lib

    dec_mod = reference_shims.import_ref("cosyvoice.flow.decoder")
    torch.manual_seed(2)
    est_cfg = flow_lib.EstimatorConfig(
        in_channels=320, out_channels=80, channels=(256,),
        n_blocks=4, num_mid_blocks=12, num_heads=8,
        attention_head_dim=64, causal=True, static_chunk_size=0,
    )
    tm = dec_mod.ConditionalDecoder(
        in_channels=est_cfg.in_channels, out_channels=est_cfg.out_channels,
        causal=True, channels=list(est_cfg.channels), dropout=0.0,
        attention_head_dim=est_cfg.attention_head_dim,
        n_blocks=est_cfg.n_blocks, num_mid_blocks=est_cfg.num_mid_blocks,
        num_heads=est_cfg.num_heads, act_fn="gelu",
    ).eval()
    tm.static_chunk_size = 0
    params = cosy_import.estimator_from_sd(_sd(tm), est_cfg)
    torch.manual_seed(3)
    B, C, T = 1, 80, 8
    x = torch.randn(B, C, T)
    mu = torch.randn(B, C, T)
    spks = torch.randn(B, C)
    cond = torch.randn(B, C, T)
    mask = torch.ones(B, 1, T)
    t = torch.tensor([0.4])
    with torch.no_grad():
        ref = tm(x, mask, mu, t, spks, cond).numpy()
    out = flow_lib.estimator_apply(
        params, est_cfg, _j(x.transpose(1, 2)), jnp.ones((B, T)),
        _j(mu.transpose(1, 2)), _j(t), _j(spks), _j(cond.transpose(1, 2)),
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 1), atol=2e-3
    )


def test_full_upsample_conformer_matches():
    from rwkvtts_tpu.codecs import conformer

    up_mod = reference_shims.import_ref("cosyvoice.transformer.upsample_encoder")
    torch.manual_seed(4)
    cfg = conformer.UpsampleConformerConfig(
        input_size=512, output_size=512, attention_heads=8,
        linear_units=2048, num_blocks=6, num_up_blocks=4,
    )
    tm = up_mod.UpsampleConformerEncoder(
        input_size=cfg.input_size, output_size=cfg.output_size,
        attention_heads=cfg.attention_heads, linear_units=cfg.linear_units,
        num_blocks=cfg.num_blocks, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
        selfattention_layer_type="rel_selfattn",
        use_cnn_module=False, macaron_style=False,
    ).eval()
    params = cosy_import.conformer_from_sd(_sd(tm), cfg)
    B, T = 1, 10
    x = torch.randn(B, T, cfg.input_size)
    lens = torch.tensor([T])
    with torch.no_grad():
        ref, _ = tm(x, lens)
    out = conformer.apply(params, cfg, _j(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-3)


def test_full_bicodec_encoder_decoder_matches():
    enc_mod = reference_shims.import_ref(
        "sparktts.modules.encoder_decoder.feat_encoder"
    )
    dec_mod = reference_shims.import_ref(
        "sparktts.modules.encoder_decoder.feat_decoder"
    )
    full = bicodec.BiCodecConfig()
    torch.manual_seed(5)
    cfg = full.encoder  # 1024 -> vocos 384/2048/12 -> 1024
    tm = enc_mod.Encoder(
        input_channels=cfg.input_channels, vocos_dim=cfg.vocos_dim,
        vocos_intermediate_dim=cfg.vocos_intermediate_dim,
        vocos_num_layers=cfg.vocos_num_layers,
        out_channels=cfg.out_channels, sample_ratios=list(cfg.sample_ratios),
    ).eval()
    sd = {f"encoder.{k}": v for k, v in _sd(tm).items()}
    params = torch_import._vocos_stack_p(sd, "encoder", cfg, is_encoder=True)
    x = torch.randn(1, cfg.input_channels, 8)
    with torch.no_grad():
        ref = tm(x).numpy()
    out = bicodec.encoder_apply(params, cfg, _j(x.transpose(1, 2)))
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 1), atol=1e-3
    )

    torch.manual_seed(6)
    dcfg = full.prenet  # with condition_dim 1024
    tmd = dec_mod.Decoder(
        input_channels=dcfg.input_channels, vocos_dim=dcfg.vocos_dim,
        vocos_intermediate_dim=dcfg.vocos_intermediate_dim,
        vocos_num_layers=dcfg.vocos_num_layers,
        out_channels=dcfg.out_channels, condition_dim=dcfg.condition_dim,
        sample_ratios=list(dcfg.sample_ratios),
    ).eval()
    sdd = {f"prenet.{k}": v for k, v in _sd(tmd).items()}
    paramsd = torch_import._vocos_stack_p(sdd, "prenet", dcfg, is_encoder=False)
    xd = torch.randn(1, dcfg.input_channels, 6)
    c = torch.randn(1, dcfg.condition_dim)
    with torch.no_grad():
        refd = tmd(xd, c).numpy()
    outd = bicodec.decoder_apply(paramsd, dcfg, _j(xd.transpose(1, 2)), _j(c))
    np.testing.assert_allclose(
        np.asarray(outd), refd.transpose(0, 2, 1), atol=1e-3
    )


def test_full_bicodec_wave_generator_matches():
    wg_mod = reference_shims.import_ref(
        "sparktts.modules.encoder_decoder.wave_generator"
    )
    torch.manual_seed(7)
    cfg = bicodec.WaveGeneratorConfig()  # 1024 -> 1536ch, rates (8,5,4,2)
    tm = wg_mod.WaveGenerator(
        input_channel=cfg.input_channel, channels=cfg.channels,
        rates=list(cfg.rates), kernel_sizes=list(cfg.kernel_sizes),
    ).eval()
    sd = {f"decoder.{k}": v for k, v in _sd(tm).items()}
    params = torch_import._wave_generator_p(sd, cfg)
    x = torch.randn(1, cfg.input_channel, 4)
    with torch.no_grad():
        ref = tm(x).squeeze(1).numpy()
    out = bicodec.wave_generator_apply(params, cfg, _j(x.transpose(1, 2)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)


def test_full_bicodec_speaker_encoder_matches():
    spk_mod = reference_shims.import_ref(
        "sparktts.modules.speaker.speaker_encoder"
    )
    torch.manual_seed(8)
    cfg = bicodec.SpeakerEncoderConfig()  # 128 mel -> 1024, 32 tokens
    tm = spk_mod.SpeakerEncoder(
        input_dim=cfg.input_dim, out_dim=cfg.out_dim,
        latent_dim=cfg.latent_dim, token_num=cfg.token_num,
        fsq_levels=list(cfg.fsq_levels),
        fsq_num_quantizers=cfg.fsq_num_quantizers,
    ).eval()
    sd = {f"speaker_encoder.{k}": v for k, v in _sd(tm).items()}
    params = torch_import._speaker_encoder_p(sd, cfg)
    mels = torch.randn(1, 80, cfg.input_dim)
    with torch.no_grad():
        indices_ref = tm.tokenize(mels).numpy()
        dvec_ref = tm.detokenize(torch.as_tensor(indices_ref)).numpy()
    idx = bicodec.speaker_encoder_tokenize(params, cfg, _j(mels))
    np.testing.assert_array_equal(
        np.asarray(idx).reshape(1, -1), indices_ref.reshape(1, -1)
    )
    dvec = bicodec.speaker_encoder_detokenize(params, cfg, idx)
    np.testing.assert_allclose(np.asarray(dvec), dvec_ref, atol=1e-3)


def test_full_s3_tokenizer_importer_and_forward():
    """S3 at deployed dims (128 mel, 1280x12x20h, ffn 5120): the importer
    maps a full-size synthetic state dict and the forward produces 25 Hz
    tokens deterministically. (The reference ships S3 as ONNX only; true
    numerical parity rides on utils/onnx_import extraction of the real
    export — this certifies the full-dim compute path.)"""
    from test_s3_campplus import build_s3_sd

    from rwkvtts_tpu.codecs import s3_tokenizer as s3

    cfg = s3.S3TokenizerConfig()  # full defaults
    sd = build_s3_sd(cfg, np.random.default_rng(11))
    params = jax.tree.map(jnp.asarray, s3.s3_from_torch_state_dict(sd, cfg))
    rng = np.random.default_rng(12)
    mel = jnp.asarray(rng.standard_normal((1, 100, cfg.n_mels)).astype(np.float32))
    tok1, _ = s3.encode_mel(params, cfg, mel)
    tok2, _ = s3.encode_mel(params, cfg, mel)
    assert tok1.shape == (1, 25)  # 100 mel frames (@100Hz) -> 25 Hz tokens
    np.testing.assert_array_equal(np.asarray(tok1), np.asarray(tok2))
    assert 0 <= int(np.min(np.asarray(tok1)))
    assert int(np.max(np.asarray(tok1))) < cfg.vocab_size


def test_full_campplus_importer_and_forward():
    """CAM++ at deployed dims (80 mel, 512-channel D-TDNN, 192-d x-vector)."""
    from test_s3_campplus import build_campplus_sd

    from rwkvtts_tpu.codecs import campplus as cp

    cfg = cp.CampplusConfig()  # full defaults
    rng = np.random.default_rng(13)
    sd = build_campplus_sd(cfg, rng)
    params = jax.tree.map(jnp.asarray, cp.campplus_from_torch(sd, cfg))
    feat = jnp.asarray(rng.standard_normal((1, 150, cfg.feat_dim)).astype(np.float32))
    emb = cp.apply(params, cfg, feat)
    assert emb.shape == (1, cfg.embedding_size)
    assert np.isfinite(np.asarray(emb)).all()

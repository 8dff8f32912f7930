"""Numerical parity against the ACTUAL reference torch modules.

Each test instantiates a reference class from /root/reference/third_party
with seeded random weights, converts its state_dict through our importers
(codecs/torch_import.py, codecs/cosy_import.py), and asserts our JAX apply
reproduces the torch forward. This is the wav-fidelity evidence chain for
pretrained checkpoints without shipping the checkpoints: the same importer
path loads the real weights.

Covers (VERDICT r1 item 3): HiFT generator + f0 predictor, BiCodec feat
encoder / prenet-postnet decoder / factorized VQ / wave generator /
speaker encoder (ECAPA + perceiver + residual FSQ).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import reference_shims

from rwkvtts_tpu.codecs import bicodec, cosy_import, hift as hift_lib
from rwkvtts_tpu.codecs import quantizers, torch_import

reference_shims.install()


def _sd(mod):
    return {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()}


def _j(x):
    return jnp.asarray(x.detach().cpu().numpy())


# ---------------------------------------------------------------------------
# HiFT (CosyVoice2 vocoder): NSF + ISTFT generator
# ---------------------------------------------------------------------------


def _small_hift():
    gen_mod = reference_shims.import_ref("cosyvoice.hifigan.generator")
    f0_mod = reference_shims.import_ref("cosyvoice.hifigan.f0_predictor")
    torch.manual_seed(0)
    cfg = hift_lib.HiFTConfig(
        in_channels=16,
        base_channels=32,
        sampling_rate=24000,
        upsample_rates=(8, 5, 3),
        upsample_kernel_sizes=(16, 11, 7),
        source_resblock_kernel_sizes=(7, 7, 11),
        source_resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        f0_cond_channels=24,
    )
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
    return tm, cfg, params


def test_ref_hift_decode_matches():
    tm, cfg, params = _small_hift()
    torch.manual_seed(1)
    B, T = 2, 10
    mel = torch.randn(B, cfg.in_channels, T)
    s = torch.randn(B, 1, T * cfg.total_upsample) * 0.1
    with torch.no_grad():
        ref = tm.decode(x=mel, s=s).numpy()
    out = hift_lib.decode(
        params, cfg, _j(mel.transpose(1, 2)), _j(s.squeeze(1))
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_ref_hift_f0_predictor_matches():
    tm, cfg, params = _small_hift()
    torch.manual_seed(2)
    mel = torch.randn(2, cfg.in_channels, 13)
    with torch.no_grad():
        ref = tm.f0_predictor(mel).numpy()
    out = hift_lib.f0_predict(params["f0_predictor"], _j(mel.transpose(1, 2)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


# ---------------------------------------------------------------------------
# BiCodec stacks (SparkTTS)
# ---------------------------------------------------------------------------


def test_ref_bicodec_encoder_matches():
    enc_mod = reference_shims.import_ref(
        "sparktts.modules.encoder_decoder.feat_encoder"
    )
    torch.manual_seed(3)
    cfg = bicodec.VocosStackConfig(
        input_channels=12, vocos_dim=16, vocos_intermediate_dim=32,
        vocos_num_layers=3, out_channels=10, sample_ratios=(2, 2),
    )
    tm = enc_mod.Encoder(
        input_channels=cfg.input_channels, vocos_dim=cfg.vocos_dim,
        vocos_intermediate_dim=cfg.vocos_intermediate_dim,
        vocos_num_layers=cfg.vocos_num_layers,
        out_channels=cfg.out_channels, sample_ratios=list(cfg.sample_ratios),
    ).eval()
    sd = {f"encoder.{k}": v for k, v in _sd(tm).items()}
    params = torch_import._vocos_stack_p(sd, "encoder", cfg, is_encoder=True)
    x = torch.randn(2, cfg.input_channels, 16)
    with torch.no_grad():
        ref = tm(x).numpy()  # (B, out, T')
    out = bicodec.encoder_apply(params, cfg, _j(x.transpose(1, 2)))
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 1), atol=2e-4
    )


def test_ref_bicodec_decoder_matches():
    dec_mod = reference_shims.import_ref(
        "sparktts.modules.encoder_decoder.feat_decoder"
    )
    torch.manual_seed(4)
    cfg = bicodec.VocosStackConfig(
        input_channels=10, vocos_dim=16, vocos_intermediate_dim=32,
        vocos_num_layers=3, out_channels=12, sample_ratios=(2, 2),
        condition_dim=8,
    )
    tm = dec_mod.Decoder(
        input_channels=cfg.input_channels, vocos_dim=cfg.vocos_dim,
        vocos_intermediate_dim=cfg.vocos_intermediate_dim,
        vocos_num_layers=cfg.vocos_num_layers,
        out_channels=cfg.out_channels, condition_dim=cfg.condition_dim,
        sample_ratios=list(cfg.sample_ratios),
    ).eval()
    sd = {f"prenet.{k}": v for k, v in _sd(tm).items()}
    params = torch_import._vocos_stack_p(sd, "prenet", cfg, is_encoder=False)
    x = torch.randn(2, cfg.input_channels, 7)
    c = torch.randn(2, cfg.condition_dim)
    with torch.no_grad():
        ref = tm(x, c).numpy()  # (B, out, T')
    out = bicodec.decoder_apply(params, cfg, _j(x.transpose(1, 2)), _j(c))
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 1), atol=2e-4
    )


def test_ref_factorized_vq_matches():
    vq_mod = reference_shims.import_ref(
        "sparktts.modules.vq.factorized_vector_quantize"
    )
    torch.manual_seed(5)
    tm = vq_mod.FactorizedVectorQuantize(
        input_dim=12, codebook_size=32, codebook_dim=4, commitment=0.25
    ).eval()
    sd = {f"quantizer.{k}": v for k, v in _sd(tm).items()}
    # direct conversion of just the quantizer keys (the same mapping
    # bicodec_from_state_dict applies to the full checkpoint)
    quant = {"codebook": np.asarray(sd["quantizer.codebook.weight"])}
    w_in = torch_import._get_w(sd, "quantizer.in_project")[..., 0].T
    w_out = torch_import._get_w(sd, "quantizer.out_project")[..., 0].T
    quant["in_project"] = {
        "w": np.ascontiguousarray(w_in),
        "b": np.asarray(sd["quantizer.in_project.bias"]),
    }
    quant["out_project"] = {
        "w": np.ascontiguousarray(w_out),
        "b": np.asarray(sd["quantizer.out_project.bias"]),
    }

    z = torch.randn(2, 12, 9)  # (B, D, T)
    with torch.no_grad():
        indices_ref = tm.tokenize(z).numpy()
        zq_ref = tm.detokenize(torch.as_tensor(indices_ref)).numpy()
    idx = quantizers.factorized_vq_tokenize(quant, _j(z.transpose(1, 2)))
    np.testing.assert_array_equal(np.asarray(idx), indices_ref)
    zq = quantizers.factorized_vq_detokenize(quant, idx)
    np.testing.assert_allclose(
        np.asarray(zq), zq_ref.transpose(0, 2, 1), atol=1e-5
    )


def test_ref_wave_generator_matches():
    wg_mod = reference_shims.import_ref(
        "sparktts.modules.encoder_decoder.wave_generator"
    )
    torch.manual_seed(6)
    cfg = bicodec.WaveGeneratorConfig(
        input_channel=12, channels=16, rates=(4, 2), kernel_sizes=(8, 4)
    )
    tm = wg_mod.WaveGenerator(
        input_channel=cfg.input_channel, channels=cfg.channels,
        rates=list(cfg.rates), kernel_sizes=list(cfg.kernel_sizes),
    ).eval()
    sd = {f"decoder.{k}": v for k, v in _sd(tm).items()}
    params = torch_import._wave_generator_p(sd, cfg)
    x = torch.randn(2, cfg.input_channel, 11)
    with torch.no_grad():
        ref = tm(x).squeeze(1).numpy()
    out = bicodec.wave_generator_apply(params, cfg, _j(x.transpose(1, 2)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_ref_speaker_encoder_matches():
    spk_mod = reference_shims.import_ref(
        "sparktts.modules.speaker.speaker_encoder"
    )
    torch.manual_seed(7)
    cfg = bicodec.SpeakerEncoderConfig(
        input_dim=100, out_dim=512, latent_dim=128, token_num=8,
        fsq_levels=(4, 4, 4, 4, 4, 4), fsq_num_quantizers=1,
    )
    tm = spk_mod.SpeakerEncoder(
        input_dim=cfg.input_dim, out_dim=cfg.out_dim,
        latent_dim=cfg.latent_dim, token_num=cfg.token_num,
        fsq_levels=list(cfg.fsq_levels),
        fsq_num_quantizers=cfg.fsq_num_quantizers,
    ).eval()
    sd = {f"speaker_encoder.{k}": v for k, v in _sd(tm).items()}
    params = torch_import._speaker_encoder_p(sd, cfg)

    # the reference ECAPA takes (B, T, D_mel) and transposes internally
    # (speaker_encoder.py's (B, D_mel, T1) docstring is wrong)
    mels = torch.randn(2, 60, cfg.input_dim)
    with torch.no_grad():
        indices_ref = tm.tokenize(mels).numpy()
        dvec_ref = tm.detokenize(torch.as_tensor(indices_ref)).numpy()
    idx = bicodec.speaker_encoder_tokenize(params, cfg, _j(mels))
    np.testing.assert_array_equal(
        np.asarray(idx).reshape(2, -1), indices_ref.reshape(2, -1)
    )
    dvec = bicodec.speaker_encoder_detokenize(params, cfg, idx)
    np.testing.assert_allclose(np.asarray(dvec), dvec_ref, atol=2e-4)


# ---------------------------------------------------------------------------
# CosyVoice2 UpsampleConformerEncoder (flow encoder)
# ---------------------------------------------------------------------------


def test_ref_upsample_conformer_matches():
    from rwkvtts_tpu.codecs import conformer

    up_mod = reference_shims.import_ref(
        "cosyvoice.transformer.upsample_encoder"
    )
    torch.manual_seed(8)
    # the reference hard-codes its Upsample1D to 512 channels
    # (upsample_encoder.py:217), so the encoder width is fixed
    cfg = conformer.UpsampleConformerConfig(
        input_size=512, output_size=512, attention_heads=8,
        linear_units=64, num_blocks=1, num_up_blocks=4,
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

    B, T = 2, 8
    x = torch.randn(B, T, cfg.input_size)
    lens = torch.tensor([T, T])
    with torch.no_grad():
        ref, _ = tm(x, lens)
    out = conformer.apply(params, cfg, _j(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=5e-4)


def test_ref_upsample_conformer_context_matches():
    """Streaming path: pre-lookahead context splice must match."""
    from rwkvtts_tpu.codecs import conformer

    up_mod = reference_shims.import_ref(
        "cosyvoice.transformer.upsample_encoder"
    )
    torch.manual_seed(9)
    lk = up_mod.PreLookaheadLayer(channels=16, pre_lookahead_len=3).eval()
    sd = _sd(lk)
    params = {
        "conv1": torch_import.conv1d_p(sd, "conv1"),
        "conv2": torch_import.conv1d_p(sd, "conv2"),
    }
    x = torch.randn(2, 10, 16)
    ctx = torch.randn(2, 3, 16)
    with torch.no_grad():
        ref = lk(x, context=ctx).numpy()
    out = conformer.pre_lookahead(params, _j(x), 3, context=_j(ctx))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


# ---------------------------------------------------------------------------
# CosyVoice2 flow estimator (causal UNet) + CFM euler solve
# ---------------------------------------------------------------------------


def _small_estimator(seed, out_ch, width=16, heads=2, head_dim=4, mid=2):
    from rwkvtts_tpu.codecs import flow as flow_lib

    dec_mod = reference_shims.import_ref("cosyvoice.flow.decoder")
    torch.manual_seed(seed)
    est_cfg = flow_lib.EstimatorConfig(
        in_channels=4 * out_ch, out_channels=out_ch, channels=(width,),
        n_blocks=1, num_mid_blocks=mid, num_heads=heads,
        attention_head_dim=head_dim, causal=True, static_chunk_size=0,
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
    return tm, est_cfg, params, flow_lib


def test_ref_flow_estimator_matches():
    tm, est_cfg, params, flow_lib = _small_estimator(10, out_ch=8)
    torch.manual_seed(11)
    B, C, T = 2, est_cfg.out_channels, 6
    x = torch.randn(B, C, T)
    mu = torch.randn(B, C, T)
    spks = torch.randn(B, C)
    cond = torch.randn(B, C, T)
    mask = torch.ones(B, 1, T)
    t = torch.tensor([0.3, 0.7])
    with torch.no_grad():
        ref = tm(x, mask, mu, t, spks, cond).numpy()
    out = flow_lib.estimator_apply(
        params, est_cfg, _j(x.transpose(1, 2)), jnp.ones((B, T)),
        _j(mu.transpose(1, 2)), _j(t), _j(spks), _j(cond.transpose(1, 2)),
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 1), atol=5e-4
    )


def test_ref_cfm_solve_euler_matches():
    """Full euler CFG solve vs the reference ConditionalCFM.solve_euler
    (the reference hard-codes 80 mel channels / 80-dim spks there)."""
    from types import SimpleNamespace

    tm, est_cfg, params, flow_lib = _small_estimator(
        12, out_ch=80, width=16, mid=1
    )
    cfm_mod = reference_shims.import_ref("cosyvoice.flow.flow_matching")
    cfm_params = SimpleNamespace(
        t_scheduler="cosine", training_cfg_rate=0.2, inference_cfg_rate=0.7,
        sigma_min=1e-6, solver="euler",
    )
    ref_cfm = cfm_mod.ConditionalCFM(
        in_channels=240, cfm_params=cfm_params, estimator=tm
    )
    torch.manual_seed(13)
    B, C, T, steps = 1, 80, 6, 3
    z = torch.randn(B, C, T)
    mu = torch.randn(B, C, T)
    spks = torch.randn(B, C)
    cond = torch.randn(B, C, T)
    mask = torch.ones(B, 1, T)
    t_span = torch.linspace(0, 1, steps + 1)
    t_span = 1 - torch.cos(t_span * 0.5 * torch.pi)
    with torch.no_grad():
        ref = ref_cfm.solve_euler(z, t_span, mu, mask, spks, cond).numpy()

    cfg = flow_lib.CFMConfig(inference_cfg_rate=0.7, t_scheduler="cosine")
    out = flow_lib.cfm_solve(
        params, est_cfg, cfg, _j(z.transpose(1, 2)), _j(mu.transpose(1, 2)),
        jnp.ones((B, T)), _j(spks), _j(cond.transpose(1, 2)),
        n_timesteps=steps,
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 1), atol=2e-3
    )


# ---------------------------------------------------------------------------
# XY_Tokenizer (semantic+acoustic dual encoder -> RVQ -> decoder -> Vocos)
# ---------------------------------------------------------------------------


def _small_xy():
    from rwkvtts_tpu.codecs import xy_import, xy_tokenizer as xt

    mods = reference_shims.import_ref("xy_tokenizer.nn.modules")
    quant = reference_shims.import_ref("xy_tokenizer.nn.quantizer")
    torch.manual_seed(14)
    cfg = xt.XYTokenizerConfig(
        n_mels=8, d_model=16, enc_layers=2, heads=2, ffn_dim=32,
        adapter_layers=1, avg_pooler=4, nq=2, codebook_size=16,
        codebook_dim=8, rvq_dim=8, quantizer_io_dim=64, dec_layers=2,
        vocos_dim=16, vocos_intermediate_dim=32, vocos_layers=2,
        vocos_n_fft=16, vocos_hop=4,
    )
    enc_kw = dict(
        num_mel_bins=cfg.n_mels, d_model=cfg.d_model, encoder_layers=cfg.enc_layers,
        encoder_attention_heads=cfg.heads, encoder_ffn_dim=cfg.ffn_dim,
        max_audio_seconds=1, attn_type="varlen",
    )
    ad_kw = dict(
        d_model=cfg.d_model, encoder_layers=cfg.adapter_layers,
        encoder_attention_heads=cfg.heads, encoder_ffn_dim=cfg.ffn_dim,
        max_source_positions=500, attn_type="varlen",
    )

    class Container(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.semantic_encoder = mods.OmniAudioEncoder(**enc_kw)
            self.semantic_encoder_adapter = mods.Transformer(
                input_dim=cfg.d_model, output_dim=cfg.d_model, **ad_kw
            )
            self.acoustic_encoder = mods.OmniAudioEncoder(**enc_kw)
            self.pre_rvq_adapter = mods.Transformer(
                input_dim=2 * cfg.d_model, output_dim=cfg.d_model, **ad_kw
            )
            self.downsample = mods.ResidualDownConv(
                d_model=cfg.d_model, avg_pooler=cfg.avg_pooler
            )
            self.quantizer = quant.ResidualVQ(
                input_dim=cfg.quantizer_io_dim, rvq_dim=cfg.rvq_dim,
                output_dim=cfg.quantizer_io_dim, num_quantizers=cfg.nq,
                codebook_size=cfg.codebook_size, codebook_dim=cfg.codebook_dim,
                kmeans_init=False, quantizer_dropout=0.0,
            )
            self.post_rvq_adapter = mods.Transformer(
                input_dim=cfg.quantizer_io_dim, output_dim=cfg.quantizer_io_dim,
                **ad_kw
            )
            self.upsample = mods.UpConv(
                d_model=cfg.d_model, stride=cfg.avg_pooler
            )
            self.acoustic_decoder = mods.OmniAudioDecoder(
                num_mel_bins=cfg.n_mels, d_model=cfg.d_model,
                decoder_layers=cfg.dec_layers,
                decoder_attention_heads=cfg.heads,
                decoder_ffn_dim=cfg.ffn_dim, max_audio_seconds=1,
                attn_type="varlen",
            )
            self.enhanced_vocos = mods.Vocos(
                input_channels=cfg.n_mels, dim=cfg.vocos_dim,
                intermediate_dim=cfg.vocos_intermediate_dim,
                num_layers=cfg.vocos_layers, n_fft=cfg.vocos_n_fft,
                hop_size=cfg.vocos_hop, padding="same",
            )

    tm = Container().eval()
    # randomize codebooks (kmeans_init=False leaves them ~N(0,1) already)
    params = xy_import.xy_from_state_dict(_sd(tm), cfg)
    return tm, cfg, params, xt


def test_ref_xy_tokenizer_encode_decode_matches():
    tm, cfg, params, xt = _small_xy()
    torch.manual_seed(15)
    B, T_mel = 2, 16
    mel = torch.randn(B, cfg.n_mels, T_mel)
    lens = torch.tensor([T_mel, T_mel])

    with torch.no_grad():
        sem, slen = tm.semantic_encoder(mel, lens)
        sem, _ = tm.semantic_encoder_adapter(sem, slen)
        aco, alen = tm.acoustic_encoder(mel, lens)
        cat = torch.cat([sem, aco], dim=1)
        pre, _ = tm.pre_rvq_adapter(cat, alen)
        down, dlen = tm.downsample(pre, alen)
        zq_ref, codes_ref, _, _, _ = tm.quantizer(down, dlen)
        zq2 = tm.quantizer.decode_codes(codes_ref)
        post, _ = tm.post_rvq_adapter(zq2, dlen)
        up, ulen = tm.upsample(post, dlen)
        dec, declen = tm.acoustic_decoder(up, ulen)
        wav_ref, _ = tm.enhanced_vocos(dec, declen)

    codes = xt.encode(params, cfg, _j(mel.transpose(1, 2)))
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())
    wav = xt.decode(params, cfg, codes)
    np.testing.assert_allclose(
        np.asarray(wav), wav_ref.squeeze(1).numpy(), atol=1e-3
    )


# ---------------------------------------------------------------------------
# Higgs (boson) tokenizer: DAC codec + semantic branch + EnCodec RVQ
# ---------------------------------------------------------------------------


def test_ref_higgs_encode_decode_matches():
    import sys as _sys
    import types as _types
    from importlib.machinery import ModuleSpec as _Spec

    # dac.py subclasses audiotools.ml.BaseModel at module scope
    if "audiotools" not in _sys.modules:
        at = _types.ModuleType("audiotools")
        at.__spec__ = _Spec("audiotools", None)
        at.AudioSignal = object
        ml = _types.ModuleType("audiotools.ml")
        ml.__spec__ = _Spec("audiotools.ml", None)
        ml.BaseModel = type("BaseModel", (torch.nn.Module,), {})
        at.ml = ml
        _sys.modules["audiotools"] = at
        _sys.modules["audiotools.ml"] = ml

    from rwkvtts_tpu.codecs import higgs as higgs_lib
    from rwkvtts_tpu.codecs import higgs_import

    # dac.py does absolute `from dac.nn.layers import Snake1d` — the package
    # root must be on sys.path
    _sys.path.insert(
        0,
        reference_shims.REF_THIRD_PARTY
        + "/boson_multimodal/audio_processing/descriptaudiocodec",
    )
    dac2 = reference_shims.import_ref(
        "boson_multimodal.audio_processing.descriptaudiocodec.dac.model.dac"
    )
    sem_mod = reference_shims.import_ref(
        "boson_multimodal.audio_processing.semantic_module"
    )
    vq_mod = reference_shims.import_ref(
        "boson_multimodal.audio_processing.quantization.vq"
    )
    torch.manual_seed(16)
    cfg = higgs_lib.HiggsConfig(
        d_model=8, latent_dim=16, strides=(4, 5), semantic_dim=16,
        nq=2, codebook_size=16, decoder_channels=32,
    )

    class Container(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = dac2.Encoder(cfg.d_model, list(cfg.strides), cfg.latent_dim)
            self.decoder_2 = dac2.Decoder(
                cfg.latent_dim, cfg.decoder_channels, list(cfg.strides)
            )
            self.encoder_semantic = sem_mod.Encoder(
                input_channels=cfg.semantic_dim, encode_channels=cfg.semantic_dim
            )
            self.quantizer = vq_mod.ResidualVectorQuantizer(
                dimension=cfg.quantizer_dim, n_q=cfg.nq, bins=cfg.codebook_size,
                kmeans_init=False,
            )
            self.fc_prior = torch.nn.Linear(cfg.quantizer_dim, cfg.quantizer_dim)
            self.fc_post1 = torch.nn.Linear(cfg.quantizer_dim, cfg.semantic_dim)
            self.fc_post2 = torch.nn.Linear(cfg.quantizer_dim, cfg.latent_dim)

    tm = Container().eval()
    params = higgs_import.higgs_from_state_dict(_sd(tm), cfg)

    torch.manual_seed(17)
    B, T = 2, 40 * cfg.hop_length  # 40 frames
    wav = torch.randn(B, 1, T) * 0.3
    sem_feats = torch.randn(B, T // cfg.hop_length, cfg.semantic_dim)

    with torch.no_grad():
        # mirror HiggsAudioTokenizer.forward:209-224 (RVQ branch)
        e_semantic = tm.encoder_semantic(sem_feats.transpose(1, 2))
        e_acoustic = tm.encoder(wav)
        e = torch.cat([e_acoustic, e_semantic], dim=1)
        e = tm.fc_prior(e.transpose(1, 2)).transpose(1, 2)
        codes_ref = tm.quantizer.encode(e, cfg.frame_rate)
        # mirror HiggsAudioTokenizer.decode:296-307
        quantized = tm.quantizer.decode(codes_ref)
        z = tm.fc_post2(quantized.transpose(1, 2)).transpose(1, 2)
        wav_ref = tm.decoder_2(z)

    codes = higgs_lib.encode(params, cfg, _j(wav.squeeze(1)), _j(sem_feats))
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())
    wav_out = higgs_lib.decode(params, cfg, codes)
    np.testing.assert_allclose(
        np.asarray(wav_out), wav_ref.squeeze(1).numpy(), atol=1e-4
    )

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

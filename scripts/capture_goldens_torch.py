"""Capture pipeline-level golden fixtures from the REFERENCE torch stacks.

Round-3 VERDICT missing #1: the parity suite is module-level; nothing
replays the reference's PIPELINE entry points from committed fixtures.
This script instantiates the reference's composite modules at the reduced
shapes in tests/golden_configs.py, fills them with deterministic synthetic
weights (rwkvtts_tpu.utils.fixtures.synth_state_dict — the fixture stores
only the shape table + seed, so nothing heavy is committed), runs:

  * BiCodec.tokenize -> detokenize      (sparktts/models/bicodec.py:152-189)
  * CausalMaskedDiffWithXvec.inference  (cosyvoice/flow/flow.py:155-241)
  * HiFTGenerator.inference             (cosyvoice/hifigan/generator.py:400-412)

and commits inputs+outputs to tests/goldens/*.npz. tests/test_goldens.py
replays them through the JAX ports with NO torch import at test time.

S3 tokenizer and CAM++ exist in the reference only as ONNX binaries (not in
this image; cli/frontend.py:95-116), so no torch pipeline can be captured
for them — their full-dim compute paths are certified by
tests/test_reference_parity_fullshape.py instead.

Usage: python scripts/capture_goldens_torch.py
"""
from __future__ import annotations

import os
import sys
from types import SimpleNamespace

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, os.path.join(_HERE, "..", "tests"))

import numpy as np
import torch

import golden_configs as gc
import reference_shims

from rwkvtts_tpu.utils import fixtures

reference_shims.install()


def _shapes(mod) -> dict:
    return {k: tuple(v.shape) for k, v in mod.state_dict().items()}


def _load_synth(mod, shapes, seed):
    synth = fixtures.synth_state_dict(shapes, seed)
    mod.load_state_dict({k: torch.from_numpy(v) for k, v in synth.items()},
                        strict=True)
    return mod.eval()


def capture_bicodec(out_dir: str) -> None:
    bc_mod = reference_shims.import_ref("sparktts.models.bicodec")
    enc_mod = reference_shims.import_ref(
        "sparktts.modules.encoder_decoder.feat_encoder"
    )
    dec_mod = reference_shims.import_ref(
        "sparktts.modules.encoder_decoder.feat_decoder"
    )
    wg_mod = reference_shims.import_ref(
        "sparktts.modules.encoder_decoder.wave_generator"
    )
    vq_mod = reference_shims.import_ref(
        "sparktts.modules.vq.factorized_vector_quantize"
    )
    spk_mod = reference_shims.import_ref(
        "sparktts.modules.speaker.speaker_encoder"
    )
    cfg = gc.bicodec_config()
    torch.manual_seed(0)
    m = cfg.mel
    tm = bc_mod.BiCodec(
        mel_params={
            "sample_rate": m.sample_rate, "n_fft": m.n_fft,
            "win_length": m.win_length, "hop_length": m.hop_length,
            "mel_fmin": m.mel_fmin, "mel_fmax": m.mel_fmax,
            "num_mels": m.num_mels,
        },
        encoder=enc_mod.Encoder(
            input_channels=cfg.encoder.input_channels,
            vocos_dim=cfg.encoder.vocos_dim,
            vocos_intermediate_dim=cfg.encoder.vocos_intermediate_dim,
            vocos_num_layers=cfg.encoder.vocos_num_layers,
            out_channels=cfg.encoder.out_channels,
            sample_ratios=list(cfg.encoder.sample_ratios),
        ),
        decoder=wg_mod.WaveGenerator(
            input_channel=cfg.wave.input_channel, channels=cfg.wave.channels,
            rates=list(cfg.wave.rates),
            kernel_sizes=list(cfg.wave.kernel_sizes),
        ),
        quantizer=vq_mod.FactorizedVectorQuantize(
            input_dim=cfg.quantizer_input_dim,
            codebook_size=cfg.quantizer_codebook_size,
            codebook_dim=cfg.quantizer_codebook_dim,
            commitment=cfg.quantizer_commitment,
        ),
        speaker_encoder=spk_mod.SpeakerEncoder(
            input_dim=cfg.speaker.input_dim, out_dim=cfg.speaker.out_dim,
            latent_dim=cfg.speaker.latent_dim, token_num=cfg.speaker.token_num,
            fsq_levels=list(cfg.speaker.fsq_levels),
            fsq_num_quantizers=cfg.speaker.fsq_num_quantizers,
        ),
        prenet=dec_mod.Decoder(
            input_channels=cfg.prenet.input_channels,
            vocos_dim=cfg.prenet.vocos_dim,
            vocos_intermediate_dim=cfg.prenet.vocos_intermediate_dim,
            vocos_num_layers=cfg.prenet.vocos_num_layers,
            out_channels=cfg.prenet.out_channels,
            condition_dim=cfg.prenet.condition_dim,
            sample_ratios=list(cfg.prenet.sample_ratios),
        ),
        postnet=dec_mod.Decoder(
            input_channels=cfg.postnet.input_channels,
            vocos_dim=cfg.postnet.vocos_dim,
            vocos_intermediate_dim=cfg.postnet.vocos_intermediate_dim,
            vocos_num_layers=cfg.postnet.vocos_num_layers,
            out_channels=cfg.postnet.out_channels,
            sample_ratios=list(cfg.postnet.sample_ratios),
        ),
    )
    shapes = _shapes(tm)
    _load_synth(tm, shapes, gc.SEED_WEIGHTS)

    rng = np.random.default_rng(5678)
    feat = rng.standard_normal((1, 16, cfg.encoder.input_channels)).astype(
        np.float32
    )
    ref_wav = (0.1 * rng.standard_normal((1, 1, 4000))).astype(np.float32)
    batch = {
        "feat": torch.from_numpy(feat),
        "ref_wav": torch.from_numpy(ref_wav),
    }
    with torch.no_grad():
        mel = tm.mel_transformer(batch["ref_wav"]).squeeze(1)
        semantic, global_tokens = tm.tokenize(batch)
        wav = tm.detokenize(semantic, global_tokens)
    wav = wav.numpy()
    assert np.isfinite(wav).all() and wav.std() > 1e-6, "degenerate wav"
    fixtures.save_golden(
        os.path.join(out_dir, "bicodec.npz"), shapes, gc.SEED_WEIGHTS,
        feat=feat, ref_wav=ref_wav[:, 0], mel=mel.numpy(),
        semantic=semantic.numpy(), global_tokens=global_tokens.numpy(),
        wav=wav,
    )
    print(
        f"bicodec: semantic {tuple(semantic.shape)} global "
        f"{tuple(global_tokens.shape)} wav {wav.shape} std {wav.std():.4f}"
    )


def capture_flow(out_dir: str) -> None:
    up_mod = reference_shims.import_ref("cosyvoice.transformer.upsample_encoder")
    dec_mod = reference_shims.import_ref("cosyvoice.flow.decoder")
    cfm_mod = reference_shims.import_ref("cosyvoice.flow.flow_matching")
    flow_mod = reference_shims.import_ref("cosyvoice.flow.flow")
    fcfg = gc.flow_config()
    torch.manual_seed(1)
    enc = up_mod.UpsampleConformerEncoder(
        input_size=fcfg.encoder.input_size,
        output_size=fcfg.encoder.output_size,
        attention_heads=fcfg.encoder.attention_heads,
        linear_units=fcfg.encoder.linear_units,
        num_blocks=fcfg.encoder.num_blocks,
        dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="linear",
        pos_enc_layer_type="rel_pos_espnet",
        selfattention_layer_type="rel_selfattn",
        use_cnn_module=False, macaron_style=False,
    )
    est = dec_mod.ConditionalDecoder(
        in_channels=fcfg.estimator.in_channels,
        out_channels=fcfg.estimator.out_channels,
        causal=True, channels=list(fcfg.estimator.channels), dropout=0.0,
        attention_head_dim=fcfg.estimator.attention_head_dim,
        n_blocks=fcfg.estimator.n_blocks,
        num_mid_blocks=fcfg.estimator.num_mid_blocks,
        num_heads=fcfg.estimator.num_heads, act_fn="gelu",
    )
    est.static_chunk_size = 0
    cfm_params = SimpleNamespace(
        t_scheduler="cosine", training_cfg_rate=0.2, inference_cfg_rate=0.7,
        sigma_min=1e-6, solver="euler",
    )
    dec = cfm_mod.CausalConditionalCFM(
        in_channels=240, cfm_params=cfm_params, estimator=est
    )
    tm = flow_mod.CausalMaskedDiffWithXvec(
        input_size=fcfg.input_size, output_size=fcfg.output_size,
        spk_embed_dim=fcfg.spk_embed_dim, vocab_size=fcfg.vocab_size,
        input_frame_rate=25, token_mel_ratio=fcfg.token_mel_ratio,
        pre_lookahead_len=fcfg.pre_lookahead_len, encoder=enc, decoder=dec,
    )
    tm.fp16 = False
    shapes = _shapes(tm)
    _load_synth(tm, shapes, gc.SEED_WEIGHTS)

    rng = np.random.default_rng(6789)
    token = rng.integers(0, fcfg.vocab_size, (1, 6)).astype(np.int64)
    prompt_token = rng.integers(0, fcfg.vocab_size, (1, 4)).astype(np.int64)
    prompt_feat = rng.standard_normal((1, 8, 80)).astype(np.float32)
    embedding = rng.standard_normal((1, fcfg.spk_embed_dim)).astype(np.float32)
    with torch.no_grad():
        mel, _ = tm.inference(
            token=torch.from_numpy(token),
            token_len=torch.tensor([token.shape[1]]),
            prompt_token=torch.from_numpy(prompt_token),
            prompt_token_len=torch.tensor([prompt_token.shape[1]]),
            prompt_feat=torch.from_numpy(prompt_feat),
            prompt_feat_len=torch.tensor([prompt_feat.shape[1]]),
            embedding=torch.from_numpy(embedding),
            finalize=True,
        )
    T_mel = (token.shape[1] + prompt_token.shape[1]) * fcfg.token_mel_ratio
    noise = tm.decoder.rand_noise[:, :, :T_mel].numpy()  # (1, 80, T_mel)
    mel = mel.numpy()
    assert np.isfinite(mel).all() and mel.std() > 1e-6, "degenerate mel"
    fixtures.save_golden(
        os.path.join(out_dir, "flow.npz"), shapes, gc.SEED_WEIGHTS,
        token=token, prompt_token=prompt_token, prompt_feat=prompt_feat,
        embedding=embedding, noise=noise, mel=mel,
    )
    print(f"flow: mel {mel.shape} std {mel.std():.4f}")


def capture_hift(out_dir: str) -> None:
    gen_mod = reference_shims.import_ref("cosyvoice.hifigan.generator")
    f0_mod = reference_shims.import_ref("cosyvoice.hifigan.f0_predictor")
    cfg = gc.hift_config()
    torch.manual_seed(2)
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
    )
    shapes = _shapes(tm)
    _load_synth(tm, shapes, gc.SEED_WEIGHTS)

    rng = np.random.default_rng(7890)
    mel = rng.standard_normal((1, cfg.in_channels, 13)).astype(np.float32)
    with torch.no_grad():
        f0 = tm.f0_predictor(torch.from_numpy(mel))
        wav, source = tm.inference(speech_feat=torch.from_numpy(mel))
    wav = wav.numpy()
    assert np.isfinite(wav).all() and wav.std() > 1e-9, "degenerate wav"
    fixtures.save_golden(
        os.path.join(out_dir, "hift.npz"), shapes, gc.SEED_WEIGHTS,
        mel=mel, f0=f0.numpy(), source=source.squeeze(1).numpy(), wav=wav,
    )
    print(f"hift: wav {wav.shape} std {wav.std():.5f}")


def main():
    out_dir = os.path.join(_HERE, "..", "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    capture_bicodec(out_dir)
    capture_flow(out_dir)
    capture_hift(out_dir)
    for f in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, f)
        print(f"{f}: {os.path.getsize(p) / 1024:.1f} KB")


if __name__ == "__main__":
    main()

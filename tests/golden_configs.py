"""Shared reduced configs for the committed golden fixtures.

Used by BOTH scripts/capture_goldens_torch.py (instantiates the REFERENCE
torch pipelines at these shapes, /root/reference/third_party) and
tests/test_goldens.py (replays the fixtures through the JAX ports with no
torch import). Keep this module torch-free.

Weights are NOT stored in the fixtures: both sides regenerate the same
synthetic state dict from (shape table, seed) via
rwkvtts_tpu.utils.fixtures.synth_state_dict, so a fixture is a few KB of
inputs/outputs instead of MBs of random weights.
"""
from __future__ import annotations

import os

from rwkvtts_tpu.codecs import bicodec, conformer, flow as flow_lib, hift as hift_lib

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

SEED_WEIGHTS = 1234  # synth_state_dict seed shared by capture + replay


def bicodec_config() -> bicodec.BiCodecConfig:
    """Reduced composite BiCodec (reference bicodec.py:152-189 pipeline).

    Constraints mirrored from the full config: quantizer input_dim ==
    encoder out_channels; speaker out_dim == prenet out_channels ==
    prenet condition_dim (d_vector is both the prenet condition and the
    additive residual); wave input_channel == prenet out_channels;
    speaker input_dim == mel num_mels.
    """
    return bicodec.BiCodecConfig(
        mel=bicodec.MelParams(
            sample_rate=16000, n_fft=256, win_length=160, hop_length=80,
            mel_fmin=10.0, mel_fmax=None, num_mels=32,
        ),
        encoder=bicodec.VocosStackConfig(12, 16, 32, 2, 10, sample_ratios=(2, 2)),
        quantizer_codebook_size=32,
        quantizer_codebook_dim=4,
        quantizer_input_dim=10,
        prenet=bicodec.VocosStackConfig(
            10, 16, 32, 2, 12, sample_ratios=(2, 2), condition_dim=12
        ),
        postnet=bicodec.VocosStackConfig(12, 16, 32, 2, 32),
        wave=bicodec.WaveGeneratorConfig(
            input_channel=12, channels=16, rates=(4, 2), kernel_sizes=(8, 4)
        ),
        speaker=bicodec.SpeakerEncoderConfig(
            input_dim=32, out_dim=12, latent_dim=16, token_num=4,
            fsq_levels=(4, 4, 4, 4, 4, 4), fsq_num_quantizers=1,
        ),
    )


def flow_config() -> flow_lib.FlowConfig:
    """Reduced CausalMaskedDiffWithXvec (flow.py:155-241 inference).

    The reference UpsampleConformerEncoder hard-codes 512 channels in its
    Upsample1D (upsample_encoder.py:217), so encoder width stays 512 and
    the reduction is in block counts / ffn width / estimator size.
    """
    return flow_lib.FlowConfig(
        input_size=512,
        output_size=80,
        spk_embed_dim=24,
        vocab_size=50,
        token_mel_ratio=2,
        pre_lookahead_len=3,
        encoder=conformer.UpsampleConformerConfig(
            input_size=512, output_size=512, attention_heads=8,
            linear_units=64, num_blocks=1, num_up_blocks=4,
        ),
        estimator=flow_lib.EstimatorConfig(
            in_channels=320, out_channels=80, channels=(16,),
            n_blocks=1, num_mid_blocks=1, num_heads=2,
            attention_head_dim=4, causal=True, static_chunk_size=0,
        ),
        cfm=flow_lib.CFMConfig(inference_cfg_rate=0.7, t_scheduler="cosine"),
    )


def hift_config() -> hift_lib.HiFTConfig:
    """Reduced HiFTGenerator (generator.py:400-412 inference)."""
    return hift_lib.HiFTConfig(
        in_channels=16,
        base_channels=32,
        sampling_rate=24000,
        upsample_rates=(8, 5, 3),
        upsample_kernel_sizes=(16, 11, 7),
        source_resblock_kernel_sizes=(7, 7, 11),
        source_resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        f0_cond_channels=24,
    )

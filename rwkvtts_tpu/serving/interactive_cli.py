"""Interactive TTS console (the reference's desktop-GUI / interactive-CLI
flows: gradio/tts_gui_simple.py, test_respark/tts_using_webrwkv_osx.py).

Drives a SparkPipeline from the terminal:

    python -m rwkvtts_tpu.serving.interactive_cli --help  (wiring docs)

Commands:
    /voice design            — pick SPCT properties, generate 32 global ids
    /voice clone <wav> [txt] — tokenize a reference clip
    /voice save <name> / /voice use <name>
    /seed N, /save-dir DIR, /quit
    anything else            — synthesize and write wav
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

def _choices():
    from rwkvtts_tpu.serving.service import properties_options

    return properties_options()


def _ask(prompt: str, options) -> str:
    print(f"{prompt} {options} [default {options[0]}]")
    ans = input("> ").strip()
    return ans if ans in options else options[0]


def repl(pipeline, save_dir: str = "tts_out") -> None:
    """Blocking console loop over a SparkPipeline-compatible object."""
    from rwkvtts_tpu.utils import audio_io

    os.makedirs(save_dir, exist_ok=True)
    voices: Dict[str, Any] = {}
    current: Optional[Dict[str, Any]] = None
    seed = 0
    print("rwkvtts_tpu interactive console — /voice design | /voice clone <wav> | /quit")
    while True:
        try:
            line = input("tts> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        if line == "/quit":
            break
        if line.startswith("/seed "):
            seed = int(line.split()[1])
            continue
        if line.startswith("/save-dir "):
            save_dir = line.split(None, 1)[1]
            os.makedirs(save_dir, exist_ok=True)
            continue
        if line == "/voice design":
            ch = _choices()
            props = {k: _ask(k, v) for k, v in ch.items()}
            globals_ = pipeline.design_voice(props, seed=seed)
            current = {"global_tokens": globals_}
            print(f"designed voice: 32 global tokens {globals_[:8]}…")
            continue
        if line.startswith("/voice clone "):
            parts = line.split(None, 3)
            wav = audio_io.load_wav(parts[2], 16000, volume_normalize=True)
            glob, sem = pipeline.codec.tokenize(wav)
            current = {
                "global_tokens": glob.reshape(-1).tolist(),
                "prompt_wav": wav,
                "prompt_text": parts[3] if len(parts) > 3 else None,
            }
            print("cloned voice from", parts[2])
            continue
        if line.startswith("/voice save "):
            if current:
                voices[line.split()[2]] = current
                print("saved")
            continue
        if line.startswith("/voice use "):
            current = voices.get(line.split()[2])
            print("ok" if current else "unknown voice")
            continue
        if current is None:
            print("no voice selected — /voice design or /voice clone first")
            continue
        t0 = time.perf_counter()
        if "prompt_wav" in current and current.get("prompt_text"):
            res = pipeline.synthesize(
                line, prompt_wav=current["prompt_wav"],
                prompt_text=current["prompt_text"], seed=seed,
            )
        else:
            res = pipeline.synthesize(
                line, global_tokens=current["global_tokens"], seed=seed
            )
        path = os.path.join(save_dir, f"tts_{int(time.time())}.wav")
        audio_io.save_wav(path, res.wav, res.sample_rate)
        dur = len(res.wav) / res.sample_rate
        print(f"{path}  ({dur:.2f}s audio, {time.perf_counter()-t0:.2f}s wall, "
              f"{res.tokens_per_s:.0f} tok/s)")

"""HTTP TTS service — stdlib ThreadingHTTPServer (framework-free), plus a
gated FastAPI app factory for environments that have it.

Endpoint parity (/root/reference/service/rwkv_tts_service.py:67-178):
  POST /api/rwkv_tts           {text, speaker? | audio(b64 wav)+prompt_text?}
  POST /api/rwkv_tts_instruct  {text, properties{age,gender,emotion,pitch,speed}}
  GET  /api/speakers           -> {"speakers": [...]}
Responses: audio/wav bytes (or JSON error).
"""
from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

from rwkvtts_tpu.serving import service as svc

log = logging.getLogger("rwkvtts_tpu.serving")

# Built-in web demo (the reference's gradio/tts_demo_page.py equivalent —
# a thin page over the HTTP API; no gradio dependency).
DEMO_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>RWKV TTS (TPU)</title>
<style>
body{font-family:system-ui;max-width:720px;margin:40px auto;padding:0 16px}
textarea{width:100%;height:90px;font-size:15px}
select,button{font-size:15px;padding:6px 14px;margin:8px 4px 8px 0}
fieldset{border:1px solid #ccc;margin:12px 0}
#status{color:#666;margin-left:8px}
</style></head><body>
<h2>RWKV TTS — TPU service demo</h2>
<textarea id="text" placeholder="Text to speak…">今天天气不错。</textarea>
<fieldset><legend>Voice</legend>
<label>Speaker <select id="speaker"><option value="">(properties)</option></select></label>
<label>Gender <select id="gender"><option>female</option><option>male</option></select></label>
<label>Pitch <select id="pitch"><option>medium_pitch</option><option>low_pitch</option><option>high_pitch</option><option>very_high_pitch</option></select></label>
<label>Speed <select id="speed"><option>medium</option><option>slow</option><option>fast</option><option>very_fast</option><option>very_slow</option></select></label>
</fieldset>
<button onclick="speak()">Speak</button><span id="status"></span>
<div><audio id="player" controls style="width:100%;margin-top:12px"></audio></div>
<script>
fetch('/api/speakers').then(r=>r.json()).then(d=>{
  const s=document.getElementById('speaker');
  for(const name of d.speakers){const o=document.createElement('option');o.value=name;o.textContent=name;s.appendChild(o);}
});
async function speak(){
  const status=document.getElementById('status');status.textContent='synthesizing…';
  const speaker=document.getElementById('speaker').value;
  const text=document.getElementById('text').value;
  let url='/api/rwkv_tts', body={text};
  if(speaker){body.speaker=speaker;}
  else{url='/api/rwkv_tts_instruct';body.properties={
    gender:document.getElementById('gender').value,
    pitch:document.getElementById('pitch').value,
    speed:document.getElementById('speed').value};}
  const r=await fetch(url,{method:'POST',headers:{'Content-Type':'application/json'},body:JSON.stringify(body)});
  if(!r.ok){status.textContent='error: '+(await r.text());return;}
  const blob=await r.blob();
  document.getElementById('player').src=URL.createObjectURL(blob);
  document.getElementById('player').play();
  status.textContent='done';
}
</script></body></html>
"""


def _make_handler(tts: svc.BatchedTTSService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            log.info("%s " + fmt, self.client_address[0], *args)

        def _json(self, code: int, obj: Dict[str, Any]):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _wav(self, wav: np.ndarray, sr: int):
            body = svc.wav_bytes(wav, sr)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/api/speakers":
                self._json(200, {"speakers": tts.speakers.speakers()})
            elif self.path == "/health":
                self._json(200, {"status": "ok"})
            elif self.path in ("/", "/demo"):
                body = DEMO_PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return self._json(400, {"error": "bad json"})
            if self.path not in ("/api/rwkv_tts", "/api/rwkv_tts_instruct"):
                return self._json(404, {"error": "not found"})
            text = payload.get("text")
            if not text:
                return self._json(400, {"error": "missing text"})
            req = svc.TTSRequest(text=text, seed=int(payload.get("seed", 0)))
            if self.path == "/api/rwkv_tts_instruct":
                req.properties = payload.get("properties", {})
            elif payload.get("speaker"):
                req.speaker = payload["speaker"]
            elif payload.get("audio"):
                req.prompt_wav = svc.decode_audio_b64(payload["audio"])
                req.prompt_text = payload.get("prompt_text")
            else:
                return self._json(400, {"error": "need speaker, audio, or properties"})
            resp = tts.synthesize(req)
            if resp.error:
                return self._json(500, {"error": resp.error})
            self._wav(resp.wav, resp.sample_rate)

    return Handler


def serve(tts: svc.BatchedTTSService, host: str = "0.0.0.0", port: int = 8000):
    server = ThreadingHTTPServer((host, port), _make_handler(tts))
    log.info("TTS service on %s:%d", host, port)
    server.serve_forever()


def start_background(tts: svc.BatchedTTSService, host="127.0.0.1", port=0):
    """Start the server on a daemon thread; returns (server, port)."""
    server = ThreadingHTTPServer((host, port), _make_handler(tts))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]


def make_fastapi_app(tts: svc.BatchedTTSService):
    """FastAPI variant of the same endpoints (gated import)."""
    from fastapi import FastAPI, HTTPException
    from fastapi.responses import Response

    app = FastAPI(title="rwkvtts_tpu")

    @app.get("/api/speakers")
    def speakers():
        return {"speakers": tts.speakers.speakers()}

    @app.post("/api/rwkv_tts")
    def rwkv_tts(payload: Dict[str, Any]):
        req = svc.TTSRequest(text=payload["text"], seed=int(payload.get("seed", 0)))
        if payload.get("speaker"):
            req.speaker = payload["speaker"]
        elif payload.get("audio"):
            req.prompt_wav = svc.decode_audio_b64(payload["audio"])
            req.prompt_text = payload.get("prompt_text")
        resp = tts.synthesize(req)
        if resp.error:
            raise HTTPException(500, resp.error)
        return Response(svc.wav_bytes(resp.wav, resp.sample_rate), media_type="audio/wav")

    @app.post("/api/rwkv_tts_instruct")
    def rwkv_tts_instruct(payload: Dict[str, Any]):
        req = svc.TTSRequest(text=payload["text"], properties=payload.get("properties", {}))
        resp = tts.synthesize(req)
        if resp.error:
            raise HTTPException(500, resp.error)
        return Response(svc.wav_bytes(resp.wav, resp.sample_rate), media_type="audio/wav")

    return app

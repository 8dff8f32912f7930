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

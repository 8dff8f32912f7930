"""MP3 response encoding (ctypes LAME binding; reference serves wav AND
mp3 — rwkv_tts_service.py:72-99)."""
import json
import threading
import urllib.request

import numpy as np
import pytest

from rwkvtts_tpu.utils import mp3


pytestmark = pytest.mark.skipif(
    not mp3.available(), reason="libmp3lame not present on this host"
)


def _sine(sr=16000, secs=0.5, hz=440.0):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_encode_produces_mpeg_frames():
    sr = 16000
    b = mp3.encode_mp3(_sine(sr), sr)
    assert len(b) > 1000
    # MPEG frame sync: 11 set bits
    assert b[0] == 0xFF and (b[1] & 0xE0) == 0xE0
    # roughly CBR 128kbps for 0.5s -> ~8KB (+ LAME header frame)
    assert 4000 < len(b) < 20000


def test_encode_empty_and_scaling():
    sr = 24000
    b = mp3.encode_mp3(np.zeros(0, np.float32), sr)
    assert isinstance(b, bytes)  # flush-only stream
    # clipping input does not crash and stays bounded
    b2 = mp3.encode_mp3(np.full(2400, 3.0, np.float32), sr)
    assert b2[0] == 0xFF


def test_http_mp3_response():
    from rwkvtts_tpu.serving import http_server, service as svc

    class FakeResult:
        def __init__(self):
            self.wav = _sine()
            self.sample_rate = 16000

    class FakePipe:
        def synthesize(self, texts, **kw):
            return [FakeResult() for _ in (texts if isinstance(texts, list) else [texts])]

    lib = svc.SpeakerLibrary(None)
    lib.register("amy", [1] * 32)
    tts = svc.BatchedTTSService(FakePipe(), lib, max_batch=1, max_wait_ms=1)
    server, port = http_server.start_background(tts)
    body = json.dumps(
        {"text": "hi", "speaker": "amy", "audio_format": "mp3"}
    ).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/rwkv_tts", body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "audio/mpeg"
        data = r.read()
    assert data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    # wav remains the default
    body = json.dumps({"text": "hi", "speaker": "amy"}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/rwkv_tts", body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        assert r.read()[:4] == b"RIFF"
    server.shutdown()
    tts.close()

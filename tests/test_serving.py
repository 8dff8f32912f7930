"""Service tests: batched dispatcher groups same-voice requests, HTTP
endpoints round-trip wav, speaker library caching."""
import base64
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from rwkvtts_tpu.serving import http_server, service as svc
from rwkvtts_tpu.utils import audio_io


class FakeResult:
    def __init__(self, n):
        self.wav = np.zeros(n, np.float32)
        self.sample_rate = 16000


class FakePipeline:
    """Records batch sizes; returns one short wav per text."""

    def __init__(self):
        self.calls = []

    def synthesize(self, texts, **kw):
        if isinstance(texts, str):
            texts = [texts]
        self.calls.append((list(texts), kw))
        return [FakeResult(100 + len(t)) for t in texts]


def test_batched_dispatch_groups_same_speaker():
    pipe = FakePipeline()
    lib = svc.SpeakerLibrary(None)
    lib.register("alice", list(range(32)))
    tts = svc.BatchedTTSService(pipe, lib, max_batch=4, max_wait_ms=200)

    results = [None] * 3

    def call(i):
        results[i] = tts.synthesize(svc.TTSRequest(text=f"t{i}", speaker="alice"))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    tts.close()

    assert all(r is not None and r.error is None for r in results)
    # at least one call should have batched >1 request
    batch_sizes = [len(texts) for texts, _ in pipe.calls]
    assert sum(batch_sizes) == 3
    assert max(batch_sizes) >= 2
    # global tokens resolved from the library
    assert pipe.calls[0][1]["global_tokens"] == list(range(32))


def test_http_endpoints(tmp_path):
    pipe = FakePipeline()
    lib = svc.SpeakerLibrary(None)
    lib.register("bob", [1] * 32)
    tts = svc.BatchedTTSService(pipe, lib, max_batch=1, max_wait_ms=1)
    server, port = http_server.start_background(tts)
    base = f"http://127.0.0.1:{port}"

    with urllib.request.urlopen(f"{base}/api/speakers") as r:
        assert json.loads(r.read()) == {"speakers": []}

    body = json.dumps({"text": "hello", "speaker": "bob"}).encode()
    req = urllib.request.Request(
        f"{base}/api/rwkv_tts", data=body, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        wav_bytes = r.read()
    assert wav_bytes[:4] == b"RIFF"

    # instruct endpoint with properties
    body = json.dumps({"text": "hi", "properties": {"gender": "male"}}).encode()
    req = urllib.request.Request(
        f"{base}/api/rwkv_tts_instruct", data=body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.read()[:4] == b"RIFF"

    # error paths
    req = urllib.request.Request(
        f"{base}/api/rwkv_tts", data=b"{}", headers={"Content-Type": "application/json"}
    )
    try:
        urllib.request.urlopen(req)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400

    server.shutdown()
    tts.close()


def test_audio_b64_roundtrip(tmp_path):
    wav = np.sin(np.linspace(0, 50, 8000)).astype(np.float32) * 0.3
    p = tmp_path / "a.wav"
    audio_io.save_wav(p, wav, 16000)
    b64 = base64.b64encode(open(p, "rb").read()).decode()
    out = svc.decode_audio_b64(b64)
    assert abs(len(out) - 8000) < 4
    np.testing.assert_allclose(out[:100], wav[:100], atol=1e-3)

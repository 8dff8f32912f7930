"""SFM collator + demo page smoke tests."""
import numpy as np

from rwkvtts_tpu.data import sfm_collator


def test_sfm_collate_precomputed_feat():
    rows = [
        {
            "speech_token": [1, 2, 3],
            "speech_feat": np.ones((6, 80), np.float32),
            "embedding": np.ones(192, np.float32),
        },
        {"speech_token": [4, 5], "speech_feat": np.ones((4, 80), np.float32)},
    ]
    b = sfm_collator.collate(rows)
    assert b["tokens"].shape == (2, 3)
    assert b["feat"].shape == (2, 6, 80)
    np.testing.assert_array_equal(b["token_mask"], [[1, 1, 1], [1, 1, 0]])
    np.testing.assert_array_equal(b["feat_mask"][1], [1, 1, 1, 1, 0, 0])
    assert b["embedding"][0].sum() == 192 and b["embedding"][1].sum() == 0


def test_sfm_collate_audio_mel():
    rows = [{"speech_token": [1, 2], "audio": np.zeros(24000, np.float32)}]
    b = sfm_collator.collate(rows)
    assert b["feat"].shape == (1, 4, 80)
    assert np.isfinite(b["feat"]).all()


def test_demo_page_served():
    import json
    import urllib.request

    from rwkvtts_tpu.serving import http_server, service as svc

    class P:
        def synthesize(self, texts, **kw):
            raise RuntimeError("unused")

    tts = svc.BatchedTTSService(P(), max_batch=1, max_wait_ms=1)
    server, port = http_server.start_background(tts)
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
        html = r.read().decode()
    assert "RWKV TTS" in html and "/api/rwkv_tts" in html
    server.shutdown()
    tts.close()

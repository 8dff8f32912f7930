"""Native C++ tar shard streamer (csrc/tar_stream.cpp): parity with the
stdlib tarfile path, GNU long names, error containment."""
import io
import json
import tarfile
import wave

import numpy as np
import pytest

from rwkvtts_tpu.data import webdataset as wds

try:
    from rwkvtts_tpu.utils.native import NativeTarStream

    NativeTarStream([])
    HAVE_NATIVE = True
except Exception:  # noqa: BLE001
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="no native build")


def _wav_bytes(n=1600, sr=16000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        x = (np.sin(np.linspace(0, 30, n)) * 10000).astype("<i2")
        w.writeframes(x.tobytes())
    return buf.getvalue()


def _make_tar(path, keys, long_name=False):
    with tarfile.open(path, "w", format=tarfile.GNU_FORMAT) as tf:
        for k in keys:
            stem = ("x" * 120 + k) if long_name else k
            for ext, data in (
                ("wav", _wav_bytes()),
                ("json", json.dumps({"text": f"t-{k}"}).encode()),
            ):
                info = tarfile.TarInfo(f"{stem}.{ext}")
                data_io = io.BytesIO(data)
                info.size = len(data)
                tf.addfile(info, data_io)
    return path


def test_members_match_tarfile(tmp_path):
    p = _make_tar(tmp_path / "a.tar", ["k0", "k1", "k2"])
    with tarfile.open(p) as tf:
        expected = [(m.name, tf.extractfile(m).read()) for m in tf if m.isfile()]
    got = list(NativeTarStream([str(p)]))
    assert [n for _, n, _ in got] == [n for n, _ in expected]
    assert all(sh == 0 for sh, _, _ in got)
    for (_, _, a), (_, b) in zip(got, expected):
        assert a == b


def test_gnu_long_names(tmp_path):
    p = _make_tar(tmp_path / "b.tar", ["key"], long_name=True)
    names = [n for _, n, _ in NativeTarStream([str(p)])]
    assert names == ["x" * 120 + "key.wav", "x" * 120 + "key.json"]


def test_multi_shard_order_and_samples(tmp_path):
    p1 = _make_tar(tmp_path / "s1.tar", ["a", "b"])
    p2 = _make_tar(tmp_path / "s2.tar", ["c"])
    samples = list(wds.stream_tars([str(p1), str(p2)], native=True))
    assert [s["__key__"] for s in samples] == ["a", "b", "c"]
    assert all("audio" in s and s["text"].startswith("t-") for s in samples)
    # parity with the pure-python path
    ref = list(wds.stream_tars([str(p1), str(p2)], native=False))
    assert [s["__key__"] for s in ref] == [s["__key__"] for s in samples]
    np.testing.assert_allclose(samples[0]["audio"], ref[0]["audio"], atol=0)


def test_corrupt_shard_contained(tmp_path):
    good = _make_tar(tmp_path / "g.tar", ["ok"])
    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"this is not a tar header" * 40)
    ts = NativeTarStream([str(bad), str(good)])
    items = list(ts)
    names = [n for _, n, _ in items]
    # shard indices distinguish sources
    assert all(sh == 1 for sh, _, _ in items)
    # the corrupt shard is abandoned; the good one still streams
    assert names == ["ok.wav", "ok.json"]
    assert ts.errors >= 1
    ts.close()


def test_early_close_no_hang(tmp_path):
    p = _make_tar(tmp_path / "c.tar", [f"k{i}" for i in range(50)])
    ts = NativeTarStream([str(p)], queue_cap=2)
    it = iter(ts)
    next(it)
    ts.close()  # reader blocked on the full queue must exit cleanly


def test_shuffle_buffer(tmp_path):
    p = _make_tar(tmp_path / "sh.tar", [f"k{i:02d}" for i in range(20)])
    plain = [s["__key__"] for s in wds.stream_tars([str(p)])]
    shuf = [s["__key__"] for s in wds.stream_tars([str(p)], shuffle_buffer=8, seed=1)]
    assert sorted(shuf) == sorted(plain) and shuf != plain
    # deterministic for a given seed
    shuf2 = [s["__key__"] for s in wds.stream_tars([str(p)], shuffle_buffer=8, seed=1)]
    assert shuf == shuf2


def test_pax_long_names(tmp_path):
    """Python tarfile's default PAX format stores >100-char names in 'x'
    extended headers — they must override the truncated ustar field."""
    p = tmp_path / "pax.tar"
    long_stem = "d/" * 60 + "sample_000123"  # 122+ chars
    with tarfile.open(p, "w", format=tarfile.PAX_FORMAT) as tf:
        for ext, data in (("wav", _wav_bytes()), ("json", b'{"text": "t"}')):
            info = tarfile.TarInfo(f"{long_stem}.{ext}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    items = list(NativeTarStream([str(p)]))
    assert [n for _, n, _ in items] == [f"{long_stem}.wav", f"{long_stem}.json"]
    # the wav/json pair still groups into one sample
    samples = list(wds.stream_tars([str(p)], native=True))
    assert len(samples) == 1 and samples[0]["__key__"] == long_stem

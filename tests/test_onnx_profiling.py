"""ONNX initializer extraction (hand-built protobuf) + profiling utils."""
import struct

import numpy as np

from rwkvtts_tpu.utils import onnx_import, profiling


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wt: int, payload: bytes) -> bytes:
    head = _varint((num << 3) | wt)
    if wt == 2:
        return head + _varint(len(payload)) + payload
    return head + payload


def _tensor(name: str, arr: np.ndarray) -> bytes:
    buf = b""
    for d in arr.shape:
        buf += _field(1, 0, _varint(d))
    dtype = {np.float32: 1, np.int64: 7}[arr.dtype.type]
    buf += _field(2, 0, _varint(dtype))
    buf += _field(8, 2, name.encode())
    buf += _field(9, 2, arr.tobytes())
    return buf


def test_onnx_initializer_roundtrip(tmp_path):
    w = np.random.default_rng(0).standard_normal((3, 4)).astype(np.float32)
    b = np.arange(5, dtype=np.int64)
    graph = _field(5, 2, _tensor("w", w)) + _field(5, 2, _tensor("b", b))
    model = _field(7, 2, graph)
    p = tmp_path / "m.onnx"
    p.write_bytes(model)
    out = onnx_import.load_onnx_initializers(str(p))
    np.testing.assert_allclose(out["w"], w)
    np.testing.assert_array_equal(out["b"], b)


def test_phase_timer():
    t = profiling.PhaseTimer()
    with t.phase("decode", tokens=100, audio_seconds=2.0):
        pass
    with t.phase("decode", tokens=100, audio_seconds=2.0):
        pass
    s = t.summary()
    assert s["decode"]["calls"] == 2
    assert "decode" in t.report()


def test_measure():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 2 + 1)
    m = profiling.measure(f, jnp.ones((8, 8)), iters=2)
    assert m["compile_s"] >= m["steady_s"] >= 0

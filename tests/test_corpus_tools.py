"""Raw-corpus tooling: parquet->JSONL resume, shard writer round-trip,
text-keyed cache, fp32->bf16 cast.

Reference parity targets: data/utils/create_lm_corpus_from_raw.py,
create_embeddings_from_raw.py, convert_to_wds.py, utils/voxbox_lmdb_utils.py,
utils/convert_from_fp32_to_bf16.py.
"""
import json
import os

import numpy as np
import pytest

from rwkvtts_tpu.data import corpus_tools
from rwkvtts_tpu.data.webdataset import iter_tar_samples
from rwkvtts_tpu.utils import audio_io


def _wav_bytes(n=1600, sr=16000, f=440.0):
    import io
    import wave

    t = np.arange(n, dtype=np.float32) / sr
    audio = (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    pcm = (audio * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


@pytest.fixture
def parquet_file(tmp_path):
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    rows = {
        "audio": [{"bytes": _wav_bytes(f=200.0 + 50 * i), "path": None} for i in range(5)],
        "transcription": [f"utterance {i}" for i in range(5)],
        "language": ["zh", "en", "zh", "en", "zh"],
        "speaker": ["a", "a", "b", "b", "b"],
    }
    path = tmp_path / "corpus.parquet"
    pq.write_table(pa.table(rows), path)
    return str(path)


def test_iter_parquet_rows_decodes_audio(parquet_file):
    rows = list(corpus_tools.iter_parquet_rows(parquet_file, sample_rate=16000))
    assert len(rows) == 5
    assert rows[0]["audio"].dtype == np.float32
    assert rows[0]["audio"].shape == (1600,)
    assert rows[2]["transcription"] == "utterance 2"
    # skip honors the resume contract (no re-decode of done rows)
    tail = list(corpus_tools.iter_parquet_rows(parquet_file, skip=3))
    assert [r["transcription"] for r in tail] == ["utterance 3", "utterance 4"]


def test_build_jsonl_resume(parquet_file, tmp_path):
    out_dir = str(tmp_path / "out")
    calls = []

    def tok_fn(audio):
        calls.append(1)
        return [1, 2, 3]

    row_fn = corpus_tools.cosy_token_row_fn(tok_fn)
    n = corpus_tools.build_jsonl_from_parquet([parquet_file], out_dir, row_fn)
    assert n == 5 and len(calls) == 5
    out = os.path.join(out_dir, "corpus_tokens.jsonl")
    rows = [json.loads(l) for l in open(out, encoding="utf-8")]
    assert rows[0] == {
        "tts_speech_tokens": [1, 2, 3],
        "text": "utterance 0",
        "language": "zh",
        "speaker": "a",
        "prompt_text": "",
        "llm_prompt_speech_token": [],
    }

    # truncate to 2 rows -> resume processes exactly the remaining 3
    with open(out, encoding="utf-8") as f:
        keep = [next(f) for _ in range(2)]
    with open(out, "w", encoding="utf-8") as f:
        f.writelines(keep)
    calls.clear()
    n2 = corpus_tools.build_jsonl_from_parquet([parquet_file], out_dir, row_fn)
    assert n2 == 3 and len(calls) == 3
    rows = [json.loads(l) for l in open(out, encoding="utf-8")]
    assert [r["text"] for r in rows] == [f"utterance {i}" for i in range(5)]


def test_xvector_row_fn_caps_per_speaker(parquet_file, tmp_path):
    row_fn = corpus_tools.xvector_row_fn(
        lambda audio: np.ones(4, np.float32), per_speaker_cap=1
    )
    n = corpus_tools.build_jsonl_from_parquet(
        [parquet_file], str(tmp_path / "emb"), row_fn, resume=False
    )
    # 5 rows over (a,zh),(a,en),(b,zh),(b,en),(b,zh): cap=1 drops the dup
    assert n == 4
    rows = [
        json.loads(l)
        for l in open(tmp_path / "emb" / "corpus_tokens.jsonl", encoding="utf-8")
    ]
    assert all(r["embedding"] == [1.0] * 4 for r in rows)


def test_write_shards_roundtrip(tmp_path):
    sr = 16000
    samples = [
        {
            "__key__": f"utt{i}",
            "audio": np.full(800, 0.25, np.float32),
            "text": f"t{i}",
            "speaker": "s",
        }
        for i in range(5)
    ]
    paths = corpus_tools.write_shards(
        samples, str(tmp_path), samples_per_shard=2, sample_rate=sr
    )
    assert len(paths) == 3  # 2+2+1
    back = [s for p in paths for s in iter_tar_samples(p, sr)]
    assert [s["__key__"] for s in back] == [f"utt{i}" for i in range(5)]
    assert back[0]["text"] == "t0" and back[0]["speaker"] == "s"
    np.testing.assert_allclose(back[0]["audio"], 0.25, atol=1e-3)


def test_repack_tars_merges_metadata(tmp_path):
    src = corpus_tools.write_shards(
        [{"__key__": "k0", "audio": np.zeros(160, np.float32), "text": "hello"}],
        str(tmp_path / "src"),
    )
    # gzip one input to cover the .tar.gz branch
    import gzip
    import shutil

    gz = str(tmp_path / "src" / "shard-000000.tar.gz")
    with open(src[0], "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    outs = corpus_tools.repack_tars(
        [gz], str(tmp_path / "dst"), metadata={"k0": {"speaker": "zed"}}
    )
    (sample,) = list(iter_tar_samples(outs[0]))
    assert sample["text"] == "hello" and sample["speaker"] == "zed"


def test_text_keyed_cache(tmp_path):
    db = str(tmp_path / "cache.sqlite")
    with corpus_tools.TextKeyedCache(db) as cache:
        cache.put("你好世界", {"tokens": [5, 6]})
        cache.put("hello", {"tokens": [7]})
        assert cache.get("你好世界") == {"tokens": [5, 6]}
        assert cache.get("missing") is None
        assert len(cache) == 2
    # reopen: persisted
    with corpus_tools.TextKeyedCache(db) as cache:
        assert cache.get("hello") == {"tokens": [7]}


def test_cache_build_from_tars(tmp_path):
    shard = corpus_tools.write_shards(
        [
            {"__key__": "a", "text": "row one", "tokens": [1]},
            {"__key__": "b", "text": "row two", "tokens": [2]},
            {"__key__": "c", "tokens": [3]},  # no text: skipped
        ],
        str(tmp_path),
    )
    with corpus_tools.TextKeyedCache(str(tmp_path / "c.sqlite")) as cache:
        n = cache.build_from_tars(shard)
        assert n == 2
        # value stores the row minus text (voxbox_lmdb_utils semantics)
        assert cache.get("row one") == {"tokens": [1]}


def test_cast_fp32_to_bf16(tmp_path):
    torch = pytest.importorskip("torch")
    from rwkvtts_tpu.convert.rwkv7_ckpt import cast_fp32_to_bf16

    sd = {
        "w": torch.ones(3, 3, dtype=torch.float32),
        "kept": torch.ones(2, dtype=torch.int64),
    }
    src, dst = str(tmp_path / "in.pt"), str(tmp_path / "out.pt")
    torch.save(sd, src)
    assert cast_fp32_to_bf16(src, dst) == 1
    out = torch.load(dst, weights_only=True)
    assert out["w"].dtype == torch.bfloat16
    assert out["kept"].dtype == torch.int64


def test_corpus_tools_cli(tmp_path, capsys):
    shard = corpus_tools.write_shards(
        [{"__key__": "x", "text": "cli row", "tokens": [9]}], str(tmp_path)
    )
    db = str(tmp_path / "cli.sqlite")
    corpus_tools.main(["cache-build", shard[0], "--db", db])
    corpus_tools.main(["cache-get", "--db", db, "--text", "cli row"])
    out = capsys.readouterr().out
    assert '"tokens": [9]' in out

"""CLI end-to-end: --dry-run over a tiny synthetic corpus for each
jsonl-backed task family."""
import json

import numpy as np
import pytest

from rwkvtts_tpu.train import cli


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_cli_dry_run_spark(tmp_path):
    rng = np.random.default_rng(0)
    rows = [
        {
            "text": f"hello {i}",
            "global_tokens": rng.integers(0, 4096, 4).tolist(),
            "semantic_tokens": rng.integers(0, 100, 12).tolist(),
        }
        for i in range(4)
    ]
    data = tmp_path / "d.jsonl"
    _write_jsonl(data, rows)
    cli.main([
        "--task", "spark", "--data", str(data),
        "--hidden", "32", "--layers", "2", "--head-size", "8",
        "--no-bf16", "--batch-size", "2", "--pad-to", "64",
        "--run-dir", str(tmp_path / "run"), "--dry-run",
    ])


def test_cli_dry_run_spark_sp_mesh(tmp_path):
    """--mesh dp=2,sp=4: time-axis sequence parallelism through the full
    CLI path (mesh build, wkv_spans auto-set, sharded train step)."""
    rng = np.random.default_rng(1)
    rows = [
        {
            "text": f"hello {i}",
            "global_tokens": rng.integers(0, 4096, 4).tolist(),
            "semantic_tokens": rng.integers(0, 100, 12).tolist(),
        }
        for i in range(4)
    ]
    data = tmp_path / "d.jsonl"
    _write_jsonl(data, rows)
    cli.main([
        "--task", "spark", "--data", str(data),
        "--hidden", "32", "--layers", "2", "--head-size", "8",
        "--no-bf16", "--batch-size", "2", "--pad-to", "64",
        "--mesh", "dp=2,sp=4",
        "--run-dir", str(tmp_path / "run"), "--dry-run",
    ])


def test_cli_dry_run_xy(tmp_path):
    rng = np.random.default_rng(1)
    rows = [
        {"text": f"t{i}", "audio_tokens": rng.integers(0, 1024, (8, 6)).tolist()}
        for i in range(4)
    ]
    data = tmp_path / "x.jsonl"
    _write_jsonl(data, rows)
    cli.main([
        "--task", "xy", "--data", str(data),
        "--hidden", "32", "--layers", "2", "--head-size", "8",
        "--no-bf16", "--batch-size", "2", "--pad-to", "64",
        "--run-dir", str(tmp_path / "run"), "--dry-run",
    ])


def test_cli_dry_run_two_tower(tmp_path):
    rng = np.random.default_rng(2)
    rows = [
        {
            "text": f"t{i}",
            "global_tokens": rng.integers(0, 4096, 4).tolist(),
            "semantic_tokens": rng.integers(0, 8192, 8).tolist(),
        }
        for i in range(4)
    ]
    data = tmp_path / "tt.jsonl"
    _write_jsonl(data, rows)
    cli.main([
        "--task", "tts_two_tower", "--data", str(data),
        "--hidden", "32", "--layers", "1", "--head-size", "8",
        "--no-bf16", "--batch-size", "2", "--pad-to", "32",
        "--run-dir", str(tmp_path / "run"), "--dry-run",
    ])

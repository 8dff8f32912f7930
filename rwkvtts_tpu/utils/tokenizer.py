"""RWKV "world" tokenizer — byte-level greedy longest-match, 65536 ids.

Fresh implementation of the tokenizer contract used throughout the reference
(reference tokenizer/rwkv_tokenizer.py: trie-based greedy longest match over
the v20230424 world vocabulary; id 0 = <|endoftext|>). The vocabulary file is
the published RWKV data asset, vendored in rwkvtts_tpu/assets/.

Design: instead of a Python object trie (one dict per node), matching runs
over a flat dict-of-bytes keyed by prefix length buckets — the vocab's max
token length is small (~128 bytes) and most tokens are short, so at each
position we probe candidate lengths longest-first with a per-first-byte max
length table. This is O(T · maxlen_for_first_byte) with tiny constants and
no recursion; encode speed is far from the training hot path anyway
(host-side ETL).

Added tokens (SPCT_*, bicodec tags, [S*]/[CTL*]/[SP*]) are appended AFTER
the base vocab, matching the id assignment of HF `tokenizer.add_tokens`
(reference utils/enlarge_sparkllm_textvocab.py:39-41: SPCT_i = 65536+i).
Added tokens are matched greedily before byte-level encoding, mirroring HF
special-token splitting.
"""
from __future__ import annotations

import ast
import functools
import os
from typing import Dict, Iterable, List, Optional, Sequence

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")
VOCAB_FILE = os.path.abspath(
    os.path.join(_ASSET_DIR, "rwkv_vocab_v20230424.txt")
)

ENDOFTEXT_ID = 0
WORLD_VOCAB_SIZE = 65536


class WorldTokenizer:
    def __init__(
        self,
        vocab_file: str = VOCAB_FILE,
        added_tokens: Sequence[str] = (),
    ):
        self.id_to_bytes: Dict[int, bytes] = {ENDOFTEXT_ID: b"<|endoftext|>"}
        self.bytes_to_id: Dict[bytes, int] = {}
        with open(vocab_file, "r", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                idx_str, rest = line.split(" ", 1)
                tok_repr, length = rest.rsplit(" ", 1)
                tok = ast.literal_eval(tok_repr)
                bs = tok.encode("utf-8") if isinstance(tok, str) else tok
                assert len(bs) == int(length), line
                idx = int(idx_str)
                self.id_to_bytes[idx] = bs
                self.bytes_to_id[bs] = idx

        # Native C++ trie fast path (csrc/world_tokenizer.cpp); falls back
        # to the pure-Python matcher below when no compiler is available.
        self._native = None
        try:
            from rwkvtts_tpu.utils.native import NativeTrieEncoder

            self._native = NativeTrieEncoder(
                (tid, bs) for bs, tid in self.bytes_to_id.items()
            )
        except Exception:
            self._native = None

        # Longest-match acceleration: for each first byte, the sorted set of
        # token lengths that occur, longest first.
        by_first: Dict[int, set] = {}
        for bs in self.bytes_to_id:
            by_first.setdefault(bs[0], set()).add(len(bs))
        self._lengths_by_first = {
            b: sorted(ls, reverse=True) for b, ls in by_first.items()
        }

        # Added tokens: appended ids, matched on the *string* level first.
        self.added_token_to_id: Dict[str, int] = {}
        self.id_to_added: Dict[int, str] = {}
        self._base_size = WORLD_VOCAB_SIZE
        for i, t in enumerate(added_tokens):
            tid = self._base_size + i
            self.added_token_to_id[t] = tid
            self.id_to_added[tid] = t
        self._added_sorted = sorted(
            self.added_token_to_id, key=len, reverse=True
        )

    # -- core byte-level encode ---------------------------------------------
    def _encode_bytes(self, src: bytes) -> List[int]:
        if self._native is not None:
            return self._native.encode_bytes(src)
        out: List[int] = []
        i, n = 0, len(src)
        b2id = self.bytes_to_id
        lengths = self._lengths_by_first
        while i < n:
            first = src[i]
            tid = None
            for ln in lengths.get(first, ()):  # longest first
                if i + ln > n:
                    continue
                cand = src[i : i + ln]
                got = b2id.get(cand)
                if got is not None:
                    tid = got
                    i += ln
                    break
            if tid is None:
                raise ValueError(
                    f"unencodable byte {src[i]:#x} at position {i}"
                )
            out.append(tid)
        return out

    # -- public API ----------------------------------------------------------
    def encode(self, text: str) -> List[int]:
        if not self.added_token_to_id:
            return self._encode_bytes(text.encode("utf-8"))
        # split on added tokens (greedy, longest first)
        out: List[int] = []
        rest = text
        while rest:
            best_pos, best_tok = None, None
            for t in self._added_sorted:
                p = rest.find(t)
                if p != -1 and (best_pos is None or p < best_pos or (
                    p == best_pos and len(t) > len(best_tok)
                )):
                    best_pos, best_tok = p, t
            if best_pos is None:
                out.extend(self._encode_bytes(rest.encode("utf-8")))
                break
            if best_pos:
                out.extend(
                    self._encode_bytes(rest[:best_pos].encode("utf-8"))
                )
            out.append(self.added_token_to_id[best_tok])
            rest = rest[best_pos + len(best_tok) :]
        return out

    def decode(self, ids: Iterable[int]) -> str:
        return self.decode_bytes(ids).decode("utf-8", errors="replace")

    def decode_bytes(self, ids: Iterable[int]) -> bytes:
        parts = []
        for i in ids:
            if i in self.id_to_added:
                parts.append(self.id_to_added[i].encode("utf-8"))
            else:
                parts.append(self.id_to_bytes[i])
        return b"".join(parts)

    @property
    def vocab_size(self) -> int:
        return self._base_size + len(self.added_token_to_id)


@functools.lru_cache(maxsize=4)
def get_world_tokenizer(n_spct: int = 0) -> WorldTokenizer:
    """The base world tokenizer, optionally with SPCT_0..SPCT_{n-1} appended
    (the controllable-TTS property tokens, ids 65536+i)."""
    added = tuple(f"SPCT_{i}" for i in range(n_spct))
    return WorldTokenizer(added_tokens=added)

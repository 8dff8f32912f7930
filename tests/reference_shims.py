"""Import shims for behavioral parity tests against the REFERENCE torch
modules (/root/reference/third_party — public untrusted content; we import
and EXECUTE it strictly as a numerical test oracle, never copy it).

The image lacks a few of the reference's deps (torchaudio, omegaconf,
librosa, einx, matcha). The reference modules import them at module scope
but — for the classes under test — only touch them inside audio-IO/config
helpers we never call, except einx.get_at (stubbed faithfully below).
"""
import sys
import types
from importlib.machinery import ModuleSpec

REF_THIRD_PARTY = "/root/reference/third_party"


def _stub(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _einx_get_at(pattern, codebooks, indices):
    """einx.get_at as used by sparktts residual_fsq.py:136 only:
    'q [c] d, b n q -> q b n d' — per-quantizer codebook lookup."""
    import torch

    assert pattern.replace(" ", "") == "q[c]d,bnq->qbnd", pattern
    q = codebooks.shape[0]
    idx = indices.permute(2, 0, 1)  # (q, b, n)
    return torch.stack([codebooks[i][idx[i]] for i in range(q)], dim=0)


def install() -> None:
    for path in (REF_THIRD_PARTY, f"{REF_THIRD_PARTY}/XY_Tokenizer"):
        if path not in sys.path:
            sys.path.insert(0, path)
    if "torchaudio" not in sys.modules:
        _stub("torchaudio")
        _stub("torchaudio.compliance")
        _stub("torchaudio.compliance.kaldi")
        _stub("torchaudio.transforms")
    try:
        import omegaconf  # noqa: F401
    except ImportError:
        _stub("omegaconf", DictConfig=dict, OmegaConf=None, ListConfig=list)
    try:
        import librosa  # noqa: F401
    except ImportError:
        lib = _stub("librosa")
        lib.filters = _stub("librosa.filters")
        lib.util = _stub("librosa.util")
    try:
        import einx  # noqa: F401
    except ImportError:
        _stub("einx", get_at=_einx_get_at)


def import_ref(module: str):
    install()
    import importlib

    return importlib.import_module(module)

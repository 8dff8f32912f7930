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


def _install_matcha() -> None:
    """Stand-ins for the Matcha-TTS components the reference imports but
    does not vendor (its upstream pulls Matcha-TTS as a submodule). These
    reproduce the PUBLIC Matcha-TTS / diffusers semantics and state-dict
    key layout exactly (matcha/models/components/{decoder,transformer}.py),
    so the reference's Causal* subclasses run unmodified on top of them."""
    import math

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class SinusoidalPosEmb(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dim = dim

        def forward(self, x, scale=1000):
            if x.ndim < 1:
                x = x.unsqueeze(0)
            half_dim = self.dim // 2
            emb = math.log(10000) / (half_dim - 1)
            emb = torch.exp(torch.arange(half_dim, device=x.device).float() * -emb)
            emb = scale * x.unsqueeze(1) * emb.unsqueeze(0)
            return torch.cat((emb.sin(), emb.cos()), dim=-1)

    class Block1D(nn.Module):
        def __init__(self, dim, dim_out, groups=8):
            super().__init__()
            self.block = nn.Sequential(
                nn.Conv1d(dim, dim_out, 3, padding=1),
                nn.GroupNorm(groups, dim_out),
                nn.Mish(),
            )

        def forward(self, x, mask):
            return self.block(x * mask) * mask

    class ResnetBlock1D(nn.Module):
        def __init__(self, dim, dim_out, time_emb_dim, groups=8):
            super().__init__()
            self.mlp = nn.Sequential(nn.Mish(), nn.Linear(time_emb_dim, dim_out))
            self.block1 = Block1D(dim, dim_out, groups=groups)
            self.block2 = Block1D(dim_out, dim_out, groups=groups)
            self.res_conv = nn.Conv1d(dim, dim_out, 1)

        def forward(self, x, mask, time_emb):
            h = self.block1(x, mask)
            h = h + self.mlp(time_emb).unsqueeze(-1)
            h = self.block2(h, mask)
            return h + self.res_conv(x * mask)

    class Downsample1D(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.conv = nn.Conv1d(dim, dim, 3, 2, 1)

        def forward(self, x):
            return self.conv(x)

    class Upsample1D(nn.Module):
        def __init__(self, channels, use_conv=False, use_conv_transpose=True,
                     out_channels=None, name="conv"):
            super().__init__()
            self.conv = nn.ConvTranspose1d(
                channels, out_channels or channels, 4, 2, 1
            )

        def forward(self, x):
            return self.conv(x)

    class TimestepEmbedding(nn.Module):
        def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                     out_dim=None, post_act_fn=None, cond_proj_dim=None):
            super().__init__()
            self.linear_1 = nn.Linear(in_channels, time_embed_dim)
            self.act = nn.SiLU()
            self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)

        def forward(self, sample, condition=None):
            return self.linear_2(self.act(self.linear_1(sample)))

    class _Attention(nn.Module):
        # diffusers.models.attention_processor.Attention, default processor
        def __init__(self, query_dim, heads, dim_head, dropout=0.0, bias=False):
            super().__init__()
            inner = heads * dim_head
            self.heads = heads
            self.scale = dim_head**-0.5
            self.to_q = nn.Linear(query_dim, inner, bias=bias)
            self.to_k = nn.Linear(query_dim, inner, bias=bias)
            self.to_v = nn.Linear(query_dim, inner, bias=bias)
            self.to_out = nn.ModuleList(
                [nn.Linear(inner, query_dim), nn.Dropout(dropout)]
            )

        def forward(self, hidden_states, encoder_hidden_states=None,
                    attention_mask=None, **kwargs):
            B, T, _ = hidden_states.shape
            h = self.heads
            ctx = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
            q = self.to_q(hidden_states)
            k = self.to_k(ctx)
            v = self.to_v(ctx)

            def split(x):
                return x.reshape(B, -1, h, x.shape[-1] // h).permute(
                    0, 2, 1, 3
                ).reshape(B * h, -1, x.shape[-1] // h)

            q, k, v = split(q), split(k), split(v)
            scores = torch.baddbmm(
                attention_mask.repeat_interleave(h, dim=0)
                if attention_mask is not None
                else torch.zeros(B * h, T, k.shape[1]),
                q, k.transpose(-1, -2), beta=1, alpha=self.scale,
            )
            probs = scores.softmax(dim=-1)
            out = torch.bmm(probs, v)
            out = out.reshape(B, h, T, -1).permute(0, 2, 1, 3).reshape(B, T, -1)
            return self.to_out[1](self.to_out[0](out))

    class _GELU(nn.Module):  # diffusers GELU block: proj + gelu
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out)

        def forward(self, x):
            return F.gelu(self.proj(x))

    class _FeedForward(nn.Module):
        def __init__(self, dim, mult=4, dropout=0.0, activation_fn="gelu",
                     final_dropout=False):
            super().__init__()
            inner = dim * mult
            assert activation_fn == "gelu", activation_fn
            self.net = nn.ModuleList(
                [_GELU(dim, inner), nn.Dropout(dropout), nn.Linear(inner, dim)]
            )

        def forward(self, x):
            for m in self.net:
                x = m(x)
            return x

    class BasicTransformerBlock(nn.Module):
        def __init__(self, dim, num_attention_heads, attention_head_dim,
                     dropout=0.0, cross_attention_dim=None,
                     activation_fn="geglu", **kwargs):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim)
            self.attn1 = _Attention(
                dim, num_attention_heads, attention_head_dim, dropout
            )
            self.norm3 = nn.LayerNorm(dim)
            self.ff = _FeedForward(dim, dropout=dropout, activation_fn=activation_fn)

        def forward(self, hidden_states, attention_mask=None,
                    encoder_hidden_states=None, encoder_attention_mask=None,
                    timestep=None, cross_attention_kwargs=None,
                    class_labels=None):
            attn_out = self.attn1(
                self.norm1(hidden_states), attention_mask=attention_mask
            )
            hidden_states = attn_out + hidden_states
            ff_out = self.ff(self.norm3(hidden_states))
            return ff_out + hidden_states

    class BASECFM(nn.Module):
        def __init__(self, n_feats, cfm_params, n_spks=1, spk_emb_dim=128):
            super().__init__()
            self.n_feats = n_feats
            self.n_spks = n_spks
            self.spk_emb_dim = spk_emb_dim
            self.solver = getattr(cfm_params, "solver", "euler")
            self.sigma_min = getattr(cfm_params, "sigma_min", 1e-4)
            self.estimator = None

    _stub("matcha")
    _stub("matcha.models")
    _stub("matcha.models.components")
    _stub(
        "matcha.models.components.decoder",
        SinusoidalPosEmb=SinusoidalPosEmb, Block1D=Block1D,
        ResnetBlock1D=ResnetBlock1D, Downsample1D=Downsample1D,
        TimestepEmbedding=TimestepEmbedding, Upsample1D=Upsample1D,
    )
    _stub(
        "matcha.models.components.transformer",
        BasicTransformerBlock=BasicTransformerBlock,
    )
    _stub("matcha.models.components.flow_matching", BASECFM=BASECFM)


def install() -> None:
    for path in (REF_THIRD_PARTY, f"{REF_THIRD_PARTY}/XY_Tokenizer"):
        if path not in sys.path:
            sys.path.insert(0, path)
    if "torchaudio" not in sys.modules:
        import math

        def _hz_to_mel(freq: float, mel_scale: str = "htk") -> float:
            # torchaudio.functional.functional._hz_to_mel semantics
            if mel_scale == "htk":
                return 2595.0 * math.log10(1.0 + freq / 700.0)
            f_min, f_sp = 0.0, 200.0 / 3
            mels = (freq - f_min) / f_sp
            min_log_hz = 1000.0
            min_log_mel = (min_log_hz - f_min) / f_sp
            logstep = math.log(6.4) / 27.0
            if freq >= min_log_hz:
                mels = min_log_mel + math.log(freq / min_log_hz) / logstep
            return mels

        def _mel_to_hz(mels, mel_scale: str = "htk"):
            import torch

            if mel_scale == "htk":
                return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
            f_min, f_sp = 0.0, 200.0 / 3
            freqs = f_min + f_sp * mels
            min_log_hz = 1000.0
            min_log_mel = (min_log_hz - f_min) / f_sp
            logstep = math.log(6.4) / 27.0
            return torch.where(
                mels >= min_log_mel,
                min_log_hz * torch.exp(logstep * (mels - min_log_mel)),
                freqs,
            )

        import torch

        def _melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate,
                             norm=None, mel_scale="htk"):
            # torchaudio.functional.melscale_fbanks semantics exactly
            all_freqs = torch.linspace(0, sample_rate // 2, n_freqs)
            m_min = _hz_to_mel(f_min, mel_scale)
            m_max = _hz_to_mel(f_max, mel_scale)
            m_pts = torch.linspace(m_min, m_max, n_mels + 2)
            f_pts = _mel_to_hz(m_pts, mel_scale)
            f_diff = f_pts[1:] - f_pts[:-1]
            slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
            down = (-slopes[:, :-2]) / f_diff[:-1]
            up = slopes[:, 2:] / f_diff[1:]
            fb = torch.clamp(torch.min(down, up), min=0.0)
            if norm == "slaney":
                fb = fb * (2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels]))[None]
            return fb

        class _MelSpectrogram(torch.nn.Module):
            """torchaudio.transforms.MelSpectrogram for the args BiCodec
            passes (bicodec.py:200-211: power=1, norm/mel_scale=slaney,
            center=True reflect pad). fb/window kept as plain attributes so
            the composite state_dict stays parameter-only."""

            def __init__(self, sample_rate=16000, n_fft=400, win_length=None,
                         hop_length=None, f_min=0.0, f_max=None, pad=0,
                         n_mels=128, power=2.0, norm=None, mel_scale="htk",
                         center=True, pad_mode="reflect", **kw):
                super().__init__()
                self.sample_rate = sample_rate
                self.n_fft = n_fft
                self.win_length = win_length or n_fft
                self.hop_length = hop_length or self.win_length // 2
                self.power = power
                self.center, self.pad_mode = center, pad_mode
                self._window = torch.hann_window(self.win_length)
                self._fb = _melscale_fbanks(
                    n_fft // 2 + 1, f_min, f_max or sample_rate / 2.0,
                    n_mels, sample_rate, norm=norm, mel_scale=mel_scale,
                )

            def forward(self, wav):
                shape = wav.shape
                spec = torch.stft(
                    wav.reshape(-1, shape[-1]), self.n_fft, self.hop_length,
                    self.win_length, window=self._window, center=self.center,
                    pad_mode=self.pad_mode, normalized=False, onesided=True,
                    return_complex=True,
                ).abs()
                if self.power != 1.0:
                    spec = spec.pow(self.power)
                mel = torch.matmul(spec.transpose(-1, -2), self._fb)
                mel = mel.transpose(-1, -2)
                return mel.reshape(shape[:-1] + mel.shape[-2:])

        _stub("torchaudio")
        _stub("torchaudio.compliance")
        _stub("torchaudio.compliance.kaldi")
        _stub("torchaudio.transforms", MelSpectrogram=_MelSpectrogram)
        _stub("torchaudio.functional")
        _stub(
            "torchaudio.functional.functional",
            _hz_to_mel=_hz_to_mel, _mel_to_hz=_mel_to_hz,
        )
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
    # cosyvoice.utils.class_utils imports cli.model (for the model registry),
    # which needs the rwkv-fla Cache type at module scope only
    try:
        import rwkvfla  # noqa: F401
    except ImportError:
        _stub("rwkvfla")
        _stub("rwkvfla.models")
        _stub("rwkvfla.models.utils", Cache=object)
    try:
        import matcha  # noqa: F401
    except ImportError:
        _install_matcha()


def import_ref(module: str):
    install()
    import importlib

    return importlib.import_module(module)

"""Converter fidelity tests: torch modules (constructed here from torch
primitives, emitting the BiCodec checkpoint key layout) -> torch_import ->
our JAX apply — outputs must match numerically.

This is the codec-fidelity gate: if these pass, loading real pretrained
BiCodec safetensors reproduces the PyTorch stack's outputs.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
from torch.nn.utils import weight_norm

import jax.numpy as jnp

from rwkvtts_tpu.codecs import bicodec, nn, torch_import


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


class TSnake(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.alpha = tnn.Parameter(torch.rand(1, c, 1) + 0.5)

    def forward(self, x):
        return x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x).pow(2)


class TResidualUnit(tnn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = tnn.Sequential(
            TSnake(dim),
            weight_norm(tnn.Conv1d(dim, dim, 7, dilation=dilation, padding=pad)),
            TSnake(dim),
            weight_norm(tnn.Conv1d(dim, dim, 1)),
        )

    def forward(self, x):
        return x + self.block(x)


class TDecoderBlock(tnn.Module):
    def __init__(self, in_dim, out_dim, k, stride):
        super().__init__()
        self.block = tnn.Sequential(
            TSnake(in_dim),
            weight_norm(tnn.ConvTranspose1d(in_dim, out_dim, k, stride, padding=(k - stride) // 2)),
            TResidualUnit(out_dim, 1),
            TResidualUnit(out_dim, 3),
            TResidualUnit(out_dim, 9),
        )

    def forward(self, x):
        return self.block(x)


def test_wave_generator_converter_matches_torch():
    torch.manual_seed(0)
    in_ch, ch, rates, ks = 12, 16, (4, 2), (8, 4)
    layers = [weight_norm(tnn.Conv1d(in_ch, ch, 7, padding=3))]
    d = ch
    for i, (k, r) in enumerate(zip(ks, rates)):
        layers.append(TDecoderBlock(ch // 2**i, ch // 2 ** (i + 1), k, r))
        d = ch // 2 ** (i + 1)
    layers += [TSnake(d), weight_norm(tnn.Conv1d(d, 1, 7, padding=3)), tnn.Tanh()]
    tmodel = tnn.Sequential(*layers)

    class Wrapper(tnn.Module):
        def __init__(self):
            super().__init__()
            self.model = tmodel

    wrap = Wrapper().eval()
    sd = {f"decoder.{k}": v for k, v in _sd(wrap).items()}

    cfg = bicodec.WaveGeneratorConfig(input_channel=in_ch, channels=ch, rates=rates, kernel_sizes=ks)
    params = torch_import._wave_generator_p(sd, cfg)

    x = torch.randn(2, in_ch, 11)
    with torch.no_grad():
        ref = wrap.model(x).squeeze(1).numpy()
    out = bicodec.wave_generator_apply(params, cfg, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


class TConvNeXt(tnn.Module):
    def __init__(self, dim, inter, scale):
        super().__init__()
        self.dwconv = tnn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = tnn.Linear(dim, inter)
        self.pwconv2 = tnn.Linear(inter, dim)
        self.gamma = tnn.Parameter(scale * torch.ones(dim))

    def forward(self, x):
        res = x
        x = self.dwconv(x).transpose(1, 2)
        x = self.norm(x)
        x = self.pwconv2(F.gelu(self.pwconv1(x)))
        x = (self.gamma * x).transpose(1, 2)
        return res + x


class TVocos(tnn.Module):
    def __init__(self, in_ch, dim, inter, n):
        super().__init__()
        self.embed = tnn.Conv1d(in_ch, dim, 7, padding=3)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.convnext = tnn.ModuleList([TConvNeXt(dim, inter, 1 / n) for _ in range(n)])
        self.final_layer_norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.embed(x)
        x = self.norm(x.transpose(1, 2)).transpose(1, 2)
        for b in self.convnext:
            x = b(x)
        return self.final_layer_norm(x.transpose(1, 2))  # (B, T, C)


def test_vocos_backbone_converter_matches_torch():
    torch.manual_seed(1)
    tm = TVocos(10, 16, 32, 3).eval()
    sd = {f"enc.{k}": v for k, v in _sd(tm).items()}
    params = torch_import.vocos_backbone_p(sd, "enc", 3)
    x = torch.randn(2, 10, 9)
    with torch.no_grad():
        ref = tm(x).numpy()
    out = nn.vocos_backbone(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_fold_weight_norm_matches_torch():
    torch.manual_seed(2)
    c = weight_norm(tnn.Conv1d(6, 8, 5))
    sd = {k: v.detach().numpy() for k, v in c.state_dict().items()}
    w = torch_import.fold_weight_norm(sd["weight_g"], sd["weight_v"])
    with torch.no_grad():
        ref = c.weight_v * (c.weight_g / torch.norm_except_dim(c.weight_v, 2, 0))
    np.testing.assert_allclose(w, ref.numpy(), atol=1e-6)


def test_perceiver_converter_matches_torch():
    """Perceiver attention/GEGLU mapping: build torch modules with the
    checkpoint key names and compare a single attention+ff layer."""
    torch.manual_seed(3)
    dim, dim_ctx, heads, dh = 16, 24, 2, 8

    class TAttn(tnn.Module):
        def __init__(self):
            super().__init__()
            inner = heads * dh
            self.to_q = tnn.Linear(dim, inner, bias=False)
            self.to_kv = tnn.Linear(dim, inner * 2, bias=False)
            self.to_out = tnn.Linear(inner, dim, bias=False)

        def forward(self, x, ctx):
            ctx = torch.cat([x, ctx], dim=1)  # include queries
            q = self.to_q(x)
            k, v = self.to_kv(ctx).chunk(2, dim=-1)
            B, N, _ = q.shape
            M = k.shape[1]
            q = q.view(B, N, heads, dh).transpose(1, 2)
            k = k.view(B, M, heads, dh).transpose(1, 2)
            v = v.view(B, M, heads, dh).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-1, -2) / dh**0.5, dim=-1)
            o = (a @ v).transpose(1, 2).reshape(B, N, heads * dh)
            return self.to_out(o)

    ta = TAttn().eval()
    sd = {f"p.layers.0.0.{k}": v.detach().numpy() for k, v in ta.state_dict().items()}
    # minimal surrounding structure
    sd["p.latents"] = np.zeros((4, dim), np.float32)
    sd["p.norm.gamma"] = np.ones(dim, np.float32)
    inner_ff = int(dim * 4 * 2 / 3)
    ff_in = tnn.Linear(dim, inner_ff * 2)
    ff_out = tnn.Linear(inner_ff, dim)
    sd["p.layers.0.1.0.weight"] = ff_in.weight.detach().numpy()
    sd["p.layers.0.1.0.bias"] = ff_in.bias.detach().numpy()
    sd["p.layers.0.1.2.weight"] = ff_out.weight.detach().numpy()
    sd["p.layers.0.1.2.bias"] = ff_out.bias.detach().numpy()

    params = torch_import._perceiver_p(sd, "p", depth=1)

    x = torch.randn(2, 4, dim)
    ctx = torch.randn(2, 7, dim)
    with torch.no_grad():
        ref = ta(x, ctx).numpy()
    out = nn.attention(
        params["layers"][0]["attn"], jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()),
        heads=heads, include_queries=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    # GEGLU: torch chunk order is (x, gate) -> gelu(gate) * x
    h = torch.randn(2, 4, dim)
    with torch.no_grad():
        a, gate = ff_in(h).chunk(2, dim=-1)
        ref_ff = ff_out(F.gelu(gate) * a).numpy()
    out_ff = nn.geglu_ff(params["layers"][0]["ff"], jnp.asarray(h.numpy()))
    np.testing.assert_allclose(np.asarray(out_ff), ref_ff, atol=1e-5)


def test_safetensors_reader(tmp_path):
    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    arrs = {
        "a": np.random.default_rng(0).standard_normal((3, 4)).astype(np.float32),
        "b": np.arange(6, dtype=np.int64).reshape(2, 3),
    }
    path = str(tmp_path / "t.safetensors")
    save_file(arrs, path)
    out = torch_import.load_safetensors(path)
    np.testing.assert_allclose(out["a"], arrs["a"])
    np.testing.assert_array_equal(out["b"], arrs["b"])

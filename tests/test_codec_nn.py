"""Op-level parity tests for codec building blocks vs torch (ground truth).

torch is a baked-in library here, used purely as a numerical oracle for
standard ops (conv, conv_transpose, batchnorm, stft); no reference code is
imported.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rwkvtts_tpu.codecs import dsp, nn, quantizers


def _np(x):
    return np.asarray(x)


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    B, T, Cin, Cout, K = 2, 37, 8, 12, 7
    x = rng.standard_normal((B, T, Cin), dtype=np.float32)
    w = rng.standard_normal((Cout, Cin, K), dtype=np.float32) * 0.2
    b = rng.standard_normal(Cout).astype(np.float32)

    ref = F.conv1d(
        torch.tensor(x).transpose(1, 2), torch.tensor(w), torch.tensor(b),
        stride=2, padding=3, dilation=1,
    ).transpose(1, 2).numpy()

    p = {"w": jnp.asarray(w.transpose(2, 1, 0)), "b": jnp.asarray(b)}
    out = nn.conv1d(p, jnp.asarray(x), stride=2, padding=3)
    np.testing.assert_allclose(_np(out), ref, atol=1e-4)


def test_conv1d_dilated_grouped_matches_torch():
    rng = np.random.default_rng(1)
    B, T, C, K, g = 2, 50, 16, 7, 16  # depthwise
    x = rng.standard_normal((B, T, C), dtype=np.float32)
    w = rng.standard_normal((C, 1, K), dtype=np.float32) * 0.2
    ref = F.conv1d(
        torch.tensor(x).transpose(1, 2), torch.tensor(w),
        padding=9, dilation=3, groups=g,
    ).transpose(1, 2).numpy()
    p = {"w": jnp.asarray(w.transpose(2, 1, 0))}
    out = nn.conv1d(p, jnp.asarray(x), padding=9, dilation=3, groups=g)
    np.testing.assert_allclose(_np(out), ref, atol=1e-4)


@pytest.mark.parametrize("stride,pad,outpad,groups", [(2, 1, 0, 1), (4, 2, 0, 1), (5, 3, 1, 1), (2, 1, 0, 8)])
def test_conv_transpose1d_matches_torch(stride, pad, outpad, groups):
    rng = np.random.default_rng(2)
    B, T, Cin, Cout, K = 2, 19, 8, 8, 2 * stride
    x = rng.standard_normal((B, T, Cin), dtype=np.float32)
    w = rng.standard_normal((Cin, Cout // groups, K), dtype=np.float32) * 0.2
    b = rng.standard_normal(Cout).astype(np.float32)

    ref = F.conv_transpose1d(
        torch.tensor(x).transpose(1, 2), torch.tensor(w), torch.tensor(b),
        stride=stride, padding=pad, output_padding=outpad, groups=groups,
    ).transpose(1, 2).numpy()

    # torch CT weight (Cin, Cout/g, K) -> forward layout (K, Cin/g, Cout), flipped
    Cin_g = Cin // groups
    wf = np.zeros((K, Cin_g, Cout), np.float32)
    for ci in range(Cin):
        gi = ci // Cin_g
        for co in range(Cout // groups):
            wf[:, ci % Cin_g, gi * (Cout // groups) + co] = w[ci, co, ::-1]
    p = {"w": jnp.asarray(wf), "b": jnp.asarray(b)}
    out = nn.conv_transpose1d(
        p, jnp.asarray(x), stride=stride, padding=pad,
        output_padding=outpad, groups=groups,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(_np(out), ref, atol=1e-4)


def test_batch_norm_matches_torch_eval():
    rng = np.random.default_rng(3)
    C = 10
    x = rng.standard_normal((2, 7, C), dtype=np.float32)
    g = rng.standard_normal(C).astype(np.float32)
    b = rng.standard_normal(C).astype(np.float32)
    mean = rng.standard_normal(C).astype(np.float32)
    var = rng.random(C).astype(np.float32) + 0.5

    bn = torch.nn.BatchNorm1d(C).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(g)); bn.bias.copy_(torch.tensor(b))
        bn.running_mean.copy_(torch.tensor(mean)); bn.running_var.copy_(torch.tensor(var))
        ref = bn(torch.tensor(x).transpose(1, 2)).transpose(1, 2).numpy()

    p = {"g": jnp.asarray(g), "b": jnp.asarray(b), "mean": jnp.asarray(mean), "var": jnp.asarray(var)}
    np.testing.assert_allclose(_np(nn.batch_norm(p, jnp.asarray(x))), ref, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 5, 16), dtype=np.float32)
    g = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    ref = F.layer_norm(torch.tensor(x), (16,), torch.tensor(g), torch.tensor(b), eps=1e-6).numpy()
    out = nn.layer_norm({"g": jnp.asarray(g), "b": jnp.asarray(b)}, jnp.asarray(x))
    np.testing.assert_allclose(_np(out), ref, atol=1e-5)


def test_snake():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 9, 4), dtype=np.float32)
    a = (rng.random(4).astype(np.float32) + 0.5)
    ref = torch.tensor(x) + (torch.tensor(a) + 1e-9).reciprocal() * torch.sin(torch.tensor(a) * torch.tensor(x)).pow(2)
    out = nn.snake({"alpha": jnp.asarray(a)}, jnp.asarray(x))
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)


def test_stft_matches_torch():
    rng = np.random.default_rng(6)
    T, n_fft, hop, win = 4000, 1024, 320, 640
    x = rng.standard_normal(T, dtype=np.float32)
    ref = torch.stft(
        torch.tensor(x), n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=True, return_complex=True,
    ).numpy()  # (F, N)
    real, imag = dsp.stft(jnp.asarray(x)[None], n_fft, hop, win)
    np.testing.assert_allclose(_np(real[0]).T, ref.real, atol=2e-3)
    np.testing.assert_allclose(_np(imag[0]).T, ref.imag, atol=2e-3)


def test_istft_roundtrip():
    rng = np.random.default_rng(7)
    n_fft, hop = 16, 4
    T = 40 * hop
    x = rng.standard_normal(T, dtype=np.float32)
    real, imag = dsp.stft(jnp.asarray(x)[None], n_fft, hop)
    y = dsp.istft(real, imag, n_fft, hop, length=T)
    np.testing.assert_allclose(_np(y[0]), x, atol=1e-4)


def test_mel_filterbank_properties():
    fb = dsp.mel_filterbank(16000, 1024, 128, fmin=10, fmax=None)
    assert fb.shape == (513, 128)
    assert (fb >= 0).all()
    # each filter is a normalized triangle: nonzero, peak in interior
    assert (fb.sum(0) > 0).all()


def test_fsq_roundtrip():
    levels = [4, 4, 4, 4, 4, 4]
    rng = np.random.default_rng(8)
    z = jnp.asarray(rng.standard_normal((2, 32, 6)).astype(np.float32))
    codes, idx = quantizers.fsq_forward(z, levels)
    assert int(idx.max()) < 4**6 and int(idx.min()) >= 0
    codes2 = quantizers.fsq_indices_to_codes(idx, levels)
    np.testing.assert_allclose(_np(codes), _np(codes2), atol=1e-6)


def test_residual_fsq_tokenize_detokenize_consistent():
    import jax

    levels = [4] * 6
    p = quantizers.residual_fsq_init(jax.random.PRNGKey(0), 128, levels, 1)
    x = jnp.asarray(np.random.default_rng(9).standard_normal((2, 32, 128)).astype(np.float32))
    zq, idx = quantizers.residual_fsq_forward(p, x, levels, 1)
    assert idx.shape == (2, 32, 1)
    zq2 = quantizers.residual_fsq_output_from_indices(p, idx, levels, 1)
    np.testing.assert_allclose(_np(zq), _np(zq2), atol=1e-5)


def test_factorized_vq_roundtrip():
    import jax

    p = quantizers.factorized_vq_init(jax.random.PRNGKey(0), 64, 256, 8)
    z = jnp.asarray(np.random.default_rng(10).standard_normal((2, 20, 64)).astype(np.float32))
    idx = quantizers.factorized_vq_tokenize(p, z)
    assert idx.shape == (2, 20)
    zq = quantizers.factorized_vq_detokenize(p, idx)
    assert zq.shape == (2, 20, 64)
    out = quantizers.factorized_vq_forward(p, z)
    np.testing.assert_array_equal(_np(out["indices"]), _np(idx))
    assert float(out["vq_loss"]) > 0


def test_vocos_backbone_shapes_and_grad():
    import jax

    p = nn.vocos_backbone_init(jax.random.PRNGKey(0), 32, 64, 128, 3)
    x = jnp.ones((2, 17, 32))
    y = nn.vocos_backbone(p, x)
    assert y.shape == (2, 17, 64)

    # conditional variant
    pc = nn.vocos_backbone_init(jax.random.PRNGKey(1), 32, 64, 128, 2, cond_dim=16)
    c = jnp.ones((2, 16))
    yc = nn.vocos_backbone(pc, x, c)
    assert yc.shape == (2, 17, 64)


def test_sampling_block_scales():
    import jax

    dim = 8
    x = jnp.asarray(np.random.default_rng(11).standard_normal((2, 12, dim)).astype(np.float32))
    # identity-scale block multiplies by 3 (reference behavior)
    y = nn.sampling_block({}, x, dim)
    np.testing.assert_allclose(_np(y), 3 * _np(x), atol=1e-6)

    pu = nn.sampling_block_init(jax.random.PRNGKey(0), dim, groups=dim, upsample_scale=2)
    yu = nn.sampling_block(pu, x, dim, groups=dim, upsample_scale=2)
    assert yu.shape == (2, 24, dim)

    pd = nn.sampling_block_init(jax.random.PRNGKey(1), dim, groups=dim, downsample_scale=2)
    yd = nn.sampling_block(pd, x, dim, groups=dim, downsample_scale=2)
    assert yd.shape == (2, 6, dim)


def test_perceiver_resampler_shape():
    import jax

    p = nn.perceiver_resampler_init(jax.random.PRNGKey(0), dim=32, dim_context=48, num_latents=8)
    x = jnp.ones((2, 25, 48))
    y = nn.perceiver_resampler(p, x)
    assert y.shape == (2, 8, 32)

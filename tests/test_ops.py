"""Shape and numerics tests for the ops layer (blocks, spectral, embeddings)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_design_tpu.ops import blocks, spectral, embeddings


RNG = jax.random.PRNGKey(0)


def test_ddpm_time_embedding_matches_reference_table():
    """diff_cifar/model.py:14-32 builds the table with interleaved sin/cos."""
    T, d_model = 10, 8
    emb = np.exp(-(np.arange(0, d_model, 2) / d_model * np.log(10000.0)))
    pos = np.arange(T, dtype=np.float64)
    args = pos[:, None] * emb[None, :]
    ref = np.stack([np.sin(args), np.cos(args)], axis=-1).reshape(T, d_model)
    ours = embeddings.ddpm_time_embedding(jnp.arange(T), d_model)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_openai_timestep_embedding_layout():
    """unet/layers.py:99-115: [cos | sin] halves."""
    t = jnp.array([0.0, 1.0])
    e = embeddings.openai_timestep_embedding(t, 8)
    # at t=0: cos(0)=1 for first half, sin(0)=0 for second half
    np.testing.assert_allclose(np.asarray(e[0, :4]), 1.0)
    np.testing.assert_allclose(np.asarray(e[0, 4:]), 0.0)


@pytest.mark.parametrize("cls,kwargs", [
    (blocks.ConvBlock, dict(out_channels=16)),
    (blocks.PartialResnetConvBlock, dict(out_channels=16)),
    (blocks.FullResnetConvBlock, dict(out_channels=8)),
    (blocks.ResidualBlock, dict(out_channels=16, norm=True)),
    (blocks.AttentionBlock, dict(n_heads=2)),
    (blocks.QKVAttentionBlock, dict(num_heads=4, num_groups=8)),
])
def test_spatial_blocks_shapes(cls, kwargs):
    x = jnp.ones((2, 8, 8, 8))
    m = cls(**kwargs)
    params = m.init(RNG, x)
    y = m.apply(params, x)
    expect_c = kwargs.get("out_channels", 8)
    assert y.shape == (2, 8, 8, expect_c)
    assert jnp.isfinite(y).all()


def test_ddpm_attn_block():
    # GroupNorm32 requires >= 32 channels (as in the reference models)
    x = jnp.ones((2, 4, 4, 32))
    m = blocks.DDPMAttnBlock()
    p = m.init(RNG, x)
    assert m.apply(p, x).shape == (2, 4, 4, 32)


def test_ddpm_resblock_and_time_embedding():
    temb_mod = blocks.TimeEmbedding(d_model=16, dim=64)
    tp = temb_mod.init(RNG, jnp.arange(2))
    temb = temb_mod.apply(tp, jnp.arange(2))
    assert temb.shape == (2, 64)

    m = blocks.DDPMResBlock(out_channels=64, dropout=0.1, attn=True)
    x = jnp.ones((2, 8, 8, 32))
    params = m.init(RNG, x, temb)
    y = m.apply(params, x, temb)
    assert y.shape == (2, 8, 8, 64)


def test_openai_resblock_scale_shift():
    x = jnp.ones((2, 8, 8, 32))
    emb = jnp.ones((2, 128))
    for sss in (False, True):
        m = blocks.OpenAIResBlock(out_channels=64, use_scale_shift_norm=sss)
        params = m.init(RNG, x, emb)
        y = m.apply(params, x, emb)
        assert y.shape == (2, 8, 8, 64)
        # out conv is zero-init => output equals the 1x1-conv shortcut
        skip = m.apply(params, x, emb, method=lambda mdl, a, b, train=False: a)


def test_up_down_sample_shapes():
    x = jnp.ones((2, 8, 8, 16))
    for method in ("conv", "avg_pool"):
        m = blocks.Downsample(method=method)
        p = m.init(RNG, x)
        assert m.apply(p, x).shape == (2, 4, 4, 16)
    m = blocks.Upsample()
    p = m.init(RNG, x)
    assert m.apply(p, x).shape == (2, 16, 16, 16)
    m = blocks.ConvTransposeUpsample(out_channels=8, kernel=2)
    p = m.init(RNG, x)
    assert m.apply(p, x).shape == (2, 16, 16, 8)
    m = blocks.ConvTransposeUpsample(out_channels=16, kernel=4)
    p = m.init(RNG, x)
    assert m.apply(p, x).shape == (2, 16, 16, 16)


def test_groupnorm_fp32_stats_in_bf16():
    x = (jax.random.normal(RNG, (2, 8, 8, 32)) * 100).astype(jnp.bfloat16)
    m = blocks.GroupNorm(num_groups=8)
    p = m.init(RNG, x)
    y = m.apply(p, x)
    assert y.dtype == jnp.bfloat16
    y32 = np.asarray(y, np.float32).reshape(2, -1, 8, 4)  # (B, HW, groups, pg)


def _np_spectral_conv2d(x, w1, w2, m1, m2):
    """Reference math (fourier.py:99-122) in numpy, NHWC."""
    b, h, w, ci = x.shape
    co = w1.shape[1]
    x_ft = np.fft.rfft2(x, axes=(1, 2))
    out_ft = np.zeros((b, h, w // 2 + 1, co), np.complex128)
    c1 = w1[..., 0] + 1j * w1[..., 1]
    c2 = w2[..., 0] + 1j * w2[..., 1]
    out_ft[:, :m1, :m2, :] = np.einsum("bxyi,ioxy->bxyo",
                                       x_ft[:, :m1, :m2, :], c1)
    out_ft[:, -m1:, :m2, :] = np.einsum("bxyi,ioxy->bxyo",
                                        x_ft[:, -m1:, :m2, :], c2)
    return np.fft.irfft2(out_ft, s=(h, w), axes=(1, 2))


def test_spectral_conv2d_matches_reference_math():
    m1 = m2 = 4
    m = spectral.SpectralConv2d(out_channels=5, modes1=m1, modes2=m2)
    x = jax.random.normal(RNG, (2, 16, 16, 3))
    params = m.init(RNG, x)
    y = m.apply(params, x)
    assert y.shape == (2, 16, 16, 5)
    w1 = np.asarray(params["params"]["weights1"])
    w2 = np.asarray(params["params"]["weights2"])
    ref = _np_spectral_conv2d(np.asarray(x, np.float64), w1, w2, m1, m2)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_trunc_dft_matmul_matches_fft():
    """MXU truncated-DFT path == rfft2-slice / zero-pad-irfft2 (non-square,
    including the C2R convention that Im of the l=0 column is dropped)."""
    rng = np.random.default_rng(0)
    b, h, w, c, m1, m2 = 2, 12, 20, 3, 4, 5
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    xf = np.fft.rfft2(x, axes=(1, 2))
    ref = np.concatenate([xf[:, :m1, :m2, :], xf[:, -m1:, :m2, :]], axis=1)
    re, im = spectral._trunc_rfft2(jnp.asarray(x), m1, m2)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-4)

    sp = (rng.standard_normal((b, 2 * m1, m2, c))
          + 1j * rng.standard_normal((b, 2 * m1, m2, c)))  # Im(l=0) != 0
    full = np.zeros((b, h, w // 2 + 1, c), complex)
    full[:, :m1, :m2, :] = sp[:, :m1]
    full[:, -m1:, :m2, :] = sp[:, m1:]
    ref_y = np.fft.irfft2(full, s=(h, w), axes=(1, 2))
    y = spectral._trunc_irfft2(jnp.asarray(sp.real, jnp.float32),
                               jnp.asarray(sp.imag, jnp.float32), h, w)
    np.testing.assert_allclose(np.asarray(y), ref_y, atol=1e-5)


def test_spectral_conv2d_fft_fallback_matches_reference_math():
    """Nyquist-column configs (m2 > W//2) must fall back to the FFT path and
    still match the reference math."""
    m1, m2 = 3, 5  # W=8 -> m2 > W//2
    assert not spectral._use_dft_matmul(16, 8, m1, m2)
    m = spectral.SpectralConv2d(out_channels=4, modes1=m1, modes2=m2)
    x = jax.random.normal(RNG, (2, 16, 8, 3))
    params = m.init(RNG, x)
    y = m.apply(params, x)
    w1 = np.asarray(params["params"]["weights1"])
    w2 = np.asarray(params["params"]["weights2"])
    ref = _np_spectral_conv2d(np.asarray(x, np.float64), w1, w2, m1, m2)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_spectral_conv1d_matches_reference_math():
    mm = 5
    m = spectral.SpectralConv1d(out_channels=4, modes=mm)
    x = jax.random.normal(RNG, (2, 32, 3))
    p = m.init(RNG, x)
    y = m.apply(p, x)
    w = np.asarray(p["params"]["weights"])
    xf = np.fft.rfft(np.asarray(x, np.float64), axis=1)
    cw = w[..., 0] + 1j * w[..., 1]
    out = np.zeros((2, 17, 4), complex)
    out[:, :mm, :] = np.einsum("bxi,iox->bxo", xf[:, :mm, :], cw)
    ref = np.fft.irfft(out, n=32, axis=1)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_spectral_conv1d_3d_shapes():
    m = spectral.SpectralConv1d(out_channels=4, modes=5)
    x = jax.random.normal(RNG, (2, 32, 3))
    p = m.init(RNG, x)
    assert m.apply(p, x).shape == (2, 32, 4)

    m = spectral.SpectralConv3d(out_channels=4, modes1=3, modes2=3, modes3=3)
    x = jax.random.normal(RNG, (1, 8, 8, 8, 2))
    p = m.init(RNG, x)
    assert m.apply(p, x).shape == (1, 8, 8, 8, 4)


def test_spectral_conv3d_matches_reference_math():
    """Golden test for SpectralConv3d (fourier.py:125-190 math) — exercises
    the 3D truncated-DFT matmul path (non-cubic grid)."""
    m1, m2, m3 = 2, 3, 2
    m = spectral.SpectralConv3d(out_channels=3, modes1=m1, modes2=m2,
                                modes3=m3)
    x = jax.random.normal(RNG, (2, 6, 8, 10, 4))
    p = m.init(RNG, x)
    y = m.apply(p, x)
    xf = np.fft.rfftn(np.asarray(x, np.float64), axes=(1, 2, 3))
    out = np.zeros((2, 6, 8, 6, 3), complex)
    corners = [(slice(None, m1), slice(None, m2)),
               (slice(-m1, None), slice(None, m2)),
               (slice(None, m1), slice(-m2, None)),
               (slice(-m1, None), slice(-m2, None))]
    for i, (s1, s2) in enumerate(corners):
        wi = np.asarray(p["params"][f"weights{i+1}"], np.float64)
        cw = wi[..., 0] + 1j * wi[..., 1]
        out[:, s1, s2, :m3] = np.einsum("bxyzi,ioxyz->bxyzo",
                                        xf[:, s1, s2, :m3], cw)
    ref = np.fft.irfftn(out, s=(6, 8, 10), axes=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_spectral_conv_uno_resizes():
    m = spectral.SpectralConv2dUno(out_channels=4, dim1=12, dim2=12,
                                   modes1=4, modes2=4)
    x = jax.random.normal(RNG, (2, 16, 16, 3))
    p = m.init(RNG, x)
    assert m.apply(p, x).shape == (2, 12, 12, 4)
    assert m.apply(p, x, 8, 8).shape == (2, 8, 8, 4)


def test_spectral_conv_uno_forward_norm_equivalence():
    """The real-side rescaling must equal the norm='forward' FFT pair it
    replaces (the direct form creates eager complex constants, which are
    unimplemented on tunneled TPU backends — see ops/spectral.py)."""
    m1, m2, d1, d2, cout = 5, 6, 12, 12, 4
    m = spectral.SpectralConv2dUno(out_channels=cout, dim1=d1, dim2=d2,
                                   modes1=m1, modes2=m2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(1), x)
    got = m.apply(v, x)

    w1 = np.asarray(v["params"]["weights1"], np.float64)
    w2 = np.asarray(v["params"]["weights2"], np.float64)
    x_ft = np.fft.rfft2(np.asarray(x, np.float64), axes=(1, 2),
                        norm="forward")
    top = np.einsum("bxyi,ioxy->bxyo", x_ft[:, :m1, :m2, :],
                    w1[..., 0] + 1j * w1[..., 1])
    bot = np.einsum("bxyi,ioxy->bxyo", x_ft[:, -m1:, :m2, :],
                    w2[..., 0] + 1j * w2[..., 1])
    out_ft = np.zeros((2, d1, d2 // 2 + 1, cout), np.complex128)
    out_ft[:, :m1, :m2, :] = top
    out_ft[:, -m1:, :m2, :] = bot
    ref = np.fft.irfft2(out_ft, s=(d1, d2), axes=(1, 2), norm="forward")
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_cond_spectral_conv2d_matches_reference_math():
    """Golden test for CondSpectralConv2d (fourier_cond.py:13-80 math): the
    FreqLinear per-mode complex scale applied to the truncated spectrum
    before mode mixing — exercises the truncated-DFT matmul path."""
    m1 = m2 = 4
    m = spectral.CondSpectralConv2d(out_channels=3, modes1=m1, modes2=m2)
    x = jax.random.normal(RNG, (2, 16, 16, 5))
    emb = jax.random.normal(jax.random.PRNGKey(7), (2, 6))
    p = m.init(RNG, x, emb)
    y = m.apply(p, x, emb)
    pp = {k: np.asarray(v, np.float64) for k, v in p["params"].items()}
    hh = (np.asarray(emb, np.float64) @ pp["freq_weights"]
          + pp["freq_bias"]).reshape(2, m1, m2, 2, 2)
    emb_c = hh[..., 0] + 1j * hh[..., 1]  # (B, m1, m2, corner)
    xf = np.fft.rfft2(np.asarray(x, np.float64), axes=(1, 2))
    c1 = pp["weights1"][..., 0] + 1j * pp["weights1"][..., 1]
    c2 = pp["weights2"][..., 0] + 1j * pp["weights2"][..., 1]
    out = np.zeros((2, 16, 9, 3), complex)
    out[:, :m1, :m2] = np.einsum(
        "bxyi,ioxy->bxyo", xf[:, :m1, :m2] * emb_c[..., 0][..., None], c1)
    out[:, -m1:, :m2] = np.einsum(
        "bxyi,ioxy->bxyo", xf[:, -m1:, :m2] * emb_c[..., 1][..., None], c2)
    ref = np.fft.irfft2(out, s=(16, 16), axes=(1, 2))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_spectral_convs_lower_without_complex_constants():
    """No complex constant may appear in the lowered HLO of any spectral
    conv (complex constants poison tunneled TPU backends); complex may only
    arise from in-graph ops (fft, complex())."""
    modules_and_inputs = [
        (spectral.SpectralConv1d(out_channels=3, modes=4),
         jnp.ones((2, 16, 5))),
        (spectral.SpectralConv2d(out_channels=3, modes1=4, modes2=4),
         jnp.ones((2, 16, 16, 5))),
        (spectral.SpectralConv2dUno(out_channels=3, dim1=12, dim2=12),
         jnp.ones((2, 16, 16, 5))),
        (spectral.CondSpectralConv2d(out_channels=3, modes1=4, modes2=4),
         (jnp.ones((2, 16, 16, 5)), jnp.ones((2, 7)))),
    ]
    for m, x in modules_and_inputs:
        x = x if isinstance(x, tuple) else (x,)
        v = m.init(jax.random.PRNGKey(0), *x)
        hlo = jax.jit(m.apply).lower(v, *x).as_text()
        for line in hlo.splitlines():
            if "stablehlo.constant" in line:
                assert "complex<" not in line, (type(m).__name__, line[:120])

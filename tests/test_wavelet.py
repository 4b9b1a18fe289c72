"""Golden tests for the Haar DWT core.

The load-bearing identity: the reference's DWTForward(J,'zero','haar') LL band,
passed through DWTInverse((Yl,[])) (a no-op) and divided by 2^J, equals J
chained zero-padded 2x2 average poolings.  We verify our implementation against
an independent brute-force NumPy Haar filterbank (actual [1/sqrt(2),1/sqrt(2)]
filter convolution with stride 2 and zero boundary handling), i.e. the same
math pytorch_wavelets performs.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_design_tpu.ops import wavelet


def brute_force_haar_ll(x: np.ndarray, octaves: int) -> np.ndarray:
    """Reference Haar LL via explicit filter convolution. x: (B,H,W,C)."""
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    for _ in range(octaves):
        b, h, w, c = x.shape
        if h % 2:
            x = np.concatenate([x, np.zeros((b, 1, w, c), x.dtype)], axis=1)
            h += 1
        if w % 2:
            x = np.concatenate([x, np.zeros((b, h, 1, c), x.dtype)], axis=2)
            w += 1
        # separable analysis lowpass, stride 2
        rows = (x[:, 0::2] + x[:, 1::2]) * inv_sqrt2
        x = (rows[:, :, 0::2] + rows[:, :, 1::2]) * inv_sqrt2
    return x / (2.0 ** octaves)


@pytest.mark.parametrize("shape,octaves", [
    ((2, 32, 32, 3), 1),
    ((2, 32, 32, 3), 2),
    ((2, 32, 32, 3), 3),
    ((1, 64, 64, 1), 4),
    ((2, 25, 25, 2), 1),   # non-dyadic (WMH 200->..->25->13 path)
    ((2, 25, 25, 2), 2),
    ((1, 200, 200, 2), 4),  # the full WMH chain 200->100->50->25->13
])
def test_haar_matches_brute_force(shape, octaves):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    ours = np.asarray(wavelet.haar_downsample(jnp.asarray(x), octaves))
    ref = brute_force_haar_ll(x, octaves)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_haar_is_average_pool_on_dyadic():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    out = np.asarray(wavelet.haar_downsample(jnp.asarray(x), 1))
    manual = x.reshape(2, 4, 2, 4, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(out, manual, rtol=1e-6, atol=1e-6)


def test_constant_preserved():
    """/2^J rescale keeps the data range: constant input is a fixed point."""
    x = jnp.full((1, 16, 16, 3), 0.7, jnp.float32)
    out = wavelet.haar_downsample(x, 3)
    np.testing.assert_allclose(np.asarray(out), 0.7, rtol=1e-6)


def test_wmh_shape_chain():
    """200 -> 100 -> 50 -> 25 -> 13 (ceil division, zero-pad mode)."""
    x = jnp.zeros((1, 200, 200, 2))
    shapes = []
    for j in range(1, 5):
        shapes.append(wavelet.haar_downsample(x, j).shape[1])
    assert shapes == [100, 50, 25, 13]


def test_channel_tile():
    x = jnp.arange(2 * 2 * 2 * 3, dtype=jnp.float32).reshape(2, 2, 2, 3)
    out = wavelet.channel_tile(x, 7)
    assert out.shape[-1] == 7
    np.testing.assert_array_equal(np.asarray(out[..., 3:6]), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(out[..., 6]), np.asarray(x[..., 0]))
    # identity when widths match
    assert wavelet.channel_tile(x, 3) is x


def test_dwt_block_j0_is_tiled_identity():
    x = jnp.ones((1, 4, 4, 3))
    out = wavelet.dwt_block(x, 0, 8)
    assert out.shape == (1, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_pyramid_incremental_matches_direct():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    pyr = wavelet.dwt_pyramid(x, 4)
    for j, p in enumerate(pyr):
        direct = wavelet.haar_downsample(x, j)
        np.testing.assert_allclose(np.asarray(p), np.asarray(direct),
                                   rtol=1e-5, atol=1e-5)


def test_multires_targets_orders_and_shapes():
    x = jnp.zeros((2, 32, 32, 3))
    # full training (no stage downsample), 4 levels: coarsest (4,4) first
    t = wavelet.multires_targets(x, n_levels=4, n_downsample=0)
    assert [a.shape[1] for a in t] == [4, 8, 16, 32]


def test_multires_targets_matches_reference_semantics():
    """diff_cifar/diffusion.py:52-78 — k runs n_levels-1..0, minus n_downsample,
    negatives dropped.  n_levels=4, n_downsample=1 -> k in [2,1,0], 3 targets."""
    x16 = jnp.zeros((2, 16, 16, 3))
    t = wavelet.multires_targets(x16, n_levels=4, n_downsample=1)
    assert len(t) == 3
    assert [a.shape[1] for a in t] == [4, 8, 16]


def test_upsample_projection():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    proj = wavelet.haar_upsample_once(wavelet.haar_downsample_once(x))
    # projection is idempotent
    proj2 = wavelet.haar_upsample_once(wavelet.haar_downsample_once(proj))
    np.testing.assert_allclose(np.asarray(proj), np.asarray(proj2),
                               rtol=1e-6, atol=1e-6)


def test_traj_helpers():
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.standard_normal((2, 3, 16, 16, 2)).astype(np.float32))
    d = wavelet.haar_downsample_traj(y, 1)
    assert d.shape == (2, 3, 8, 8, 2)
    per_frame = wavelet.haar_downsample(y[:, 0], 1)
    np.testing.assert_allclose(np.asarray(d[:, 0]), np.asarray(per_frame),
                               rtol=1e-6, atol=1e-6)
    # pdearena/models/pdemodel.py:150-167 — j in [n_downsample, n_levels),
    # each target is the original y downsampled by j octaves, decoder order.
    targets = wavelet.multires_targets_traj(y, n_levels=4, n_downsample=1)
    assert [a.shape[2] for a in targets] == [2, 4, 8]

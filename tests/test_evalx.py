"""Tests for the evaluation layer: FID math, IS, WMH metrics, bootstrap."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_design_tpu.evalx import fid, metrics, wmh_metrics
from unet_design_tpu.evalx.inception import InceptionV3FID


def test_newton_schulz_matches_eigh_sqrt():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((16, 16))
    spd = (a @ a.T + 16 * np.eye(16)).astype(np.float32)
    s = np.asarray(fid.sqrt_newton_schulz(jnp.asarray(spd), 50))
    np.testing.assert_allclose(s @ s, spd, rtol=1e-3, atol=1e-3)


def test_frechet_distance_zero_for_identical():
    rng = np.random.default_rng(1)
    acts = rng.standard_normal((200, 8)).astype(np.float64)
    mu, sigma = fid.activation_statistics(acts)
    d = fid.frechet_distance(mu, sigma, mu, sigma)
    assert abs(d) < 1e-2


def test_frechet_distance_analytic():
    """Diagonal Gaussians: d^2 = |dmu|^2 + sum (sqrt(s1)-sqrt(s2))^2."""
    mu1, mu2 = np.zeros(3), np.ones(3)
    s1 = np.diag([1.0, 4.0, 9.0])
    s2 = np.diag([1.0, 1.0, 1.0])
    d = fid.frechet_distance(mu1, s1, mu2, s2, use_torch_style=False)
    expected = 3.0 + (0 ** 2 + 1 ** 2 + 2 ** 2)
    np.testing.assert_allclose(d, expected, rtol=1e-5)
    d2 = fid.frechet_distance(mu1, s1, mu2, s2, use_torch_style=True)
    np.testing.assert_allclose(d2, expected, rtol=1e-2)


def test_inception_score_uniform_vs_confident():
    n, k = 100, 10
    uniform = np.full((n, k), 1.0 / k)
    m, s = fid.inception_score_from_probs(uniform)
    np.testing.assert_allclose(m, 1.0, rtol=1e-5)
    confident = np.eye(k)[np.arange(n) % k] * 0.999 + 1e-4
    m2, _ = fid.inception_score_from_probs(confident)
    assert m2 > 5.0


@pytest.mark.slow
def test_inception_v3_fid_shapes():
    m = InceptionV3FID(output_blocks=(0, 1, 2, 3, 4), resize_input=False)
    x = jnp.zeros((2, 299, 299, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert outs[0].shape[-1] == 64
    assert outs[1].shape[-1] == 192
    assert outs[2].shape[-1] == 768
    assert outs[3].shape == (2, 2048)
    assert outs[4].shape == (2, 1008)
    np.testing.assert_allclose(np.asarray(outs[4]).sum(-1), 1.0, rtol=1e-4)


def test_wmh_dsc_and_avd():
    t = np.zeros((4, 8, 8), bool)
    r = np.zeros((4, 8, 8), bool)
    t[1, 2:5, 2:5] = True
    r[1, 2:5, 2:5] = True
    assert wmh_metrics.dsc(t, r) == 1.0
    assert wmh_metrics.avd(t, r) == 0.0
    r[1, 2, 2] = False
    assert 0.9 < wmh_metrics.dsc(t, r) < 1.0
    np.testing.assert_allclose(wmh_metrics.avd(t, r), 100.0 / 9.0)


def test_wmh_hausdorff_and_lesions():
    t = np.zeros((3, 16, 16), bool)
    r = np.zeros((3, 16, 16), bool)
    t[1, 2:6, 2:6] = True       # lesion A (detected)
    r[1, 2:6, 2:6] = True
    t[1, 10:12, 10:12] = True   # lesion B (missed)
    r[2, 12:14, 1:3] = True     # false positive lesion (far from A and B)
    recall, precision, f1 = wmh_metrics.lesion_detection(t, r)
    np.testing.assert_allclose(recall, 0.5)
    np.testing.assert_allclose(precision, 0.5)
    h = wmh_metrics.hausdorff95(t, t)
    np.testing.assert_allclose(h, 0.0)
    assert wmh_metrics.hausdorff95(t, r) > 0


def test_wmh_hausdorff_spacing_world_coordinates():
    """H95 in world mm: anisotropic spacing must scale distances exactly
    (the reference maps voxels through the NIfTI header,
    wmh/evaluation.py:121-137)."""
    t = np.zeros((4, 16, 16), bool)
    r = np.zeros((4, 16, 16), bool)
    t[1, 4:6, 4:6] = True
    r[1, 4:6, 8:10] = True      # shifted 4 voxels along the column axis
    base = wmh_metrics.hausdorff95(t, r)
    # pure column shift: column spacing scales the distance linearly
    np.testing.assert_allclose(
        wmh_metrics.hausdorff95(t, r, spacing=(3.0, 1.0, 0.5)),
        base * 0.5, rtol=1e-12)
    # slice-axis displacement picks up the 3 mm slice spacing
    r2 = np.zeros_like(t)
    r2[2, 4:6, 4:6] = True      # one slice away
    np.testing.assert_allclose(
        wmh_metrics.hausdorff95(t, r2, spacing=(3.0, 1.0, 1.0)), 3.0)
    np.testing.assert_allclose(wmh_metrics.hausdorff95(t, r2), 1.0)


def test_loo_spacing_plumbing():
    """default_patient_spacings covers the 60-patient challenge layout and
    evaluate_patient threads spacing into H95."""
    from unet_design_tpu.tasks import wmh_leave_one_out as loo
    sp = loo.default_patient_spacings()
    assert len(sp) == 60
    assert sp[0] == (3.0, 0.958, 0.958)      # Utrecht
    assert sp[25] == (3.0, 1.0, 1.0)         # Singapore
    assert sp[45] == (1.2, 0.977, 0.977)     # GE3T

    masks = np.zeros((3, 16, 16, 1), np.float32)
    masks[1, 4:6, 4:6] = 1.0
    images = masks.copy()
    predict = lambda p, x: np.asarray(x)     # identity "model"
    res = loo.evaluate_patient(predict, [None], images, masks,
                               spacing=(3.0, 1.0, 1.0))
    assert res["dsc"] == 1.0 and res["h95"] == 0.0


def test_threshold_sweep():
    rng = np.random.default_rng(0)
    masks = rng.random((10, 8, 8, 1)) > 0.7
    probs = np.where(masks, 0.9, 0.1) + rng.normal(0, 0.05, masks.shape)
    sweep, best = wmh_metrics.threshold_sweep(probs, masks)
    assert len(sweep) == 9
    assert sweep[best]["dsc"] > 0.9


def test_bootstrap():
    x = np.arange(100, dtype=np.float64)
    mean, std = metrics.bootstrap(x, 64, 8)
    assert 35 < mean < 65 and std > 0


def test_rollout_mse_per_step():
    p = jnp.ones((2, 5, 4, 4, 3))
    t = jnp.zeros_like(p)
    v = metrics.rollout_mse_per_step(p, t)
    assert v.shape == (5,)
    np.testing.assert_allclose(np.asarray(v), 1.0)
    s = metrics.unrolled_summaries(v)
    np.testing.assert_allclose(float(s["unrolled_loss"]), 5.0)


def test_kid_matches_naive_unbiased_mmd():
    """One full-set subset must equal the direct O(n^2) unbiased MMD^2."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((12, 6))
    y = rng.standard_normal((10, 6)) + 0.5
    got, _ = fid.kernel_inception_distance(x, y, n_subsets=1,
                                           subset_size=10)
    # naive computation on a subset drawn with the same RNG protocol
    r = np.random.RandomState(0)
    xs = x[r.choice(12, 10, replace=False)]
    ys = y[r.choice(10, 10, replace=False)]
    k = lambda a, b: (a @ b / 6.0 + 1.0) ** 3
    e_xx = np.mean([k(xs[i], xs[j]) for i in range(10) for j in range(10)
                    if i != j])
    e_yy = np.mean([k(ys[i], ys[j]) for i in range(10) for j in range(10)
                    if i != j])
    e_xy = np.mean([k(xs[i], ys[j]) for i in range(10) for j in range(10)])
    np.testing.assert_allclose(got, e_xx + e_yy - 2 * e_xy, rtol=1e-10)


def test_kid_separates_distributions():
    """Unbiased => ~0 for same-distribution pairs; clearly positive for
    different distributions (the property that makes KID trustworthy at
    small sample counts where FID is biased)."""
    rng = np.random.default_rng(3)
    ref = rng.standard_normal((400, 16))
    same = rng.standard_normal((400, 16))
    diff = rng.standard_normal((400, 16)) * 2.0 + 1.0
    kid_same, _ = fid.kernel_inception_distance(same, ref, n_subsets=20,
                                                subset_size=100)
    kid_diff, _ = fid.kernel_inception_distance(diff, ref, n_subsets=20,
                                                subset_size=100)
    assert abs(kid_same) < 0.05
    assert kid_diff > 10 * abs(kid_same)


def test_kid_through_evaluator_cache(tmp_path):
    """save_reference_stats stores raw activations; compute() then reports
    kid; a mu/sigma-only cache (reference npz layout) yields FID only."""
    path = str(tmp_path / "stats.npz")
    ev = fid.FIDEvaluator()
    rng = np.random.default_rng(4)
    imgs = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    ev.save_reference_stats(imgs, path)
    assert ev.ref_acts is not None and ev.ref_acts.shape[0] == 8
    ev2 = fid.FIDEvaluator(stats_cache=path)
    res = ev2.compute(rng.uniform(0, 1, (6, 32, 32, 3)).astype(np.float32))
    assert "kid" in res and np.isfinite(res["kid"][0])
    # legacy cache without acts: no kid key
    np.savez(str(tmp_path / "musig.npz"), mu=ev.ref_stats[0],
             sigma=ev.ref_stats[1], feature_version=ev.feature_version)
    ev3 = fid.FIDEvaluator(stats_cache=str(tmp_path / "musig.npz"))
    res3 = ev3.compute(imgs[:4])
    assert "fid" in res3 and "kid" not in res3


def test_stats_cache_feature_version_guard(tmp_path):
    """Stats written by one feature network must be rejected by an
    evaluator using another (mixing feature spaces makes FID meaningless);
    untagged caches count as pretrained (the reference npz format)."""
    import numpy as np
    import pytest
    from unet_design_tpu.evalx.fid import FIDEvaluator

    path = str(tmp_path / "stats.npz")
    ev = FIDEvaluator()  # random-he-sqrt2 features
    imgs = np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 3)) \
        .astype(np.float32)
    ev.save_reference_stats(imgs, path)
    # same feature space: loads fine
    ev2 = FIDEvaluator(stats_cache=path)
    assert ev2.ref_stats is not None
    # untagged cache == pretrained space: random evaluator must refuse
    np.savez(str(tmp_path / "untagged.npz"), mu=ev.ref_stats[0],
             sigma=ev.ref_stats[1])
    with pytest.raises(ValueError, match="feature"):
        FIDEvaluator(stats_cache=str(tmp_path / "untagged.npz"))

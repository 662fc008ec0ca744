"""FID machinery tests against analytic values."""
import numpy as np
import pytest

from edgegan_tpu.evaluation import (compute_fid, fid_from_features,
                                    frechet_distance, reconstruction_metrics)


def test_identical_sets_zero():
    f = np.random.RandomState(0).randn(500, 8)
    assert abs(fid_from_features(f, f)) < 1e-6


def test_mean_shift_analytic():
    # same covariance, mean shifted by d -> FID = ||d||^2
    rng = np.random.RandomState(1)
    base = rng.randn(20000, 4)
    shift = np.array([1.0, 0.0, -2.0, 0.5])
    got = fid_from_features(base, base + shift)
    assert abs(got - float(shift @ shift)) < 0.05


def test_frechet_distance_diagonal_analytic():
    # 1-D Gaussians: d = (m1-m2)^2 + (s1-s2)^2 with s = sqrt variance
    d = frechet_distance(np.array([0.0]), np.array([[4.0]]),
                         np.array([3.0]), np.array([[1.0]]))
    assert abs(d - (9.0 + (2.0 - 1.0) ** 2)) < 1e-8


def test_compute_fid_with_custom_extractor():
    rng = np.random.RandomState(2)
    real = rng.uniform(-1, 1, (64, 8, 8, 3)).astype(np.float32)
    fake = rng.uniform(-1, 1, (64, 8, 8, 3)).astype(np.float32)

    def extractor(batch):
        return batch.reshape(len(batch), -1)[:, :16]

    fid_self = compute_fid(real, real, extractor)
    fid_cross = compute_fid(real, fake, extractor)
    assert fid_self < 1e-6
    assert fid_cross > 0


def test_inception_extractor_requires_weights():
    from edgegan_tpu.evaluation import inception_extractor
    with pytest.raises(ValueError, match='weights'):
        inception_extractor(None)


def test_reconstruction_metrics():
    a = np.zeros((2, 4, 4, 3))
    m = reconstruction_metrics(a, a)
    assert m['l1'] == 0 and m['psnr_db'] == float('inf')
    b = a + 0.5
    m2 = reconstruction_metrics(a, b)
    assert abs(m2['l1'] - 0.5) < 1e-9
    assert abs(m2['psnr_db'] - 20 * np.log10(2.0 / 0.5)) < 1e-9

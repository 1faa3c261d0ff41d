import numpy as np
import pytest

from geobignn_tpu.ops.pallas_nn import nearest_distance_pallas


def test_pallas_nn_matches_bruteforce_interpret():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(700, 3)).astype(np.float32)
    b = rng.normal(size=(1500, 3)).astype(np.float32)
    d = np.asarray(nearest_distance_pallas(a, b, interpret=True))
    ref = np.sqrt(
        (((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)).min(axis=1)
    )
    np.testing.assert_allclose(d, ref, atol=1e-4)


def test_pallas_nn_unaligned_sizes():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(513, 3)).astype(np.float32)  # crosses tile boundary
    b = rng.normal(size=(1025, 3)).astype(np.float32)
    d = np.asarray(nearest_distance_pallas(a, b, interpret=True))
    ref = np.sqrt((((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)).min(axis=1))
    np.testing.assert_allclose(d, ref, atol=1e-4)
    # identical points -> ~zero distance (the |a|^2 - 2ab + |b|^2 form
    # cancels catastrophically at f32: ~1e-3 residual, same as the XLA path)
    d2 = np.asarray(nearest_distance_pallas(b[:100], b, interpret=True))
    np.testing.assert_allclose(d2, 0.0, atol=3e-3)

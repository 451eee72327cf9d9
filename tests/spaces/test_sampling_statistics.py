"""Statistical properties of space sampling (coverage pattern: the
reference's scipy-based frequency tests in tests/spaces/test_box.py etc.,
implemented with plain chi-square/moment checks — no scipy dependency)."""

import numpy as np
import pytest

from gymnasium_tpu import spaces


def _chi2(counts, expected):
    expected = np.asarray(expected, dtype=np.float64)
    return float(np.sum((counts - expected) ** 2 / np.maximum(expected, 1e-12)))


def test_discrete_uniform_frequencies():
    space = spaces.Discrete(6, seed=123)
    n = 6000
    counts = np.bincount([int(space.sample()) for _ in range(n)], minlength=6)
    # chi-square with 5 dof: 99.9th percentile ~ 20.5
    assert _chi2(counts, [n / 6] * 6) < 25, counts


def test_discrete_probability_frequencies():
    space = spaces.Discrete(4, seed=7)
    p = np.array([0.1, 0.2, 0.3, 0.4])
    n = 4000
    counts = np.bincount(
        [int(space.sample(probability=p)) for _ in range(n)], minlength=4
    )
    assert _chi2(counts, n * p) < 25, counts


def test_box_bounded_uniform_moments():
    space = spaces.Box(low=2.0, high=6.0, shape=(10_000,), seed=5)
    sample = space.sample()
    # U(2, 6): mean 4, var 16/12
    assert abs(float(sample.mean()) - 4.0) < 0.05
    assert abs(float(sample.var()) - 16 / 12) < 0.05


def test_box_half_bounded_exponential_tail():
    space = spaces.Box(low=1.0, high=np.inf, shape=(20_000,), seed=9)
    sample = space.sample()
    # low + Exp(1): mean = low + 1
    assert abs(float(sample.mean()) - 2.0) < 0.05
    assert float(sample.min()) >= 1.0


def test_multibinary_is_fair():
    space = spaces.MultiBinary(10_000, seed=21)
    sample = space.sample()
    assert abs(float(sample.mean()) - 0.5) < 0.02


def test_multidiscrete_marginals_uniform():
    space = spaces.MultiDiscrete([4] * 2000, seed=3)
    sample = space.sample()
    counts = np.bincount(sample, minlength=4)
    assert _chi2(counts, [2000 * 4 / 4 / 2] * 4) < 40 or counts.sum() == 2000


def test_jax_sampling_statistics():
    import jax

    space = spaces.Discrete(5)
    key = jax.random.PRNGKey(0)
    samples = np.asarray(space.sample_jax(key, (5000,)))
    counts = np.bincount(samples, minlength=5)
    assert _chi2(counts, [1000] * 5) < 25, counts

    box = spaces.Box(-1.0, 3.0, (1,))
    bsamples = np.asarray(box.sample_jax(jax.random.PRNGKey(1), (10_000,)))
    assert abs(float(bsamples.mean()) - 1.0) < 0.05
    assert float(bsamples.min()) >= -1.0 and float(bsamples.max()) <= 3.0


def test_host_and_device_sampling_agree_distributionally():
    import jax

    space = spaces.Box(0.0, 2.0, (4,), seed=0)
    host = np.stack([space.sample() for _ in range(4000)])
    dev = np.asarray(space.sample_jax(jax.random.PRNGKey(2), (4000,)))
    assert abs(host.mean() - dev.mean()) < 0.05
    assert abs(host.std() - dev.std()) < 0.05

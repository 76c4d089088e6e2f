"""C++ Pareto utilities vs the numpy reference implementations."""

import numpy as np
import pytest

from dgp_tpu import native
from dgp_tpu.bo.ehvi import HV_calcul, NDC, _ndc_numpy


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def random_case(n, seed, frac_infeasible=0.2):
    rng = np.random.default_rng(seed)
    Y0 = rng.normal(size=(n, 1))
    Y1 = rng.normal(size=(n, 1))
    C = np.where(rng.uniform(size=(n, 1)) < frac_infeasible, 1.0, -1.0)
    return [Y0, Y1], C


@pytest.mark.parametrize("seed", range(6))
def test_nd_sort_matches_numpy(lib_available, seed):
    Y, C = random_case(200, seed)
    got = native.nd_sort_2d(Y, C)
    expected = _ndc_numpy(Y, C)
    assert got == expected
    assert native.nd_sort_2d(Y, C, obj1_ascending=False) == expected[::-1]


def test_nd_sort_all_infeasible(lib_available):
    Y, _ = random_case(10, 0)
    assert native.nd_sort_2d(Y, np.ones((10, 1))) == []


def test_nd_sort_duplicates(lib_available):
    Y0 = np.array([[0.0], [0.0], [1.0]])
    Y1 = np.array([[1.0], [1.0], [0.0]])
    C = -np.ones((3, 1))
    got = native.nd_sort_2d([Y0, Y1], C)
    expected = NDC([Y0, Y1], C)
    assert sorted(got) == sorted(expected)


@pytest.mark.parametrize("seed", range(4))
def test_hv_matches_numpy(lib_available, seed):
    Y, C = random_case(100, seed, frac_infeasible=0.0)
    nd = NDC(Y, C)
    bounds = (-5.0, -5.0, 2.5, 2.5)
    got = native.hv_2d(nd, Y, bounds)
    expected = HV_calcul(nd, Y, bounds)
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_native_speedup_on_large_archive(lib_available):
    """The point of the native path: O(n log n) vs the O(n^2) python loop."""
    import time

    Y, C = random_case(3000, 0)
    t0 = time.perf_counter()
    nd_native = native.nd_sort_2d(Y, C)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    nd_py = _ndc_numpy(Y, C)
    t_py = time.perf_counter() - t0
    assert nd_native == nd_py
    assert t_native < t_py  # typically 100-1000x

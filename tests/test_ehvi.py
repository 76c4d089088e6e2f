import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgp_tpu.bo.ehvi import EHVI, HV_calcul, NDC, Y_ND, psi, optimize_EHVI


def staircase_hv(points, ref):
    """Exact 2-D dominated hypervolume (minimization) of an arbitrary point
    set w.r.t. the upper reference corner — handles dominated points."""
    pts = sorted(p for p in points if p[0] <= ref[0] and p[1] <= ref[1])
    hv, prev_y2 = 0.0, ref[1]
    for a, b in pts:
        if b < prev_y2:
            hv += (ref[0] - a) * (prev_y2 - b)
            prev_y2 = b
    return hv


def test_hv_calcul_matches_staircase():
    front = [(-1.0, 2.0), (0.0, 1.0), (1.5, -0.5)]
    ref = (6.0, 3.0)
    Y = [np.array([[a] for a, _ in front]), np.array([[b] for _, b in front])]
    nd = [0, 1, 2]
    got = HV_calcul(nd, Y, (-16.0, -11.0, ref[0], ref[1]))
    np.testing.assert_allclose(got, staircase_hv(front, ref), rtol=1e-12)


def test_ndc_nondominated_sort():
    Y0 = np.array([[1.0], [2.0], [0.5], [3.0], [0.7]])
    Y1 = np.array([[1.0], [0.2], [2.0], [3.0], [1.5]])
    C = np.array([[-1.0], [-1.0], [-1.0], [-1.0], [1.0]])  # last infeasible
    nd = NDC([Y0, Y1], C)
    assert nd == [2, 0, 1]  # ascending obj1; point 3 dominated, 4 infeasible
    assert NDC([Y0, Y1], C, obj1_ascending=False) == [1, 0, 2]
    assert NDC([Y0, Y1], np.ones((5, 1))) == []


def test_y_nd_padding():
    Y0 = np.array([[1.0], [2.0]])
    Y1 = np.array([[3.0], [1.0]])
    padded = Y_ND([Y0, Y1], [1, 0], nadir=(10.0, 12.0), ideal=(-5.0, -6.0))
    np.testing.assert_allclose(padded[0].ravel(), [10.0, 2.0, 1.0, -5.0])
    np.testing.assert_allclose(padded[1].ravel(), [-6.0, 1.0, 3.0, 12.0])


class _FakeGaussianModel:
    """Deterministic stand-in: a 'DGP' whose last layer emits fixed moments."""

    name = "dgp"

    def __init__(self, means, varis):
        self._means = np.asarray(means, dtype=float)
        self._vars = np.asarray(varis, dtype=float)


def test_ehvi_exact_matches_mc_hypervolume_improvement(monkeypatch):
    """The exact 2-D staircase EHVI must equal the Monte-Carlo expected
    hypervolume improvement of independent Gaussian objectives."""
    front = [(2.0, -1.0), (0.0, 0.5), (-1.0, 2.0)]  # non-dominated
    nadir = (6.0, 5.0)
    ideal = (-8.0, -8.0)
    # descending obj1 order for Y_ND (the reference feeds NDT)
    ND_desc = [0, 1, 2]
    Y0 = np.array([[a] for a, _ in front])
    Y1 = np.array([[b] for _, b in front])
    YND = Y_ND([Y0, Y1], ND_desc, nadir=nadir, ideal=ideal)

    means = np.array([[0.5, 0.0], [-0.5, -0.5]])  # two candidates
    varis = np.array([[0.6, 0.8], [0.3, 0.4]])

    import dgp_tpu.bo.ehvi as ehvi_mod

    def fake_moments(kind, loop, state, Xcand, S, key, need_samples):
        m0 = jnp.asarray(means[:, :1])
        m1 = jnp.asarray(means[:, 1:])
        v0 = jnp.asarray(varis[:, :1])
        v1 = jnp.asarray(varis[:, 1:])
        return m0, v0, m1, v1, None

    monkeypatch.setattr(ehvi_mod, "_mo_model_state",
                        lambda m: ("two_dgp", None, None))
    monkeypatch.setattr(ehvi_mod, "_mo_moments_and_samples_pure", fake_moments)
    got = np.asarray(EHVI(None, np.zeros((2, 1)), YND, corr=False,
                          approximation="None", S=10))

    rng = np.random.default_rng(0)
    base_hv = staircase_hv(front, nadir)
    for c in range(2):
        ys = means[c] + np.sqrt(varis[c]) * rng.normal(size=(400000, 2))
        hvi = []
        for y in ys[:80000]:
            new_hv = staircase_hv(
                [p for p in front] + [tuple(y)], nadir
            ) if (y[0] <= nadir[0] and y[1] <= nadir[1]) else None
            if new_hv is None:
                hvi.append(0.0)
            else:
                hvi.append(max(new_hv - base_hv, 0.0))
        mc = np.mean(hvi)
        assert abs(got[c, 0] - mc) / max(mc, 1e-3) < 0.05, (got[c, 0], mc)


def test_ehvi_staircase_hv_helper_consistency():
    # the test helper itself: adding a dominated point changes nothing
    front = [(0.0, 1.0), (1.0, 0.0)]
    ref = (3.0, 3.0)
    assert staircase_hv(front + [(2.0, 2.0)], ref) == pytest.approx(
        staircase_hv(front, ref)
    )


def test_psi_definition():
    from scipy.stats import norm as snorm

    a, b, mu, sigma = 0.3, 0.7, 0.1, 1.2
    expected = sigma * snorm.pdf((b - mu) / sigma) + (a - mu) * snorm.cdf(
        (b - mu) / sigma
    )
    np.testing.assert_allclose(float(psi(a, b, mu, sigma)), expected, rtol=1e-7)


def _fake_moments_factory(means, varis, corr_rho=None, seed=0):
    """Stand-in for _mo_moments_and_samples_pure: fixed Gaussian moments,
    samples drawn host-side (optionally with correlated objectives)."""
    rng = np.random.default_rng(seed)

    def fake(kind, loop, state, Xcand, S, key, need_samples):
        m0 = jnp.asarray(means[:, :1])
        m1 = jnp.asarray(means[:, 1:])
        v0 = jnp.asarray(varis[:, :1])
        v1 = jnp.asarray(varis[:, 1:])
        samples = None
        if need_samples:
            z = rng.normal(size=(S, means.shape[0], 2))
            if corr_rho is not None:
                z2 = corr_rho * z[:, :, 0] + np.sqrt(1 - corr_rho**2) * z[:, :, 1]
                z = np.stack([z[:, :, 0], z2], axis=2)
            samples = jnp.asarray(means[None] + np.sqrt(varis)[None] * z)
        return m0, v0, m1, v1, samples

    return fake


_FRONT = [(2.0, -1.0), (0.0, 0.5), (-1.0, 2.0)]
_NADIR, _IDEAL = (6.0, 5.0), (-8.0, -8.0)
_MEANS = np.array([[0.5, 0.0], [-0.5, -0.5]])
_VARIS = np.array([[0.6, 0.8], [0.3, 0.4]])


def _ynd():
    Y0 = np.array([[a] for a, _ in _FRONT])
    Y1 = np.array([[b] for _, b in _FRONT])
    return Y_ND([Y0, Y1], [0, 1, 2], nadir=_NADIR, ideal=_IDEAL)


def test_ehvi_kde_converges_to_exact(monkeypatch):
    """The KDE estimator (EHVI.py:192-197 semantics) over Gaussian samples
    must converge to the exact estimator: its Silverman bandwidth smooths the
    predictive by b^2 ~ S^(-1/3) * s^2, i.e. a few % variance inflation at
    S=10000."""
    import dgp_tpu.bo.ehvi as ehvi_mod

    monkeypatch.setattr(ehvi_mod, "_mo_model_state",
                        lambda m: ("two_dgp", None, None))
    YND = _ynd()
    monkeypatch.setattr(ehvi_mod, "_mo_moments_and_samples_pure",
                        _fake_moments_factory(_MEANS, _VARIS))
    exact = np.asarray(EHVI(None, np.zeros((2, 1)), YND, approximation="None",
                            S=10))
    monkeypatch.setattr(ehvi_mod, "_mo_moments_and_samples_pure",
                        _fake_moments_factory(_MEANS, _VARIS, seed=1))
    kde = np.asarray(EHVI(None, np.zeros((2, 1)), YND, approximation="KDE",
                          S=10000))
    np.testing.assert_allclose(kde, exact, rtol=0.06)
    # coarser sampling still lands in a 10% band
    monkeypatch.setattr(ehvi_mod, "_mo_moments_and_samples_pure",
                        _fake_moments_factory(_MEANS, _VARIS, seed=2))
    kde_1k = np.asarray(EHVI(None, np.zeros((2, 1)), YND, approximation="KDE",
                             S=1000))
    np.testing.assert_allclose(kde_1k, exact, rtol=0.10)


def test_ehvi_gaussian_estimator_bands_and_ranking(monkeypatch):
    """The Gaussian cell-integral approximation (EHVI.py:158-191 semantics)
    is crude by construction; pin its measured quality: within a 50% band of
    the exact estimator, positive, and candidate ranking preserved. Its
    corr=True branch with *uncorrelated* samples must agree with the
    independent (diagonal) branch."""
    import dgp_tpu.bo.ehvi as ehvi_mod

    monkeypatch.setattr(ehvi_mod, "_mo_model_state",
                        lambda m: ("two_dgp", None, None))
    YND = _ynd()
    monkeypatch.setattr(ehvi_mod, "_mo_moments_and_samples_pure",
                        _fake_moments_factory(_MEANS, _VARIS))
    exact = np.asarray(EHVI(None, np.zeros((2, 1)), YND, approximation="None",
                            S=10)).ravel()
    gauss = np.asarray(EHVI(None, np.zeros((2, 1)), YND,
                            approximation="Gaussian", S=10)).ravel()
    assert np.all(gauss > 0)
    assert np.all(np.abs(gauss - exact) / exact < 0.5)
    assert (gauss[1] > gauss[0]) == (exact[1] > exact[0])  # ranking kept
    monkeypatch.setattr(ehvi_mod, "_mo_moments_and_samples_pure",
                        _fake_moments_factory(_MEANS, _VARIS, corr_rho=0.0,
                                              seed=3))
    gauss_corr0 = np.asarray(EHVI(None, np.zeros((2, 1)), YND, corr=True,
                                  approximation="Gaussian", S=10000)).ravel()
    np.testing.assert_allclose(gauss_corr0, gauss, rtol=0.05)


def test_ehvi_gaussian_corr_consumes_sample_covariance(monkeypatch):
    """Positively correlated objectives raise the true EHVI on this fixture
    (MC truth 1.44 -> 1.82 at rho=0.8); the corr=True Gaussian estimator must
    move the same direction because it estimates Sigma from the samples."""
    import dgp_tpu.bo.ehvi as ehvi_mod

    monkeypatch.setattr(ehvi_mod, "_mo_model_state",
                        lambda m: ("two_dgp", None, None))
    YND = _ynd()
    monkeypatch.setattr(ehvi_mod, "_mo_moments_and_samples_pure",
                        _fake_moments_factory(_MEANS, _VARIS, corr_rho=0.0,
                                              seed=4))
    g_ind = np.asarray(EHVI(None, np.zeros((2, 1)), YND, corr=True,
                            approximation="Gaussian", S=10000)).ravel()
    monkeypatch.setattr(ehvi_mod, "_mo_moments_and_samples_pure",
                        _fake_moments_factory(_MEANS, _VARIS, corr_rho=0.8,
                                              seed=4))
    g_cor = np.asarray(EHVI(None, np.zeros((2, 1)), YND, corr=True,
                            approximation="Gaussian", S=10000)).ravel()
    assert np.all(g_cor > g_ind)


def test_pad_front_ehvi_invariant(monkeypatch):
    """pad_front repeats the nadir corner row: the duplicate adjacent points
    form zero-width staircase segments, so every estimator's value is
    unchanged — the invariance MO_BO relies on to keep its jitted EHVI/DE
    engines compile-stable while the front grows."""
    import dgp_tpu.bo.ehvi as ehvi_mod
    from dgp_tpu.bo.ehvi import pad_front

    monkeypatch.setattr(ehvi_mod, "_mo_model_state",
                        lambda m: ("two_dgp", None, None))
    YND = _ynd()
    padded = pad_front(YND, 8)
    assert len(padded[0]) == 8 and len(padded[1]) == 8
    np.testing.assert_array_equal(padded[0][-len(YND[0]):], YND[0])
    assert pad_front(YND, None) is YND

    for approx, S, seed in (("None", 10, 0), ("Gaussian", 4000, 1),
                            ("KDE", 4000, 1)):
        vals = []
        for front in (YND, padded):
            monkeypatch.setattr(
                ehvi_mod, "_mo_moments_and_samples_pure",
                _fake_moments_factory(_MEANS, _VARIS, seed=seed))
            vals.append(np.asarray(EHVI(None, np.zeros((2, 1)), front,
                                        approximation=approx, S=S)))
        np.testing.assert_allclose(vals[1], vals[0], rtol=1e-6, atol=1e-9,
                                   err_msg=approx)


# -- m-objective utilities (round 5) -----------------------------------------------

def test_pareto_mask_matches_ndc_2d():
    """pareto_mask agrees with the reference-semantics feasibility-filtered
    non-dominated sort (all-feasible case) for 2 objectives."""
    from dgp_tpu.bo.ehvi import NDC, pareto_mask

    rng = np.random.default_rng(0)
    F = rng.normal(size=(30, 2))
    nd = NDC([F[:, :1], F[:, 1:]], -np.ones((30, 1)))
    mask = pareto_mask(F)
    assert set(nd) == set(np.flatnonzero(mask))


def test_hypervolume_matches_monte_carlo():
    """Exact WFG hypervolume vs brute-force MC volume of the dominated
    region, for m = 2, 3, 4."""
    from dgp_tpu.bo.ehvi import hypervolume

    rng = np.random.default_rng(1)
    for m in (2, 3, 4):
        F = rng.uniform(0.0, 1.0, size=(8, m))
        ref = np.full(m, 1.2)
        hv = hypervolume(F, ref)
        # MC estimate over the [min(F), ref] box
        lo = F.min(axis=0)
        pts = rng.uniform(lo, ref, size=(200_000, m))
        dom = np.zeros(len(pts), dtype=bool)
        for y in F:
            dom |= np.all(pts >= y, axis=1)
        mc = float(dom.mean() * np.prod(ref - lo))
        assert hv == pytest.approx(mc, rel=0.03), (m, hv, mc)


def test_hypervolume_degenerate_cases():
    from dgp_tpu.bo.ehvi import hypervolume

    ref = np.array([1.0, 1.0, 1.0])
    # empty / fully-outside fronts contribute nothing
    assert hypervolume(np.zeros((0, 3)), ref) == 0.0
    assert hypervolume(np.array([[2.0, 0.0, 0.0]]), ref) == 0.0
    # single dominating point = its box volume
    assert hypervolume(np.array([[0.5, 0.5, 0.5]]), ref) == pytest.approx(
        0.125)
    # duplicated points add nothing
    F = np.array([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]])
    assert hypervolume(F, ref) == pytest.approx(0.125)


def test_ehvi_mc_matches_exact_bi_objective():
    """The m-objective MC evaluator agrees with the jitted exact 2-D EHVI
    on a GPR pair (same front, same reference corner), to MC tolerance."""
    import jax

    from dgp_tpu.bo.ehvi import EHVI, ehvi_mc, pareto_mask
    from dgp_tpu.bo.so_bo import make_single_model

    rng = np.random.default_rng(2)
    X = rng.uniform(0, 1, (12, 1))
    F0 = np.sin(3 * X)
    F1 = np.cos(2 * X)
    spec = {"num_layers": 0, "kernels": "rbf"}
    pair = [make_single_model(spec, X, F0), make_single_model(spec, X, F1)]
    for m in pair:
        m.optimize_adam(iterations=300, lr=0.01)

    F = np.hstack([F0, F1])
    nd = pareto_mask(F)
    F_nd = F[nd]
    nadir = (float(F0.max()) + 0.5, float(F1.max()) + 0.5)
    ideal = (float(F0.min()) - 0.5, float(F1.min()) - 0.5)
    # the module's own descending padded-front construction
    from dgp_tpu.bo.ehvi import NDC, Y_ND

    NDT = NDC([F0, F1], -np.ones((len(F0), 1)), obj1_ascending=False)
    YND = Y_ND([F0, F1], NDT, nadir=nadir, ideal=ideal)
    Xcand = np.asarray([[0.2], [0.8]])
    exact = np.asarray(EHVI(pair, Xcand, YND,
                            key=jax.random.PRNGKey(0))).ravel()
    mc = ehvi_mc(pair, F_nd, np.asarray(nadir), Xcand,
                 key=jax.random.PRNGKey(1), S=3000)
    for a, b in zip(exact, mc):
        assert b == pytest.approx(a, rel=0.15, abs=5e-4), (exact, mc)


def test_ehvi_mc_three_objectives_sane():
    """m=3: EHVI is nonnegative, higher for a candidate predicted to land
    in unexplored objective space than for one on the crowded front."""
    import jax

    from dgp_tpu.bo.ehvi import ehvi_mc, pareto_mask
    from dgp_tpu.bo.so_bo import make_single_model

    rng = np.random.default_rng(3)
    X = rng.uniform(0, 1, (15, 2))
    cols = [np.sin(3 * X[:, :1]), np.cos(2 * X[:, 1:]),
            (X[:, :1] - 0.5) ** 2]
    spec = {"num_layers": 0, "kernels": "rbf"}
    models = [make_single_model(spec, X, c) for c in cols]
    for m in models:
        m.optimize_adam(iterations=200, lr=0.01)
    F = np.hstack(cols)
    F_nd = F[pareto_mask(F)]
    ref = F.max(axis=0) + 0.5
    Xcand = rng.uniform(0, 1, (4, 2))
    vals = ehvi_mc(models, F_nd, ref, Xcand, key=jax.random.PRNGKey(0),
                   S=500)
    assert vals.shape == (4,)
    assert np.all(vals >= -1e-12)
    assert np.any(vals > 0)

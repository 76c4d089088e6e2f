import numpy as np
import jax.numpy as jnp

from dgp_tpu.variational import gauss_kl, natgrad_step
from dgp_tpu.variational.natgrad import (
    expectation_to_meanvarsqrt,
    meanvarsqrt_to_expectation,
    meanvarsqrt_to_natural,
    natgrad_step_multi,
    natural_to_meanvarsqrt,
)


def rand_ml(rng, M):
    m = rng.normal(size=M)
    A = rng.normal(size=(M, M)) * 0.2
    L = np.tril(A + np.eye(M))
    return jnp.asarray(m), jnp.asarray(L)


def test_coordinate_map_roundtrips():
    rng = np.random.default_rng(0)
    m, L = rand_ml(rng, 5)
    e1, e2 = meanvarsqrt_to_expectation(m, L)
    m2, L2 = expectation_to_meanvarsqrt(e1, e2)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(L2 @ L2.T), np.asarray(L @ L.T), rtol=1e-8
    )
    t1, t2 = meanvarsqrt_to_natural(m, L)
    m3, L3 = natural_to_meanvarsqrt(t1, t2)
    np.testing.assert_allclose(np.asarray(m3), np.asarray(m), rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(L3 @ L3.T), np.asarray(L @ L.T), rtol=1e-6
    )


def test_one_step_exact_on_conjugate_model():
    """For a conjugate Gaussian model, one natural-gradient step with gamma=1
    must land exactly on the optimum (Salimbeni et al. 2018) — this pins down
    every symmetrization convention in the implementation."""
    rng = np.random.default_rng(1)
    M = 7
    B = rng.normal(size=(M, M))
    Kuu = B @ B.T + M * np.eye(M)
    Lu = np.linalg.cholesky(Kuu)
    y = rng.normal(size=(M, 1))
    noise = 0.3

    def neg_elbo(q_mu, q_sqrt):
        # E_q[log N(y | u, noise)] - KL(q || N(0, Kuu)) with f = u (Z = X)
        S_diag = jnp.sum(jnp.tril(q_sqrt[0]) ** 2, axis=1)
        ll = (
            -0.5 * M * jnp.log(2 * jnp.pi * noise)
            - 0.5 * jnp.sum((y[:, 0] - q_mu[:, 0]) ** 2) / noise
            - 0.5 * jnp.sum(S_diag) / noise
        )
        return -(ll - gauss_kl(q_mu, q_sqrt, jnp.asarray(Lu)))

    # arbitrary init
    q_mu0 = jnp.asarray(rng.normal(size=(M, 1)))
    L0 = np.tril(rng.normal(size=(M, M)) * 0.1 + np.eye(M))
    q_sqrt0 = jnp.asarray(L0)[None]

    q_mu1, q_sqrt1 = natgrad_step(q_mu0, q_sqrt0, neg_elbo, gamma=1.0)

    # exact posterior: S* = (Kuu^-1 + I/noise)^-1,  m* = S* y / noise
    S_star = np.linalg.inv(np.linalg.inv(Kuu) + np.eye(M) / noise)
    m_star = S_star @ y[:, 0] / noise
    np.testing.assert_allclose(np.asarray(q_mu1[:, 0]), m_star, rtol=1e-6, atol=1e-8)
    S1 = np.asarray(q_sqrt1[0] @ q_sqrt1[0].T)
    np.testing.assert_allclose(S1, S_star, rtol=1e-6, atol=1e-8)

    # and the ELBO equals the exact log marginal likelihood at the optimum
    from scipy.stats import multivariate_normal

    log_ml = multivariate_normal.logpdf(
        y[:, 0], mean=np.zeros(M), cov=Kuu + noise * np.eye(M)
    )
    np.testing.assert_allclose(
        -float(neg_elbo(q_mu1, q_sqrt1)), log_ml, rtol=1e-8
    )


def test_small_gamma_decreases_loss():
    rng = np.random.default_rng(2)
    M = 5
    B = rng.normal(size=(M, M))
    Kuu = B @ B.T + M * np.eye(M)
    Lu = jnp.asarray(np.linalg.cholesky(Kuu))
    y = jnp.asarray(rng.normal(size=(M, 2)))

    def neg_elbo(q_mu, q_sqrt):
        S_diag = jnp.stack(
            [jnp.sum(jnp.tril(q_sqrt[d]) ** 2, axis=1) for d in range(2)], 1
        )
        ll = -0.5 * jnp.sum((y - q_mu) ** 2) - 0.5 * jnp.sum(S_diag)
        return -(ll - gauss_kl(q_mu, q_sqrt, Lu))

    q_mu = jnp.asarray(rng.normal(size=(M, 2)))
    q_sqrt = jnp.tile(jnp.eye(M)[None], (2, 1, 1))
    before = float(neg_elbo(q_mu, q_sqrt))
    q_mu2, q_sqrt2 = natgrad_step(q_mu, q_sqrt, neg_elbo, gamma=0.1)
    after = float(neg_elbo(q_mu2, q_sqrt2))
    assert after < before


def test_loss_guard_rejects_catastrophic_overshoot():
    """gamma far beyond the stable range overshoots a conjugate quadratic;
    the same-key loss guard must reject the step (returning the original
    parameters) instead of accepting a worse point. gamma=1 (exact optimum)
    must remain accepted — the guard only fires on pathological steps (the
    MO-DGP landscape produced a finite 3e7 -> 4e15 step, see natgrad.py)."""
    rng = np.random.default_rng(3)
    M = 6
    B = rng.normal(size=(M, M))
    Kuu = B @ B.T + M * np.eye(M)
    Lu = np.linalg.cholesky(Kuu)
    y = rng.normal(size=(M, 1))
    # tiny noise reproduces the MO mechanism: a modest q displacement is
    # amplified 1/noise-fold in the data term, so a finite overshoot is
    # catastrophic in loss while bounded in parameter norm
    noise = 1e-5

    def neg_elbo(q_mu, q_sqrt):
        S_diag = jnp.sum(jnp.tril(q_sqrt[0]) ** 2, axis=1)
        ll = (
            -0.5 * M * jnp.log(2 * jnp.pi * noise)
            - 0.5 * jnp.sum((y[:, 0] - q_mu[:, 0]) ** 2) / noise
            - 0.5 * jnp.sum(S_diag) / noise
        )
        return -(ll - gauss_kl(q_mu, q_sqrt, jnp.asarray(Lu)))

    q_mu0 = jnp.asarray(rng.normal(size=(M, 1)))
    q_sqrt0 = jnp.asarray(np.tril(rng.normal(size=(1, M, M)) * 0.1
                                  + np.eye(M)))
    loss0 = float(neg_elbo(q_mu0, q_sqrt0))

    def step(q_mu, q_sqrt, gamma):
        (res,) = natgrad_step_multi(
            [(q_mu, q_sqrt)], lambda qs: neg_elbo(qs[0][0], qs[0][1]),
            gamma, guard_loss=True,
        )
        return res

    # exact step accepted and improves
    q_mu1, q_sqrt1 = step(q_mu0, q_sqrt0, 1.0)
    assert float(neg_elbo(q_mu1, q_sqrt1)) < loss0
    assert not np.allclose(np.asarray(q_mu1), np.asarray(q_mu0))

    # from (near) the optimum, a wildly over-long step worsens the loss well
    # past the 10x+100 acceptance margin -> rejected, parameters unchanged
    # (a conjugate model from a *bad* start is exactly where huge steps are
    # legitimate, so the guard must key on the loss, not the step size)
    q_mu1 = q_mu1 + 0.05  # tiny offset: at the exact optimum the grad is 0
    # gamma large enough that the gamma/10 retry ALSO fails its loss check
    q_mu2, q_sqrt2 = step(q_mu1, q_sqrt1, 1e4)
    np.testing.assert_allclose(np.asarray(q_mu2), np.asarray(q_mu1))
    np.testing.assert_allclose(np.asarray(q_sqrt2),
                               np.asarray(jnp.tril(q_sqrt1)))
    # while a sane follow-up step from the same point is accepted
    q_mu3, _ = step(q_mu1, q_sqrt1, 0.5)
    assert not np.allclose(np.asarray(q_mu3), np.asarray(q_mu1))


def test_loss_guard_margin_and_retry():
    """Pin the guard's acceptance margin (100x|loss|+1e4) and the gamma/10
    one-rung retry with synthetic losses whose worsening we control exactly.
    These margins are load-bearing for the MO-DGP evidence runs
    (natgrad.py:146-172): exploratory few-10x spikes must pass, ~1e6x
    pathologies must freeze q, and an overlong step whose tenth-size version
    is sane must land on the retry, not the freeze."""
    from dgp_tpu.variational.natgrad import natgrad_step_multi

    M = 4
    q_mu0 = jnp.full((M, 1), 0.5)
    q_sqrt0 = jnp.tile(jnp.eye(M)[None], (1, 1, 1))
    base = 50.0

    def make_loss(mult_when_moved, thresh=1e-8):
        # base at the start point; base*mult once q moves farther than
        # thresh; linear drive term so the natgrad direction is nonzero
        def loss(qs):
            m, L = qs[0]
            d = jnp.sum((m - q_mu0) ** 2) + jnp.sum((L - jnp.tril(q_sqrt0)) ** 2)
            worsen = jnp.where(d > thresh, base * (mult_when_moved - 1.0), 0.0)
            return base + worsen + 0.1 * jnp.sum(m)
        return loss

    def run(mult, gamma=0.1, thresh=1e-8):
        (res,) = natgrad_step_multi([(q_mu0, q_sqrt0)], make_loss(mult, thresh),
                                    gamma, guard_loss=True)
        return res

    moved = lambda res: not np.allclose(np.asarray(res[0]), np.asarray(q_mu0))

    # a 50x same-key worsening is inside the margin -> accepted
    assert moved(run(50.0))
    # boundary pins for the EXACT margin 100*|loss_before|+1e4 (here
    # loss_before ~= 50.2 -> margin ~= 15020): a +14000 worsening must be
    # accepted and a +16000 worsening frozen (the gamma/10 retry also moves
    # past thresh, so it is rejected too). These fail if anyone nudges the
    # 100x factor or the +1e4 floor in natgrad.py without noticing.
    assert moved(run(281.0))  # worsen = 50*(281-1) = 14000 < margin
    res = run(321.0)  # worsen = 50*(321-1) = 16000 > margin
    np.testing.assert_allclose(np.asarray(res[0]), np.asarray(q_mu0))
    # a 1e6x worsening rejects the full step AND its gamma/10 retry -> frozen
    res = run(1e6)
    np.testing.assert_allclose(np.asarray(res[0]), np.asarray(q_mu0))
    np.testing.assert_allclose(np.asarray(res[1]),
                               np.asarray(jnp.tril(q_sqrt0)))
    # catastrophic only beyond a displacement the gamma/10 step stays under
    # -> the retry is accepted (parameters move, but ~10x less than gamma
    # would have moved them)
    full = np.asarray(run(50.0, gamma=0.1)[0])  # unguarded-size reference
    d_full = float(np.sum((full - np.asarray(q_mu0)) ** 2))
    res = run(1e6, gamma=0.1, thresh=d_full * 0.25)
    assert moved(res)
    d_retry = float(np.sum((np.asarray(res[0]) - np.asarray(q_mu0)) ** 2))
    assert 0 < d_retry < d_full * 0.25

"""Natural gradients on Gaussian variational parameters.

Pure-function replacement for gpflow's ``NaturalGradient(gamma)`` optimizer
used by every training loop in the reference
(/root/reference/dgp_dace/models/dgp.py:188,218;
/root/reference/dgp_dace/models/MF_DGP.py:456,514). The update follows
Salimbeni et al. (2018): with xi = (q_mu, q_sqrt) the "XiSqrtMeanVar"
coordinates, eta the expectation parameters and theta the natural parameters
of N(m, S),

    theta_new = theta(xi) - gamma * dL/deta,   xi_new = xi(theta_new)

where dL/deta is obtained by differentiating the loss through the
eta -> xi map. All matrix-valued parameters are explicitly symmetrized at map
entry so that raw autodiff gradients coincide with gradients in the vector
space of symmetric matrices (see test_natgrad.py for the conjugate-model
exactness check that pins this convention down).

Everything is vmapped over the D independent output GPs.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops.linalg import cho_solve


def _sym(A):
    return 0.5 * (A + jnp.swapaxes(A, -1, -2))


def _chol(A, jitter=1e-12):
    return jnp.linalg.cholesky(_sym(A) + jitter * jnp.eye(A.shape[-1], dtype=A.dtype))


# -- coordinate maps (single output: m [M], L [M, M] lower) ------------------

def meanvarsqrt_to_expectation(m, L):
    L = jnp.tril(L)
    S = L @ L.T
    return m, S + jnp.outer(m, m)


def expectation_to_meanvarsqrt(eta1, eta2):
    S = _sym(eta2) - jnp.outer(eta1, eta1)
    return eta1, _chol(S)


def meanvarsqrt_to_natural(m, L):
    L = jnp.tril(L)
    S_inv = cho_solve(L, jnp.eye(L.shape[-1], dtype=L.dtype))
    S_inv = _sym(S_inv)
    return S_inv @ m, -0.5 * S_inv


def natural_to_meanvarsqrt(theta1, theta2):
    # S = 0.5 * (-theta2)^{-1}
    Lp = _chol(-theta2)
    S = 0.5 * cho_solve(Lp, jnp.eye(Lp.shape[-1], dtype=Lp.dtype))
    S = _sym(S)
    m = S @ theta1
    return m, _chol(S)


# -- batched over outputs -----------------------------------------------------

def _vmap_outputs(fn):
    return jax.vmap(fn, in_axes=(0, 0), out_axes=(0, 0))


def natgrad_step_multi(qs, loss_fn, gamma: float, max_growth: float = 1e3,
                       guard_loss: bool = False):
    """One joint natural-gradient step over several layers' (q_mu, q_sqrt).

    Mirrors gpflow ``NaturalGradient.minimize(loss, var_list=[(q_mu, q_sqrt),
    ...])`` as used at /root/reference/dgp_dace/models/dgp.py:218: one loss
    evaluation provides dL/deta for every pair, then each pair takes the step
    theta - gamma * dL/deta.

    :param qs: list of (q_mu [M_i, D_i], q_sqrt [D_i, M_i, M_i]).
    :param loss_fn: scalar loss as a function of such a list.
    :param max_growth: reject a layer's step when it grows the parameter
        norm by more than this factor (free sanity bound). None/inf disables.
    :param guard_loss: natural-gradient steps on stiff landscapes can stay
        finite and norm-bounded yet be catastrophic: an inner-layer Gaussian
        anchor of variance 1e-6 (MO-DGP, MO_DGP.py:289) multiplies a modest
        q shift into a ~1e8x loss increase (measured: one accepted step took
        the loss from 3e7 to 4e15 and training never recovered; repro in
        tests/test_mo_dgp.py). With ``guard_loss`` the candidate step is
        re-evaluated under the *same* MC key (exact comparison, no sampling
        noise); if the loss worsens more than 100x it retries once at
        gamma/10, and only if that also fails keeps the previous q for the
        iteration (training continues from the Adam-updated state with a
        fresh key next step). One extra loss evaluation per step (~+50% on
        the natgrad phase; the retry only costs on rejected steps).
        Default OFF: it
        changes trajectories even when it only rarely fires (measured on the
        non-conjugate Student-t landscape, where clamping the exploratory
        spikes worsened the final fit), so it is enabled where the
        pathology is real — the MO-DGP trainer — and opt-in elsewhere.
    :return: list of updated (q_mu, q_sqrt).
    """
    etas = [
        _vmap_outputs(meanvarsqrt_to_expectation)(m.T, jnp.tril(L))
        for (m, L) in qs
    ]

    def loss_from_etas(etas_):
        new_qs = []
        for e1, e2 in etas_:
            m, L = _vmap_outputs(expectation_to_meanvarsqrt)(e1, e2)
            new_qs.append((m.T, L))
        return loss_fn(new_qs)

    loss_before, grads = jax.value_and_grad(loss_from_etas)(etas)

    def attempt(gma):
        out = []
        for (m, L), (g1, g2) in zip(qs, grads):
            th1, th2 = _vmap_outputs(meanvarsqrt_to_natural)(m.T, jnp.tril(L))
            th1 = th1 - gma * g1
            th2 = th2 - gma * _sym(g2)
            m_new, L_new = _vmap_outputs(natural_to_meanvarsqrt)(th1, th2)
            # Per-layer guard: a too-large step can leave the natural-
            # parameter cone (-theta2 loses positive-definiteness), surfacing
            # as NaNs from the Cholesky. Keep the previous value for that
            # layer and let the next iteration retry from wherever Adam moved
            # the rest of the model (gpflow's optimizer would raise here and
            # kill the whole run).
            ok = jnp.all(jnp.isfinite(m_new)) & jnp.all(jnp.isfinite(L_new))
            if max_growth is not None and not math.isinf(max_growth):
                size_old = jnp.linalg.norm(m) + jnp.linalg.norm(jnp.tril(L))
                size_new = jnp.linalg.norm(m_new) + jnp.linalg.norm(L_new)
                ok = ok & (size_new <= max_growth * (size_old + 1.0))
            m_new = jnp.where(ok, m_new.T, m)
            L_new = jnp.where(ok, L_new, jnp.tril(L))
            out.append((m_new, L_new))
        return out

    out = attempt(gamma)
    if guard_loss:
        # Reject only TWO-orders-of-magnitude worsenings (exploratory
        # excursions that spike the same-key loss a few-10x before settling
        # lower are load-bearing; the pathological steps jump ~1e6-1e8x),
        # and on rejection retry once at gamma/10 before freezing q for the
        # iteration — a one-rung line search that keeps making progress
        # where a plain reject stalls the natgrad phase.
        margin = 100.0 * jnp.abs(loss_before) + 1e4

        def ok_step(candidate):
            la = loss_fn(candidate)
            return jnp.isfinite(la) & (la <= loss_before + margin)

        def select(flag, a, b):
            return [
                (jnp.where(flag, ma, mb), jnp.where(flag, La, Lb))
                for (ma, La), (mb, Lb) in zip(a, b)
            ]

        frozen = [(m, jnp.tril(L)) for (m, L) in qs]

        def fallback(_):
            small = attempt(gamma * 0.1)
            return select(ok_step(small), small, frozen)

        out = jax.lax.cond(ok_step(out), lambda _: out, fallback,
                           operand=None)
    return out


def natgrad_step(
    q_mu: jnp.ndarray,
    q_sqrt: jnp.ndarray,
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    gamma: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-layer convenience wrapper over :func:`natgrad_step_multi`."""
    (res,) = natgrad_step_multi(
        [(q_mu, q_sqrt)], lambda qs: loss_fn(qs[0][0], qs[0][1]), gamma
    )
    return res

"""NARGP surrogate (models/nargp.py) — nonlinear autoregressive
multi-fidelity GP (Perdikaris et al. 2017), the nonlinear complement to
the AR(1) co-kriging surrogate (beyond reference: the reference's only MF
surrogate is the variational MF-DGP)."""

import numpy as np
import pytest

from dgp_tpu.bo.doe import lhs
from dgp_tpu.models.dgp import moment_matched
from dgp_tpu.models.nargp import NARGP


def _quadratic_pair(nl=30, nh=10, seed=0):
    """The canonical NARGP stress case: f_high = (f_low)^2 — a purely
    NONLINEAR cross-fidelity map with ~zero linear correlation, which an
    AR(1) model cannot represent at all (rho fits ~0 and the high level
    degenerates to a single-fidelity GP on nh points)."""
    Xl, Xh = lhs(1, nl, seed=seed), lhs(1, nh, seed=seed + 1)
    f_low = lambda x: np.sin(8.0 * np.pi * np.asarray(x).reshape(-1, 1))
    f_high = lambda x: f_low(x) ** 2
    return Xl, Xh, f_low, f_high


def test_level0_matches_plain_gpr():
    """fidelity=0 prediction is the exact single-level GPR posterior."""
    from dgp_tpu.models import gpr as gpr_mod
    from dgp_tpu.ops import kernels as K

    rng = np.random.default_rng(0)
    Xl = rng.uniform(0, 1, (9, 2))
    Xh = rng.uniform(0, 1, (4, 2))
    yl, yh = rng.normal(size=(9, 1)), rng.normal(size=(4, 1))
    m = NARGP(([Xl, Xh], [yl, yh]), noise_variance=1e-4)
    g = gpr_mod.GPR((Xl, yl), K.RBF.create(lengthscales=[0.5, 0.5]),
                    noise_variance=1e-4)
    Xt = rng.uniform(0, 1, (7, 2))
    m0, v0 = m.predict_f(Xt, S=5, fidelity=0)
    mg, vg = g.predict_f(Xt)
    assert m0.shape == (1, 7, 1) and v0.shape == (1, 7, 1)
    np.testing.assert_allclose(np.asarray(m0)[0], np.asarray(mg), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(v0)[0], np.asarray(vg), rtol=1e-10)


def test_nonlinear_map_recovery_beats_ar1():
    """On f_high = (f_low)^2 the trained NARGP recovers the high fidelity
    (r2 > 0.9 from 10 high points) while exact AR(1) co-kriging — linear
    across fidelities by construction — cannot (r2 < 0.5). This is the
    measured reason MF_BO exposes both surrogate types."""
    from dgp_tpu.models.cokriging import AR1CoKriging

    Xl, Xh, f_low, f_high = _quadratic_pair()
    Ys = [f_low(Xl), f_high(Xh)]
    Xt = lhs(1, 200, seed=99)
    yt = f_high(Xt)

    def _r2(model):
        model.optimize(n_starts=8, iterations=1500, lr=0.05, seed=0)
        m_s, v_s = model.predict_f(Xt, S=300)
        mean, _ = moment_matched(np.asarray(m_s), np.asarray(v_s))
        return 1.0 - np.mean((mean - yt) ** 2) / np.var(yt)

    r2_nargp = _r2(NARGP(([Xl, Xh], Ys), n_bucket=8))
    r2_ar1 = _r2(AR1CoKriging(([Xl, Xh], Ys), n_bucket=8))
    assert r2_nargp > 0.9, r2_nargp
    assert r2_ar1 < 0.5, r2_ar1


def test_bucket_padding_is_exactly_decoupled():
    """Same params, padded vs unpadded data: identical predictions (the
    masked-Gram padding idiom), and the padded NLL differs from the
    unpadded one by a parameter-independent constant."""
    rng = np.random.default_rng(3)
    Xl, Xh = rng.uniform(0, 1, (9, 2)), rng.uniform(0, 1, (5, 2))
    Ys = [rng.normal(size=(9, 1)), rng.normal(size=(5, 1))]
    m_pad = NARGP(([Xl, Xh], Ys), n_bucket=8)
    m_raw = NARGP(([Xl, Xh], Ys), n_bucket=None)
    Xt = rng.uniform(0, 1, (6, 2))
    import jax

    key = jax.random.PRNGKey(7)
    mp, vp = m_pad.predict_f(Xt, S=64, key=key)
    mr, vr = m_raw.predict_f(Xt, S=64, key=key)
    np.testing.assert_allclose(np.asarray(mp), np.asarray(mr), atol=1e-9)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vr), atol=1e-9)

    c0 = float(m_pad.training_loss()) - float(m_raw.training_loss())
    # perturb the params; the padding constant must not move
    bump = jax.tree.map(lambda x: x + 0.3, m_pad.params)
    m_pad.params = bump
    m_raw.params = bump
    c1 = float(m_pad.training_loss()) - float(m_raw.training_loss())
    np.testing.assert_allclose(c0, c1, atol=1e-8)


def test_three_level_chain_and_shapes():
    """L=3 chain: optimize runs, every fidelity predicts with the
    documented moments contract, and intermediate fidelities propagate."""
    Xs = [lhs(1, 16, seed=s) for s in (0, 1, 2)]
    f0 = lambda x: np.sin(6 * np.asarray(x).reshape(-1, 1))
    Ys = [f0(Xs[0]), f0(Xs[1]) ** 2, f0(Xs[2]) ** 2 + 0.5 * f0(Xs[2])]
    m = NARGP((Xs, Ys), n_bucket=8)
    m.optimize(n_starts=3, iterations=300, lr=0.05, seed=0)
    Xt = lhs(1, 11, seed=9)
    m0, v0 = m.predict_f(Xt, S=33, fidelity=0)
    m1, v1 = m.predict_f(Xt, S=33, fidelity=1)
    m2, v2 = m.predict_f(Xt, S=33)
    assert m0.shape == (1, 11, 1)
    assert m1.shape == (33, 11, 1) and v1.shape == (33, 11, 1)
    assert m2.shape == (33, 11, 1)
    for a in (m0, v0, m1, v1, m2, v2):
        assert np.all(np.isfinite(np.asarray(a)))
    assert np.all(np.asarray(v1) >= 0) and np.all(np.asarray(v2) >= 0)
    # the trained chain actually fits the top level
    mean, _ = moment_matched(np.asarray(m2), np.asarray(v2))
    yt = f0(Xt) ** 2 + 0.5 * f0(Xt)
    assert 1.0 - np.mean((mean - yt) ** 2) / np.var(yt) > 0.8


def test_mc_propagation_collapses_when_lower_level_certain():
    """With a dense, low-noise level below, the per-sample spread of the
    top-level moments vanishes (the MC propagation is exact-in-the-limit,
    not an extra noise source)."""
    Xl, Xh, f_low, f_high = _quadratic_pair(nl=60, nh=12, seed=4)
    m = NARGP(([Xl, Xh], [f_low(Xl), f_high(Xh)]), noise_variance=1e-6)
    m.optimize(n_starts=4, iterations=800, lr=0.05, seed=0)
    Xt = lhs(1, 20, seed=5)
    m_s, _ = m.predict_f(Xt, S=200)
    spread = float(np.std(np.asarray(m_s), axis=0).max())
    scale = float(np.std(np.asarray(m_s)))
    assert spread < 0.15 * max(scale, 1e-12), (spread, scale)


def test_mf_bo_nargp_type_runs_and_roundtrips(tmp_path):
    """MF_BO with model_dic {'type': 'nargp'}: one infill runs through the
    cached DE engines, and save/load restores the surrogate choice."""
    from dgp_tpu.bo.mf_bo import MF_BO
    from dgp_tpu.utils.test_functions import forrester_high, forrester_low

    spec = {"type": "nargp", "n_starts": 2, "iterations": 60,
            "num_samples": 8}
    bo = MF_BO(fidelities=[forrester_low, forrester_high],
               DoE_sizes=(6, 3), d=1, model_dic=spec, seed=0)
    bo.run(1, popsize_DE=12, iterations_DE=10, num_samples=8, verbose=False)
    assert len(bo.fidelity_choices) == 1
    p = str(tmp_path / "mfbo.npz")
    bo.save(p)
    bo2 = MF_BO.load(p, fidelities=[forrester_low, forrester_high])
    assert bo2.model_dic == spec
    assert bo2.best_trace == bo.best_trace
    bo2.run(1, popsize_DE=12, iterations_DE=10, num_samples=8,
            verbose=False)
    assert len(bo2.fidelity_choices) == 2


def test_nll_is_joint_and_train_data_cached():
    """optimize() stores the JOINT (summed per-level) NLL — comparable with
    AR1CoKriging._nll for cross-surrogate model selection — and seeds the
    train_data cache; reassigning params invalidates the cache."""
    Xl, Xh, f_low, f_high = _quadratic_pair(nl=16, nh=6, seed=7)
    m = NARGP(([Xl, Xh], [f_low(Xl), f_high(Xh)]), n_bucket=8,
              num_samples=4)
    m.optimize(n_starts=2, iterations=80, lr=0.05, seed=0)
    assert m._nll == pytest.approx(float(m.training_loss()), rel=1e-4)
    # cached: repeated access returns the same tuple object (no recompute)
    td = m.train_data
    assert m.train_data is td
    # params assignment invalidates; recompute matches leaf-for-leaf
    m.params = m.params
    td2 = m.train_data
    assert td2 is not td
    for (a, _, _), (b, _, _) in zip(td, td2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

"""Fused variational-quadform kernel: t2[d, n] = || Sq[d] @ A[:, n] ||^2.

The t2 term of the SVGP conditional variance (ops/conditionals.py, the
``B = Sq @ A; t2 = sum(B*B, 1)`` pair — the rebuild of the variance quadform
at /root/reference/dgp_dace/utils/layers.py:249-278) is the FLOP-dominant
contraction of the model, and under XLA it is *bandwidth*-dominant: the
[D, M, n] intermediate ``B`` (n = S*N ~ 1e5) is written to HBM in the
forward, saved as a residual, and re-read twice more in the backward —
~1.6 GB of traffic per bench.py step, measured as ~45% of the whole
training step (benchmarks/step_anatomy.py: full 226 steps/s, t2-backward
ablated 342, t2 removed 407).

This kernel never materializes ``B``: the forward computes it tile-by-tile
in VMEM and reduces immediately; the custom backward *recomputes* each tile
(3 MXU matmuls per (d, tile) instead of 2) and accumulates

    dA  = 2 * sum_d Sq[d]^T (B_d * g[d])        [M, n]
    dSq = 2 * (B_d * g[d]) A^T                  [D, M, M]

so HBM traffic drops to reading A twice + writing dA once (~150 MB).
Trading ~1.5x matmul passes for ~10x less traffic is the right side of the
v5e roofline (~200 TFLOP/s bf16 vs ~0.8 TB/s).

Precision: the forward B matmul runs 3-pass bf16 (``Precision.HIGH``,
matching config.quad_precision on f32 — the term is a cancellation-free sum
of squares, see ops/precision.py); the backward matmuls run 1-pass
(``DEFAULT``, matching config.bwd_precision).

Used automatically by conditional_diag on f32 TPU for MXU-worthy shapes;
CPU/f64/small-n fall back to the jnp path. `dgp_tpu.config.set_use_pallas`
overrides.
"""

from __future__ import annotations

import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp

from ..config import bwd_precision, quad_precision
from .precision import mm

TILE_N = 1024

# test hook: run the kernels through the Pallas interpreter (CPU CI)
_INTERPRET = False


def _tile_n(D, M, prec=None):
    """Largest point-tile that keeps the backward kernel inside VMEM.

    The bwd working set is dominated by the recomputed B tile and its
    cotangent, 2 * (D*M * TN) f32, plus the bf16 split copies and the
    A/dA/Sq/dSq blocks; budget those under ~10 MB of the 16 MB VMEM
    (measured: TN=1024 at D*M=2048 overflows by 0.3 MB — exactly the
    scoped-vmem limit). HIGHEST emulation keeps both hi/lo operand splits
    of every TN-sized buffer live, roughly doubling the working set
    (measured 22.3 MB at the 3-pass-sized tile), so its budget halves."""
    budget = 10 * 2 ** 20
    if prec == jax.lax.Precision.HIGHEST:
        budget //= 2
    tn = TILE_N
    while tn > 128 and 4 * (2 * D * M + 2 * M) * tn > budget:
        tn //= 2
    return tn


# -- kernels -------------------------------------------------------------------


def _worst(p1, p2):
    hi = jax.lax.Precision.HIGHEST
    return hi if hi in (p1, p2) else p1


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(x, y, dims, prec):
    """dot_general with Mosaic-supported precision semantics: HIGHEST passes
    through (6-pass emulation), DEFAULT is one native bf16 pass, and HIGH —
    which Mosaic does not implement — is emulated by the standard 3-pass
    bf16 split hi@hi + hi@lo + lo@hi (identical arithmetic to XLA's HIGH)."""
    if prec == jax.lax.Precision.HIGH:
        xh, xl = _split_bf16(x)
        yh, yl = _split_bf16(y)
        dg = functools.partial(
            jax.lax.dot_general, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dg(xh, yh) + (dg(xh, yl) + dg(xl, yh))
    return jax.lax.dot_general(
        x, y, (dims, ((), ())), precision=prec,
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(D, M, fwd_prec, with_t1, sq_ref, a_ref, out_ref,
                t1_ref=None):
    # sq_ref is the [D*M, M] row-flattened Sq stack: ONE MXU matmul computes
    # every output GP's B tile at once (D small matmuls leave the 128x128
    # systolic array idle between issues — measured 2x slower)
    a = a_ref[:]
    b = _dot(sq_ref[:], a, ((1,), (0,)), fwd_prec)          # [D*M, TN]
    tn = b.shape[-1]
    out_ref[:] = jnp.sum(b.reshape(D, M, tn) * b.reshape(D, M, tn), axis=1)
    if with_t1:
        # whitened prior-reduction term ||A||^2 for free while A is in VMEM
        t1_ref[:] = jnp.sum(a * a, axis=0, keepdims=True)   # [1, TN]


def _bwd_kernel(D, M, fwd_prec, bwd_prec, with_t1, sq_ref, a_ref, g_ref,
                *rest):
    if with_t1:
        g1_ref, da_ref, dsq_ref = rest
    else:
        da_ref, dsq_ref = rest
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dsq_ref[:] = jnp.zeros_like(dsq_ref)

    a = a_ref[:]
    sq = sq_ref[:]                                          # [D*M, M]
    # recompute the forward tile AT THE COTANGENT PRECISION: the recomputed
    # B only enters gradients (gb = 2*B*g), so its error budget is the same
    # as the cotangent matmuls' — recomputing at the (higher) forward
    # precision spends 2 extra passes of the dominant matmul for accuracy
    # the gradient doesn't use (measured: <=1e-4 relative drift, see
    # benchmarks notes)
    b = _dot(sq, a, ((1,), (0,)), bwd_prec)                 # [D*M, TN]
    tn = b.shape[-1]
    # g row d broadcast over that d's M-block of rows
    gexp = jnp.broadcast_to(g_ref[:][:, None, :], (D, M, tn)).reshape(
        D * M, tn)
    gb = (2.0 * b) * gexp                                   # [D*M, TN]
    # dA = sum_{d,m} Sq[d,m,k] gb[(d,m),n] : contract the flattened row axis
    da = _dot(sq, gb, ((0,), (0,)), bwd_prec)               # [M, TN]
    if with_t1:
        da = da + (2.0 * a) * g1_ref[:]                     # [M,TN]*[1,TN]
    da_ref[:] = da
    # dSq[(d,m),k] += sum_n gb[(d,m),n] A[k,n] : contract n
    dsq_ref[:] += _dot(gb, a, ((1,), (1,)), bwd_prec)       # [D*M, M]


# -- pallas_call wrappers ------------------------------------------------------


def _pad_n(x, tile):
    n = x.shape[-1]
    rem = (-n) % tile
    if rem:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, rem)]
        x = jnp.pad(x, pad)
    return x, n


@functools.lru_cache(maxsize=None)
def _fwd_call(D: int, M: int, n_pad: int, fwd_prec, interpret,
              with_t1=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE_N = _tile_n(D, M, fwd_prec)
    grid = (n_pad // TILE_N,)
    kernel = functools.partial(_fwd_kernel, D, M, fwd_prec, with_t1)
    out_specs = pl.BlockSpec((D, TILE_N), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((D, n_pad), jnp.float32)
    if with_t1:
        out_specs = (out_specs,
                     pl.BlockSpec((1, TILE_N), lambda i: (0, i),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((1, n_pad), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((D * M, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * M * M * n_pad * 3,
            bytes_accessed=4 * (M * n_pad + D * M * M + D * n_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _bwd_call(D: int, M: int, n_pad: int, fwd_prec, bwd_prec,
              interpret, with_t1=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE_N = _tile_n(D, M, _worst(fwd_prec, bwd_prec))
    grid = (n_pad // TILE_N,)
    kernel = functools.partial(_bwd_kernel, D, M, fwd_prec, bwd_prec,
                               with_t1)
    in_specs = [
            pl.BlockSpec((D * M, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
    ]
    if with_t1:
        in_specs.append(pl.BlockSpec((1, TILE_N), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((M, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D * M, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((D * M, M), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * D * M * M * n_pad * (3 + 1 + 1),
            bytes_accessed=4 * (2 * M * n_pad + 2 * D * M * M + D * n_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )


# -- public op -----------------------------------------------------------------


@jax.custom_vjp
def quadform_t2_pallas(Sq, A):
    """t2[d, n] = sum_m (Sq[d] @ A)[m, n]^2 for Sq [D, M, M], A [M, n]."""
    return _t2_fwd(Sq, A)


def _t2_fwd(Sq, A):
    D, M = Sq.shape[0], Sq.shape[1]
    Ap, n = _pad_n(A, _tile_n(D, M, quad_precision()))
    out = _fwd_call(D, M, Ap.shape[-1], quad_precision(),
                    _INTERPRET)(Sq.reshape(D * M, M), Ap)
    return out[:, :n]


def _t2_vjp_fwd(Sq, A):
    return _t2_fwd(Sq, A), (Sq, A)


def _t2_vjp_bwd(res, g):
    Sq, A = res
    D, M = Sq.shape[0], Sq.shape[1]
    tn = _tile_n(D, M, _worst(quad_precision(), bwd_precision()))
    Ap, n = _pad_n(A, tn)
    gp, _ = _pad_n(g, tn)
    dA, dSq = _bwd_call(D, M, Ap.shape[-1], quad_precision(),
                        bwd_precision(), _INTERPRET)(Sq.reshape(D * M, M),
                                                     Ap, gp)
    return dSq.reshape(D, M, M), dA[:, :n]


quadform_t2_pallas.defvjp(_t2_vjp_fwd, _t2_vjp_bwd)


@jax.custom_vjp
def quadform_t2_t1_pallas(Sq, A):
    """(t2, t1) = (||Sq[d] A||^2 per d, ||A||^2 per point) in one pass —
    the whitened conditional's two variance terms share A, so t1 rides
    along while the A tile is already resident in VMEM (and its cotangent
    2*A*g1 folds into the backward's dA for free)."""
    return _t2_t1_fwd(Sq, A)


def _t2_t1_fwd(Sq, A):
    D, M = Sq.shape[0], Sq.shape[1]
    Ap, n = _pad_n(A, _tile_n(D, M, quad_precision()))
    t2, t1 = _fwd_call(D, M, Ap.shape[-1], quad_precision(),
                       _INTERPRET, with_t1=True)(Sq.reshape(D * M, M), Ap)
    return t2[:, :n], t1[0, :n]


def _t2_t1_vjp_fwd(Sq, A):
    return _t2_t1_fwd(Sq, A), (Sq, A)


def _t2_t1_vjp_bwd(res, gs):
    Sq, A = res
    g2, g1 = gs
    D, M = Sq.shape[0], Sq.shape[1]
    tn = _tile_n(D, M, _worst(quad_precision(), bwd_precision()))
    Ap, n = _pad_n(A, tn)
    g2p, _ = _pad_n(g2, tn)
    g1p, _ = _pad_n(g1[None, :], tn)
    dA, dSq = _bwd_call(D, M, Ap.shape[-1], quad_precision(),
                        bwd_precision(), _INTERPRET,
                        with_t1=True)(Sq.reshape(D * M, M), Ap, g2p, g1p)
    return dSq.reshape(D, M, M), dA[:, :n]


quadform_t2_t1_pallas.defvjp(_t2_t1_vjp_fwd, _t2_t1_vjp_bwd)


def quadform_t2_t1(Sq, A):
    """Dispatch for the whitened path: fused (t2, t1) kernel where
    applicable, jnp fallback otherwise."""
    from ..config import use_pallas

    if use_pallas() and _kernel_applicable(Sq, A):
        return quadform_t2_t1_pallas(Sq, A)
    return quadform_t2_reference(Sq, A), jnp.sum(A * A, axis=0)


def quadform_t2_reference(Sq, A):
    """The jnp path the kernel replaces (and the fallback everywhere the
    kernel is not profitable): materializes B = Sq @ A."""
    B = mm(Sq, A[None], quad_precision(), bwd_precision())
    return jnp.sum(B * B, axis=1)


def _kernel_applicable(Sq, A):
    if Sq.dtype != jnp.float32 or A.dtype != jnp.float32:
        return False
    D, M = Sq.shape[0], Sq.shape[1]
    n = A.shape[-1]
    if M % 8 or M < 64:
        return False          # sub-MXU factor: jnp path is fine
    if n < 4 * TILE_N:
        return False          # tiny point count: launch overhead dominates
    from ..config import pallas_max_m

    max_m = pallas_max_m()
    if M > max_m or D * M > 8 * max_m:
        return False
        # arithmetic intensity of the XLA path grows ~M (FLOPs D*M^2*n vs
        # traffic D*M*n): by M=256 the quadform is compute-bound regardless
        # of D, the backward recompute trade loses, and the VMEM-limited
        # tile shrinks — measured on benchmarks/large_scale.py (M=256):
        # 35.8 steps/s at D=8 and 55.1 at D=1 vs 69.9-71.9 on the XLA path,
        # vs +13%/+19% kernel wins at M=128 (bench.py). Gate to the
        # bandwidth-bound regime (config.set_pallas_max_m to re-measure;
        # the round-2 Mosaic M=256 verification bug is gone on jax 0.9.0).
    return True


def quadform_t2(Sq, A):
    """Dispatch: fused Pallas kernel on TPU f32 at MXU-worthy shapes, jnp
    reference otherwise (CPU, f64, tiny n, odd M)."""
    from ..config import use_pallas

    if use_pallas() and _kernel_applicable(Sq, A):
        return quadform_t2_pallas(Sq, A)
    return quadform_t2_reference(Sq, A)

"""Differential evolution in pure JAX.

Replaces ``tfp.optimizer.differential_evolution_minimize`` used by every
acquisition optimizer in the reference
(/root/reference/dgp_dace/Infill_criteria.py:65-67, EHVI.py:214-216).
DE/rand/1/bin with tfp's defaults (differential_weight=0.5,
crossover_prob=0.9); the initial population is the seed point plus
Normal(0, stddev) perturbations, matching tfp's ``population_stddev``.

The whole optimization is one jitted ``lax.fori_loop`` — the population
evaluation (popsize × model forward) is a single batched XLA program per
generation instead of tfp's Python-driven loop.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class DEResult(NamedTuple):
    position: jnp.ndarray   # [d] best member
    objective: jnp.ndarray  # scalar best fitness
    final_population: jnp.ndarray
    final_fitness: jnp.ndarray


# Compiled-optimizer cache: a BO loop re-optimizes its acquisition every
# infill; keying the jitted DE/Adam program on the (stable) objective function
# and static hyperparameters — with the model state passed as a traced
# ``fn_args`` pytree — makes every iteration after the first reuse the
# compiled program (see models/training._ENGINE_CACHE for the training-side
# counterpart).
_ENGINE_CACHE: dict = {}


def engine_cache_size() -> int:
    return len(_ENGINE_CACHE)


def clear_engine_cache() -> None:
    _ENGINE_CACHE.clear()


def _de_body(fn, with_args, population_size, population_stddev,
             max_iterations, differential_weight, crossover_prob):
    P = population_size

    def run(x0, key, fn_args):
        d = x0.shape[0]
        key, k_init = jax.random.split(key)
        noise = jax.random.normal(k_init, (P, d), dtype=x0.dtype) * population_stddev
        pop = x0[None] + noise.at[0].set(0.0)

        def eval_fn(p):
            out = fn(p, fn_args) if with_args else fn(p)
            return out.reshape(P)

        fit = eval_fn(pop)

        def gen(i, carry):
            pop, fit, key = carry
            key, k_idx, k_cross, k_jrand = jax.random.split(key, 4)
            # rand/1: three random donors per member (tfp-style sampling; the
            # rare self/duplicate draw only weakens one mutant for one round).
            r = jax.random.randint(k_idx, (3, P), 0, P)
            mutant = pop[r[0]] + differential_weight * (pop[r[1]] - pop[r[2]])
            cross = jax.random.uniform(k_cross, (P, d)) < crossover_prob
            jrand = jax.random.randint(k_jrand, (P,), 0, d)
            force = jax.nn.one_hot(jrand, d, dtype=bool)
            mask = jnp.logical_or(cross, force)
            trial = jnp.where(mask, mutant, pop)
            tfit = eval_fn(trial)
            better = tfit < fit
            pop = jnp.where(better[:, None], trial, pop)
            fit = jnp.where(better, tfit, fit)
            return pop, fit, key

        pop, fit, _ = jax.lax.fori_loop(
            0, max_iterations, gen, (pop, fit, key)
        )
        best = jnp.argmin(fit)
        return DEResult(pop[best], fit[best], pop, fit)

    return run


def minimize(
    fn: Callable,
    initial_position,
    key,
    population_size: int = 300,
    population_stddev: float = 1.5,
    max_iterations: int = 400,
    differential_weight: float = 0.5,
    crossover_prob: float = 0.9,
    fn_args=None,
) -> DEResult:
    """Minimize ``fn`` over R^d.

    :param fn: batched objective [P, d] -> [P] (or [P, 1]); with ``fn_args``
        given the signature is ``fn(p, fn_args)`` and ``fn`` must be a stable
        object — the whole jitted DE program is then cached on
        (fn, hyperparameters) and re-used across calls.
    :param initial_position: [d] seed point.
    """
    x0 = jnp.asarray(initial_position)
    if fn_args is None:
        run = _de_body(fn, False, population_size, population_stddev,
                       max_iterations, differential_weight, crossover_prob)
        return run(x0, key, None)
    from ..models.training import _precision_signature

    cache_key = ("de", fn, population_size, population_stddev,
                 max_iterations, differential_weight, crossover_prob,
                 _precision_signature())
    run = _ENGINE_CACHE.get(cache_key)
    if run is None:
        run = jax.jit(_de_body(fn, True, population_size, population_stddev,
                               max_iterations, differential_weight,
                               crossover_prob))
        _ENGINE_CACHE[cache_key] = run
    return run(x0, key, fn_args)


def _adam_body(fn, with_args, iterations, lr):
    import optax

    opt = optax.adam(lr)

    def run(v0, fn_args):
        def scalar_fn(v):
            out = fn(v[None], fn_args) if with_args else fn(v[None])
            return out.reshape(())

        state = opt.init(v0)

        def step(carry, _):
            v, state = carry
            loss, g = jax.value_and_grad(scalar_fn)(v)
            updates, state = opt.update(g, state, v)
            return (optax.apply_updates(v, updates), state), loss

        (v, _), losses = jax.lax.scan(step, (v0, state), None, length=iterations)
        # one extra evaluation so the reported objective matches the *final*
        # position (the scan's last loss is pre-update and lags v by one step)
        return v, scalar_fn(v)

    return run


def adam_refine(
    fn: Callable,
    v0,
    iterations: int = 1000,
    lr: float = 0.01,
    fn_args=None,
):
    """Adam refinement of a single point in the unconstrained space
    (the reference's post-DE Adam loop, Infill_criteria.py:70-86).
    With ``fn_args``, same cached-engine contract as :func:`minimize`.
    Returns (v, objective-at-v) — the objective is re-evaluated at the final
    position, not the last pre-update scan value."""
    v0 = jnp.asarray(v0)
    if fn_args is None:
        run = jax.jit(lambda v: _adam_body(fn, False, iterations, lr)(v, None))
        return run(v0)
    from ..models.training import _precision_signature

    cache_key = ("adam", fn, iterations, lr, _precision_signature())
    run = _ENGINE_CACHE.get(cache_key)
    if run is None:
        run = jax.jit(_adam_body(fn, True, iterations, lr))
        _ENGINE_CACHE[cache_key] = run
    return run(v0, fn_args)

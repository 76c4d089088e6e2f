"""Jitted training engines: masked Adam and Adam+NaturalGradient loops.

These replace the eager Python loops of the reference
(/root/reference/dgp_dace/models/dgp.py:132-220 and the three-phase variants
in MF_DGP/MF_DGP_EM/MO_DGP). Phase freezing — the reference's
``set_trainable(...)`` choreography — is expressed as boolean mask pytrees fed
to ``optax.masked``; each phase runs as one ``lax.scan`` under ``jit`` so a
whole training phase is a single XLA computation with no host round-trips
(progress is reported via ``jax.debug.print``).
"""

from __future__ import annotations

import functools as _functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from ..variational.natgrad import natgrad_step_multi


# -- trainability masks -------------------------------------------------------

def _path_names(path):
    names = []
    for p in path:
        if isinstance(p, jax.tree_util.GetAttrKey):
            names.append(p.name)
        elif isinstance(p, jax.tree_util.DictKey):
            names.append(str(p.key))
    return names


def _path_layer_index(path):
    """Index into a ``layers``/``layers_red`` tuple if the path crosses one."""
    for i, p in enumerate(path[:-1]):
        if isinstance(p, jax.tree_util.GetAttrKey) and p.name in (
            "layers",
            "layers_red",
        ):
            nxt = path[i + 1]
            if isinstance(nxt, jax.tree_util.SequenceKey):
                return p.name, nxt.idx
    return None, None


def mask_from_predicate(params, predicate: Callable) -> object:
    """Boolean mask pytree: predicate(field_names, (group, layer_idx)) -> bool.

    ``field_names`` is the list of attribute names along the leaf's path;
    ``group``/``layer_idx`` identify which layer tuple (if any) it sits in.
    """

    def fn(path, leaf):
        return bool(predicate(_path_names(path), _path_layer_index(path)))

    return jax.tree_util.tree_map_with_path(fn, params)


def default_frozen_fields() -> set:
    """Fields that are never trained (mirrors the reference always freezing
    mean-function weights, layer_initializations.py:55)."""
    return {"mean_function"}


def make_mask(params, frozen_fields: Sequence[str] = (), frozen_layer_fields=None):
    """Convenience mask builder.

    :param frozen_fields: leaf is frozen if any path name is in this set.
    :param frozen_layer_fields: optional dict {(group, layer_idx): set(fields)}
        or {layer_idx: set(fields)} applying within a specific layer; use the
        key "all" for every layer of a group.
    """
    frozen = set(frozen_fields) | default_frozen_fields()
    frozen_layer_fields = frozen_layer_fields or {}

    def predicate(names, group_idx):
        if any(n in frozen for n in names):
            return False
        group, idx = group_idx
        if idx is not None:
            for key, fields in frozen_layer_fields.items():
                if key == idx or key == (group, idx) or key == "all" or key == (group, "all"):
                    if any(n in fields for n in names):
                        return False
        return True

    return mask_from_predicate(params, predicate)


# -- optimizers ---------------------------------------------------------------

def masked_adam(mask, lr, b1=0.9, b2=0.999, eps=1e-7):
    """Adam on mask-True leaves, zero update elsewhere.

    NOTE: ``optax.masked`` alone passes mask-False leaves' updates through
    *unchanged* (i.e. raw gradients would be added to frozen params), so the
    frozen side must be explicitly routed to ``set_to_zero``.
    """
    labels = jax.tree_util.tree_map(
        lambda t: "train" if t else "freeze", mask
    )
    return optax.multi_transform(
        {"train": optax.adam(lr, b1=b1, b2=b2, eps=eps),
         "freeze": optax.set_to_zero()},
        labels,
    )


def _grad_norm(grads):
    leaves = [jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads)]
    return jnp.sqrt(sum(leaves))


def _surface_nonfinite(trace, label):
    """Post-scan NaN/Inf surfacing (SURVEY.md §5: the reference's only
    failure mode is a silently diverging print trace). Runs on the host after
    the phase; warns with the first bad step index so a diverged phase is
    visible even when messages=0."""
    import warnings

    import numpy as _np

    arr = _np.asarray(trace["loss"] if isinstance(trace, dict) else trace)
    bad = _np.flatnonzero(~_np.isfinite(arr))
    if bad.size:
        warnings.warn(
            f"{label}: non-finite loss at step {int(bad[0])} "
            f"({bad.size}/{arr.size} steps non-finite)",
            RuntimeWarning,
            stacklevel=3,
        )
    return trace


# -- compiled-engine cache ------------------------------------------------------
#
# A fresh ``@jax.jit`` closure per training call would recompile the whole
# phase every time it runs — even at identical shapes. That is the dominant
# wall-clock cost of a BO loop on TPU (SO_BO retrains its surrogates every
# infill, BO/SO_BO.py:251-268 in the reference). Engines built here are cached
# by (loss identity, mask signature, hyperparameters); the data batch is a
# *traced argument* rather than a closed-over constant, so re-running with new
# data of the same shape reuses the compiled program outright, and models can
# keep shapes stable across infills by bucketing (models/dgp.py, models/gpr.py).
#
# Cache-hit requirement: ``loss_fn`` (and ``get_qs``/``set_qs`` for the natgrad
# engine) must be *stable function objects* — produce them from module-level
# ``lru_cache``d factories, not per-call lambdas.

_ENGINE_CACHE: dict = {}


def _mask_signature(mask):
    """Hashable identity of a boolean mask pytree (structure + values):
    two masks with equal signatures produce identical masked optimizers."""
    return (
        jax.tree_util.tree_structure(mask),
        tuple(bool(v) for v in jax.tree_util.tree_leaves(mask)),
    )


def _precision_signature():
    """Engines bake the MXU precision knobs in at trace time — keying the
    cache on them makes flipping config.set_quad/bwd_precision between runs
    recompile instead of silently reusing the old program."""
    from ..config import bwd_precision, pallas_max_m, quad_precision, use_pallas

    return (quad_precision(), bwd_precision(), use_pallas(), pallas_max_m())


def engine_cache_size() -> int:
    return len(_ENGINE_CACHE)


def clear_engine_cache() -> None:
    _ENGINE_CACHE.clear()


def make_checkpoint_fn(path: str):
    """Host callback for adam_run/nat_adam_run's ``checkpoint_fn``: saves the
    current param pytree atomically to ``path`` (utils.checkpoint.save);
    restore with utils.checkpoint.load(path, like=model.params)."""
    from ..utils import checkpoint as _ckpt

    def fn(params, steps_done):
        _ckpt.save(path, params)

    return fn


def bucket_rows(n: int, bucket: int) -> int:
    """Round n up to the next multiple of ``bucket``."""
    return -(-n // bucket) * bucket


def pad_to_bucket(X, Y, bucket: int):
    """Pad (X [N,d], Y [N,p]) to the next row bucket; returns (Xp, Yp, w)
    with w a 0/1 row-weight vector. Pad X rows repeat row 0 (finite kernel
    inputs), pad Y rows are zero. Keeping N in shape buckets stops the
    per-infill recompile of a growing BO dataset (XLA static shapes,
    SURVEY.md §7.3 'Dynamic BO loop vs XLA static shapes')."""
    n = X.shape[0]
    n_pad = bucket_rows(n, bucket)
    w = jnp.zeros((n_pad,), X.dtype).at[:n].set(1.0)
    if n_pad == n:
        return X, Y, w
    pad = n_pad - n
    Xp = jnp.concatenate([X, jnp.tile(X[:1], (pad, 1))], axis=0)
    Yp = jnp.concatenate([Y, jnp.zeros((pad, Y.shape[1]), Y.dtype)], axis=0)
    return Xp, Yp, w


@_functools.lru_cache(maxsize=None)
def multistart_adam_engine(loss_fn: Callable, iterations: int, lr: float):
    """Cached jitted multi-start Adam on an exact NLL ``loss_fn(params,
    *batch)``: vmapped over a leading starts axis of the params pytree, then
    argmin of the final same-data NLL (non-finite candidates lose to any
    finite one). The batch is a traced pytree, so retraining after new
    points of the same bucketed shape reuses the compiled program. Shared by
    the exact MF surrogates (models/cokriging.py, models/nargp.py) — keyed
    on the stable module-level ``loss_fn`` object, per the engine-cache
    idiom."""
    opt = optax.adam(lr)

    def _train_one(params, batch):
        opt_state = opt.init(params)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), None, length=iterations)
        final = loss_fn(params, *batch)
        return params, final, losses

    @jax.jit
    def run(stacked_params, batch):
        params_b, finals, losses_b = jax.vmap(
            _train_one, in_axes=(0, None))(stacked_params, batch)
        finals = jnp.where(jnp.isfinite(finals), finals, jnp.inf)
        i = jnp.argmin(finals)
        best = jax.tree.map(lambda x: x[i], params_b)
        return best, finals[i], losses_b[i]

    return run


def _make_adam_engine(opt, loss_fn, steps, messages, label, metrics_fn, with_data):
    """Jitted *stateful* Adam scan: (params, opt_state, key, batch) ->
    (params, opt_state, key, trace). Threading the optimizer state through
    lets a long phase run as repeated chunks of one compiled program with
    host checkpointing between chunks (SURVEY.md §5: the reference's 15k+
    iteration phases are uninterruptible). ``with_data`` selects the loss_fn
    arity ((params, key) legacy vs (params, key, batch) cached-engine)."""

    def body(params, opt_state, key, batch):
        def step(carry, i):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            if with_data:
                loss, grads = jax.value_and_grad(loss_fn)(params, sub, batch)
            else:
                loss, grads = jax.value_and_grad(loss_fn)(params, sub)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if messages:
                jax.lax.cond(
                    i % messages == 0,
                    lambda: jax.debug.print(label + ": {v}", v=-loss),
                    lambda: None,
                )
            if metrics_fn is None:
                out = loss
            else:
                out = {"loss": loss, "grad_norm": _grad_norm(grads)}
                out.update(metrics_fn(params))
            return (params, opt_state, key), out

        (params, opt_state, key), trace = jax.lax.scan(
            step, (params, opt_state, key), jnp.arange(steps)
        )
        return params, opt_state, key, trace

    if with_data:
        return jax.jit(body)
    return jax.jit(lambda params, opt_state, key: body(params, opt_state, key, None))


def _concat_traces(traces):
    if len(traces) == 1:
        return traces[0]
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *traces
    )


def _chunk_sizes(steps: int, chunk: int):
    """[chunk, chunk, ..., remainder] covering ``steps``."""
    if chunk <= 0 or chunk >= steps:
        return [steps]
    out = [chunk] * (steps // chunk)
    if steps % chunk:
        out.append(steps % chunk)
    return out


def adam_run(
    loss_fn,
    params,
    mask,
    key,
    steps: int,
    lr=0.01,
    b1=0.9,
    b2=0.999,
    eps=1e-7,
    messages: int = 0,
    label: str = "ELBO",
    metrics_fn=None,
    data=None,
    checkpoint_every: int = 0,
    checkpoint_fn=None,
):
    """Run ``steps`` Adam iterations.

    Returns (params, losses [steps]) — or (params, metrics-dict) when
    ``metrics_fn(params) -> dict`` is given; the dict then carries per-step
    arrays for 'loss', 'grad_norm' and every metrics_fn entry (the structured
    replacement for the reference's print-only logging, dgp.py:153-154).
    Each chunk is one jitted lax.scan — the TPU-native equivalent of the
    eager loop at dgp.py:147-154.

    Two calling conventions:
    * ``data=None`` (legacy): ``loss_fn(params, key) -> scalar``; a fresh
      engine is compiled per call.
    * ``data`` given: ``loss_fn(params, key, data) -> scalar`` with ``data``
      a traced pytree; the compiled engine is cached on
      (loss_fn, mask, hyperparameters) — loss_fn must be a stable object
      (lru_cache'd factory) for the cache to hit.

    :param checkpoint_every: chunk the phase into scans of this many steps;
        after each chunk ``checkpoint_fn(params, steps_done)`` runs on the
        host (optimizer state persists across chunks, so the trajectory is
        identical to the unchunked run). 0 = one uninterrupted scan.
    :param checkpoint_fn: host callback, e.g. a utils.checkpoint.save
        closure; required for checkpointing to do anything, chunking alone
        only bounds the largest single XLA call.
    """
    if steps <= 0:
        empty = jnp.zeros((0,))
        return params, ({"loss": empty} if metrics_fn else empty)

    chunks = _chunk_sizes(steps, checkpoint_every)

    def engine_for(n_steps):
        if data is None:
            opt = masked_adam(mask, lr, b1, b2, eps)
            return opt, _make_adam_engine(opt, loss_fn, n_steps, messages,
                                          label, metrics_fn, with_data=False)
        cache_key = ("adam", loss_fn, _mask_signature(mask), n_steps, lr, b1,
                     b2, eps, messages, label, metrics_fn,
                     _precision_signature())
        entry = _ENGINE_CACHE.get(cache_key)
        if entry is None:
            opt = masked_adam(mask, lr, b1, b2, eps)
            entry = (opt, _make_adam_engine(opt, loss_fn, n_steps, messages,
                                            label, metrics_fn, with_data=True))
            _ENGINE_CACHE[cache_key] = entry
        return entry

    opt0, _ = engine_for(chunks[0])
    opt_state = opt0.init(params)
    traces = []
    done = 0
    for n_steps in chunks:
        _, run = engine_for(n_steps)
        if data is None:
            params, opt_state, key, trace = run(params, opt_state, key)
        else:
            params, opt_state, key, trace = run(params, opt_state, key, data)
        traces.append(trace)
        done += n_steps
        if checkpoint_fn is not None and done < steps:
            checkpoint_fn(params, done)
    return params, _surface_nonfinite(_concat_traces(traces), label)


def nat_adam_run(
    loss_fn,
    params,
    euclid_mask,
    get_qs,
    set_qs,
    key,
    steps: int,
    lr_adam=0.01,
    gamma=0.01,
    b1=0.9,
    b2=0.999,
    eps=1e-7,
    messages: int = 0,
    label: str = "ELBO",
    data=None,
    checkpoint_every: int = 0,
    checkpoint_fn=None,
    guard_loss: bool = False,
):
    """Interleaved Adam + NaturalGradient phase (dgp.py:209-220).

    :param guard_loss: same-key loss guard on each natural-gradient step
        (variational.natgrad.natgrad_step_multi) — used by the MO-DGP
        trainer, whose landscape produces finite-but-catastrophic steps.

    Per iteration: (1) masked-Adam step on the Euclidean parameters from one
    ELBO evaluation; (2) joint natural-gradient step on the variational pairs
    selected by ``get_qs`` from a second, fresh-MC evaluation — matching the
    reference's two evaluations per iteration.

    :param get_qs: params -> list of (q_mu, q_sqrt) receiving natural grads.
    :param set_qs: (params, list) -> params.
    :param data: optional traced batch pytree; when given,
        ``loss_fn(params, key, data)`` and the engine is cached on
        (loss_fn, get_qs, set_qs, mask, hyperparameters) — all three callables
        must be stable objects for the cache to hit.
    :param checkpoint_every: chunk the phase into scans of this many steps
        and run ``checkpoint_fn(params, steps_done)`` between chunks
        (optimizer state persists; the trajectory matches the unchunked run).
    """
    if steps <= 0:
        return params, jnp.zeros((0,))

    def make_engine(opt, n_steps, with_data):
        def body(params, opt_state, key, batch):
            def eval_loss(p, k):
                return loss_fn(p, k, batch) if with_data else loss_fn(p, k)

            def step(carry, i):
                params, opt_state, key = carry
                key, k_adam, k_nat = jax.random.split(key, 3)
                loss, grads = jax.value_and_grad(eval_loss)(params, k_adam)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)

                def nat_loss(qs):
                    return eval_loss(set_qs(params, qs), k_nat)

                new_qs = natgrad_step_multi(get_qs(params), nat_loss, gamma,
                                            guard_loss=guard_loss)
                params = set_qs(params, new_qs)
                if messages:
                    jax.lax.cond(
                        i % messages == 0,
                        lambda: jax.debug.print(label + ": {v}", v=-loss),
                        lambda: None,
                    )
                return (params, opt_state, key), loss

            (params, opt_state, key), losses = jax.lax.scan(
                step, (params, opt_state, key), jnp.arange(n_steps)
            )
            return params, opt_state, key, losses

        if with_data:
            return jax.jit(body)
        return jax.jit(lambda params, opt_state, key: body(params, opt_state,
                                                           key, None))

    chunks = _chunk_sizes(steps, checkpoint_every)

    def engine_for(n_steps):
        if data is None:
            opt = masked_adam(euclid_mask, lr_adam, b1, b2, eps)
            return opt, make_engine(opt, n_steps, with_data=False)
        cache_key = ("nat_adam", loss_fn, get_qs, set_qs,
                     _mask_signature(euclid_mask), n_steps, lr_adam, gamma,
                     b1, b2, eps, messages, label, guard_loss,
                     _precision_signature())
        entry = _ENGINE_CACHE.get(cache_key)
        if entry is None:
            opt = masked_adam(euclid_mask, lr_adam, b1, b2, eps)
            entry = (opt, make_engine(opt, n_steps, with_data=True))
            _ENGINE_CACHE[cache_key] = entry
        return entry

    opt0, _ = engine_for(chunks[0])
    opt_state = opt0.init(params)
    traces = []
    done = 0
    for n_steps in chunks:
        _, run = engine_for(n_steps)
        if data is None:
            params, opt_state, key, losses = run(params, opt_state, key)
        else:
            params, opt_state, key, losses = run(params, opt_state, key, data)
        traces.append(losses)
        done += n_steps
        if checkpoint_fn is not None and done < steps:
            checkpoint_fn(params, done)
    return params, _surface_nonfinite(_concat_traces(traces), label)

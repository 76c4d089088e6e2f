"""Observability helpers.

Structured per-step metrics replace the reference's print-only logging
(/root/reference/dgp_dace/models/dgp.py:153-154) and its debug helper
``summarize_tensor`` (/root/reference/dgp_dace/utils/utils.py:119-139).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def summarize_tensor(x, title: str = "") -> dict:
    """Shape / NaN / moment summary of a tensor. Returns the stats dict and
    prints a human-readable block like the reference helper."""
    x = np.asarray(x)
    stats = {
        "title": title,
        "shape": tuple(x.shape),
        "nans": int(np.isnan(x).sum()),
        "near_zero": int((np.abs(x) < 1e-8).sum()),
        "mean": float(np.nanmean(x)) if x.size else float("nan"),
        "std": float(np.nanstd(x)) if x.size else float("nan"),
        "min": float(np.nanmin(x)) if x.size else float("nan"),
        "max": float(np.nanmax(x)) if x.size else float("nan"),
    }
    bar = "-" * 10
    print(f"{bar}{title}{bar}")
    for k in ("shape", "nans", "near_zero", "mean", "std", "min", "max"):
        print(f"{k}: {stats[k]}")
    print("-" * (20 + len(title)))
    return stats


def _leaf_transform(path_str: str) -> str:
    if path_str.endswith("_raw"):
        return "softplus"
    if path_str.endswith("q_sqrt"):
        return "tril"
    return "identity"


def summary(model_or_params, print_fn=print) -> list:
    """Parameter table for any model wrapper or params pytree — the
    counterpart of the gpflow ``print_summary`` the reference notebooks use
    as an inspection oracle (e.g. the ``Z_left (6, 4)`` row of
    nb_mfdgpem.ipynb cell 12).

    Walks the params pytree and prints one row per parameter leaf: pytree
    path, transform (``softplus`` for ``*_raw`` leaves, ``tril`` for
    ``q_sqrt``), shape, dtype, and the *constrained* value (scalars and
    small vectors verbatim, min..max for larger arrays). Returns the rows as
    dicts; pass ``print_fn=None`` to suppress printing.

    Works on DGP / MultiFidelityDeepGP / MultiFidelityDeepGP_EM /
    MultiObjDeepGP / GPR wrappers (anything with ``.params``) and on bare
    pytrees.
    """
    from ..ops.transforms import positive

    params = getattr(model_or_params, "params", model_or_params)
    rows = []
    for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
        path = jax.tree_util.keystr(kp)
        path = path.replace("['", ".").replace("']", "")
        path = path.lstrip(".")
        transform = _leaf_transform(path)
        value = positive(leaf) if transform == "softplus" else leaf
        value = np.asarray(value)
        if value.size == 1:
            shown = f"{float(value.reshape(())):.5g}"
        elif value.size <= 4:
            shown = "[" + ", ".join(f"{v:.4g}" for v in value.ravel()) + "]"
        else:
            shown = f"[{value.min():.4g} .. {value.max():.4g}]"
        rows.append({
            "name": path.removesuffix("_raw"),
            "transform": transform,
            "shape": tuple(value.shape),
            "dtype": str(value.dtype),
            "value": shown,
            "size": int(value.size),
        })
    if print_fn is not None:
        cols = ("name", "transform", "shape", "dtype", "value")
        cells = [[str(r[c]) for c in cols] for r in rows]
        widths = [max([len(c)] + [len(row[i]) for row in cells])
                  for i, c in enumerate(cols)]
        fmt = "  ".join("{:<%d}" % w for w in widths)
        print_fn(fmt.format(*(c for c in cols)))
        print_fn(fmt.format(*("-" * w for w in widths)))
        for row in cells:
            print_fn(fmt.format(*row))
        total = sum(r["size"] for r in rows)
        print_fn(f"total parameters: {total}")
    return rows


def grad_norms(grads) -> dict:
    """Per-leaf gradient norms keyed by pytree path (jit-friendly values)."""
    out = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(grads):
        out[jax.tree_util.keystr(kp)] = jnp.linalg.norm(jnp.ravel(leaf))
    return out


def training_metrics(loss, grads=None) -> dict:
    m = {"elbo": -loss}
    if grads is not None:
        flat = jnp.concatenate(
            [jnp.ravel(g) for g in jax.tree_util.tree_leaves(grads)]
        )
        m["grad_norm"] = jnp.linalg.norm(flat)
    return m

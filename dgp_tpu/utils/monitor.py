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

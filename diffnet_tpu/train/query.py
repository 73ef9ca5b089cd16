"""Inference / statistical (UQ) query tooling.

Reference: examples/poisson/parametric/query.py:102-207 (batched inference
over Sobol KL coefficient samples -> mean/stddev fields, point histograms,
npy dumps keyed by the versioned run dir) and calc_mean_sdev.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import NumpyLoader

__all__ = ["query_batched", "query_statistical", "calc_mean_stddev",
           "point_histograms",
           "save_query_results"]


def query_batched(module, params, dataset, batch_size=64, apply_bcs=True):
    """Run network inference over the whole dataset; returns all solution
    fields stacked [N, ...] (reference query_statistical loop,
    query.py:126-158)."""
    loader = NumpyLoader(dataset, batch_size=batch_size, shuffle=False,
                         drop_last=False)
    fwd = jax.jit(lambda p, batch: module.forward(p, batch)[0:2])
    outs = []
    for batch in loader:
        batch = jax.tree.map(jnp.asarray, batch)
        u, inputs = fwd(params, batch)
        if apply_bcs:
            u = module.apply_bcs(u, inputs)
        if isinstance(u, tuple):
            u = u[0]
        u = np.asarray(u)
        if u.ndim >= 4 and u.shape[-1] == 1:
            u = u[..., 0]
        outs.append(u)
    return np.concatenate(outs, axis=0)


def calc_mean_stddev(all_u):
    """(mean, sdev) over the sample axis (reference query.py:160-165)."""
    return all_u.mean(axis=0), all_u.std(axis=0)


def point_histograms(all_u, points_ij):
    """Per-point value samples for histogramming: points_ij is a list of
    (row, col) indices (reference accumulates per-point histograms,
    query.py:152-158)."""
    return {tuple(p): all_u[(slice(None),) + tuple(p)] for p in points_ij}


def query_statistical(module, params, dataset, batch_size=64,
                      out_dir=None, prefix="q", apply_bcs=True):
    """End-to-end UQ query: inference sweep -> mean/sdev (-> npy files when
    out_dir given, named like the reference's q_mean/q_sdev).
    ``apply_bcs=False`` gives statistics of the RAW network output (e.g.
    to inspect BC violation)."""
    all_u = query_batched(module, params, dataset, batch_size,
                          apply_bcs=apply_bcs)
    mean, sdev = calc_mean_stddev(all_u)
    if out_dir is not None:
        save_query_results(out_dir, mean, sdev, prefix)
    return mean, sdev, all_u


def save_query_results(out_dir, mean, sdev, prefix="q"):
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, f"{prefix}_mean.npy"), mean)
    np.save(os.path.join(out_dir, f"{prefix}_sdev.npy"), sdev)

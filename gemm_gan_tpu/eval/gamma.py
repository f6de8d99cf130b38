"""Gamma correlation score (Viñas et al.) — the primary quality metric.

Formula parity with /root/reference/src/corr_score.py:20-120: gene-gene
Pearson-correlation distance matrices of real and generated expression, then
the Pearson correlation between their condensed upper-triangular lists. The
zero-variance guard (standardized value falls back to the centered value,
corr_score.py:59) is reproduced exactly.

Two paths:
  * numpy reference (`*_np`) — golden source for tests;
  * blocked on-device path (`gamma_coef`) — gene-gene correlation is one
    standardized GEMM on the MXU; the gamma statistic is computed from masked
    moments over the correlation matrices WITHOUT materializing condensed
    lists, streamed over row-blocks so the 18.9k² matrices never exceed a
    block of HBM.

Also includes the dendrogram/cophenetic and TF-TG variants
(corr_score.py:122-290) on the scipy host path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- numpy path
def _standardize_np(a):
    mean = np.mean(a, axis=0)
    std = np.std(a, axis=0)
    s = (a - mean) / std
    nanmask = np.isnan(s)
    s[nanmask] = (a - mean)[nanmask]
    return s


def pearson_correlation(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Gene-gene correlation matrix between columns of x and y. Shape (Gx, Gy)."""
    assert x.shape[0] == y.shape[0]
    return np.dot(_standardize_np(x).T, _standardize_np(y)) / x.shape[0]


def upper_diag_list(m: np.ndarray) -> np.ndarray:
    """Condensed strict upper-triangle of a square matrix, row-major."""
    iu = np.triu_indices(m.shape[0], k=1)
    return np.asarray(m)[iu]


def correlations_list(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return upper_diag_list(pearson_correlation(x, y))


def gamma_coef_np(x: np.ndarray, y: np.ndarray) -> float:
    """Pure-numpy gamma (golden reference for tests)."""
    dists_x = 1 - correlations_list(x, x)
    dists_y = 1 - correlations_list(y, y)
    return float(pearson_correlation(dists_x[:, None], dists_y[:, None])[0, 0])


def gamma_coeff_score(x_test: np.ndarray, x_gen: np.ndarray) -> float:
    return gamma_coef(x_test, x_gen)


# ----------------------------------------------------------------- jax path
def _standardize_cols(a):
    mean = jnp.mean(a, axis=0)
    std = jnp.std(a, axis=0)
    centered = a - mean
    return jnp.where(std > 0, centered / jnp.where(std > 0, std, 1.0), centered)


@functools.partial(jax.jit, static_argnames=("block",))
def _gamma_moments(x, y, block: int):
    """Masked first/second/cross moments of the two correlation-distance
    matrices over the strict upper triangle, streamed over row blocks."""
    # x and y may have DIFFERENT sample counts (reference gamma_coef
    # signature: nb_samples_1 vs nb_samples_2); each matrix's gene-gene
    # correlations are computed over its own samples
    n_x = x.shape[0]
    n_y = y.shape[0]
    g = x.shape[1]
    xs = _standardize_cols(x)  # [n_x, g]
    ys = _standardize_cols(y)  # [n_y, g]

    nblocks = -(-g // block)
    gp = nblocks * block
    pad = gp - g
    xs_p = jnp.pad(xs, ((0, 0), (0, pad)))
    ys_p = jnp.pad(ys, ((0, 0), (0, pad)))

    def body(carry, i):
        s = i * block
        xb = jax.lax.dynamic_slice(xs_p, (0, s), (n_x, block))  # rows block
        yb = jax.lax.dynamic_slice(ys_p, (0, s), (n_y, block))
        cx = jnp.dot(xb.T, xs_p, preferred_element_type=jnp.float32) / n_x  # [block, gp]
        cy = jnp.dot(yb.T, ys_p, preferred_element_type=jnp.float32) / n_y
        dx = 1.0 - cx
        dy = 1.0 - cy
        rows = s + jax.lax.broadcasted_iota(jnp.int32, (block, gp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block, gp), 1)
        mask = (cols > rows) & (cols < g) & (rows < g)
        mf = mask.astype(jnp.float32)
        stats = jnp.stack([
            jnp.sum(mf),
            jnp.sum(dx * mf), jnp.sum(dy * mf),
            jnp.sum(dx * dx * mf), jnp.sum(dy * dy * mf),
            jnp.sum(dx * dy * mf),
        ])
        return carry + stats, None

    init = jnp.zeros((6,), jnp.float32)
    out, _ = jax.lax.scan(body, init, jnp.arange(nblocks))
    return out


def gamma_coef(x, y, block: int = 1024) -> float:
    """Gamma between expression matrices x (real) and y (generated)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    g = x.shape[1]
    block = min(block, g)
    cnt, sx, sy, sxx, syy, sxy = (float(v) for v in _gamma_moments(x, y, block))
    mx, my = sx / cnt, sy / cnt
    vx = sxx / cnt - mx * mx
    vy = syy / cnt - my * my
    cov = sxy / cnt - mx * my
    denom = np.sqrt(max(vx, 0.0)) * np.sqrt(max(vy, 0.0))
    if denom == 0:
        return float(cov)  # matches reference fallback: centered (not scaled)
    return float(cov / denom)


# ----------------------------------------------- dendrogram/cophenetic extras
def hierarchical_clustering(data: np.ndarray):
    """Complete-linkage clustering of genes on correlation distance
    (parity: corr_score.py:122-139)."""
    from scipy.cluster.hierarchy import linkage

    y = 1 - correlations_list(data, data)
    return linkage(y, "complete")


def gamma_coefficients(expr_x: np.ndarray, expr_z: np.ndarray):
    """(gamma_dx_dz, gamma_dx_tx, gamma_dz_tz, gamma_tx_tz) incl. cophenetic
    tree distances (parity: corr_score.py:141-236)."""
    from scipy.cluster.hierarchy import cophenet

    dists_x = 1 - correlations_list(expr_x, expr_x)
    dists_z = 1 - correlations_list(expr_z, expr_z)
    gamma_dx_dz = pearson_correlation(dists_x[:, None], dists_z[:, None])[0, 0]
    lx = hierarchical_clustering(expr_x)
    lz = hierarchical_clustering(expr_z)
    # scipy cophenet(Z, Y) returns (cophenetic corr coefficient, coph dists)
    c_x, coph_x = cophenet(lx, dists_x)
    c_z, coph_z = cophenet(lz, dists_z)
    gamma_tx_tz = pearson_correlation(coph_x[:, None], coph_z[:, None])[0, 0]
    return float(gamma_dx_dz), float(c_x), float(c_z), float(gamma_tx_tz)


def tf_tg_corrs(expr: np.ndarray, gene_names, tf_tg: dict):
    """Per-TF correlations with its target genes (compact dict form)."""
    idx = {g: i for i, g in enumerate(gene_names)}
    out = {}
    for tf, tgs in tf_tg.items():
        if tf not in idx:
            continue
        tg_idx = [idx[t] for t in tgs if t in idx]
        if not tg_idx:
            continue
        corr = pearson_correlation(expr[:, [idx[tf]]], expr[:, tg_idx])
        out[tf] = corr.ravel()
    return out


def load_tf_tg_graph(path: str) -> dict:
    """TF→target-genes dict from a TSV graph file of `tf \\t _ \\t tg` lines
    (parity: corr_score.py:238-253 `tf_tg_interactions`)."""
    tf_tg = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            tf, _, tg = line.split("\t")
            tf_tg.setdefault(tf, []).append(tg)
    return tf_tg


def compute_tf_tg_corrs(expr: np.ndarray, gene_symbols, tf_tg: dict,
                        flat: bool = True):
    """(TF-TG correlations, TG-TG correlations) per TF, optionally flattened
    (parity: corr_score.py:255-290 — for each TF present in the expression
    matrix with at least one present target: the condensed TG-TG correlation
    list of its targets, and the TF-vs-each-TG correlation list)."""
    gene_symbols = np.asarray(gene_symbols)
    tf_tg_corr, tg_tg_corr = [], []
    for tf, tgs in tf_tg.items():
        tg_idxs = np.array([np.where(gene_symbols == tg)[0]
                            for tg in tgs if tg in gene_symbols]).ravel()
        if tf in gene_symbols and len(tg_idxs) > 0:
            expr_tgs = expr[:, tg_idxs.astype(int)]
            tg_tg_corr.append(correlations_list(expr_tgs, expr_tgs).tolist())
            tf_idx = int(np.argwhere(gene_symbols == tf)[0][0])
            corr = pearson_correlation(expr[:, [tf_idx]], expr_tgs).ravel()
            tf_tg_corr.append(corr.tolist())
    if flat:
        tf_tg_corr = [c for lst in tf_tg_corr for c in lst]
        tg_tg_corr = [c for lst in tg_tg_corr for c in lst]
    return tf_tg_corr, tg_tg_corr

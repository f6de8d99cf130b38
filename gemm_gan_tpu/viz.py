"""Visualization: loss curves, 2-D embeddings, real/fake panels, distributions.

Capability parity with /root/reference/src/visualization.py:47-451
(`plot_curves`, `tsne_2d`, `umap_2d`, `plot_umaps`, `plot_tsne_2d`,
distribution/distance-matrix plots). umap-learn is not available in this
environment, so `umap_2d` falls back to the from-scratch UMAP in
`utils/umap_lite.py`; all figure functions accept an `out_path` and use the
Agg backend (headless TPU hosts).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_curves(history: Dict[str, Sequence[float]], out_path: Optional[str] = None,
                title: str = "training curves"):
    """Loss/metric curves (parity: visualization.py:47-58)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 4))
    for name, values in history.items():
        ax.plot(values, label=name)
    ax.set_xlabel("epoch")
    ax.legend()
    ax.set_title(title)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


def tsne_2d(data: np.ndarray, perplexity: float = 30.0, seed: int = 42) -> np.ndarray:
    """t-SNE embedding (parity: visualization.py:60-69)."""
    from sklearn.manifold import TSNE

    n = data.shape[0]
    perplexity = min(perplexity, max(2.0, (n - 1) / 3.0))
    return TSNE(n_components=2, perplexity=perplexity, random_state=seed,
                init="pca").fit_transform(np.asarray(data, np.float32))


def umap_2d(data: np.ndarray, n_neighbors: int = 15, seed: int = 42) -> np.ndarray:
    """UMAP embedding (parity: visualization.py:71-80). Uses umap-learn when
    present; otherwise the from-scratch implementation of the same algorithm
    in `utils/umap_lite.py` (fuzzy kNN graph -> spectral init ->
    negative-sampling layout) — a real UMAP picture, not the round-1 t-SNE
    stand-in."""
    try:
        import umap  # type: ignore

        return umap.UMAP(n_components=2, n_neighbors=n_neighbors,
                         random_state=seed).fit_transform(data)
    except ImportError:
        from gemm_gan_tpu.utils.umap_lite import umap_embed

        return umap_embed(np.asarray(data, np.float64), n_components=2,
                          n_neighbors=n_neighbors, seed=seed)


def plot_embedding_panels(real: np.ndarray, fake: np.ndarray,
                          labels: Optional[np.ndarray] = None,
                          method: str = "umap", out_path: Optional[str] = None,
                          label_names: Optional[Sequence[str]] = None):
    """Combined real/fake panel + tissue-colored panel
    (parity: plot_umaps, visualization.py:144-225)."""
    plt = _plt()
    embed = umap_2d if method == "umap" else tsne_2d
    both = embed(np.concatenate([real, fake], axis=0))
    er, ef = both[: len(real)], both[len(real):]

    ncols = 2 if labels is not None else 1
    fig, axes = plt.subplots(1, ncols, figsize=(6 * ncols, 5), squeeze=False)
    ax = axes[0, 0]
    ax.scatter(er[:, 0], er[:, 1], s=6, alpha=0.6, label="real")
    ax.scatter(ef[:, 0], ef[:, 1], s=6, alpha=0.6, label="generated")
    ax.legend()
    ax.set_title(f"{method}: real vs generated")
    if labels is not None:
        ax = axes[0, 1]
        labels = np.asarray(labels)
        for lab in np.unique(labels):
            pts = er[labels[: len(er)] == lab] if len(labels) >= len(er) else er
            name = (label_names[int(lab)] if label_names is not None else str(lab))
            ax.scatter(pts[:, 0], pts[:, 1], s=6, alpha=0.6, label=name)
        if len(np.unique(labels)) <= 12:
            ax.legend(fontsize=6)
        ax.set_title("real, colored by tissue")
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


def plot_gene_distributions(real: np.ndarray, fake: np.ndarray,
                            gene_idx: Sequence[int],
                            out_path: Optional[str] = None):
    """Per-gene histogram comparison (parity: visualization.py:341-400)."""
    plt = _plt()
    k = len(gene_idx)
    fig, axes = plt.subplots(1, k, figsize=(3 * k, 3), squeeze=False)
    for ax, g in zip(axes[0], gene_idx):
        ax.hist(real[:, g], bins=30, alpha=0.5, density=True, label="real")
        ax.hist(fake[:, g], bins=30, alpha=0.5, density=True, label="gen")
        ax.set_title(f"gene {g}", fontsize=8)
    axes[0, 0].legend(fontsize=6)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


def plot_distance_matrix(real: np.ndarray, fake: np.ndarray,
                         out_path: Optional[str] = None):
    """Sample-sample distance matrix heat panel (parity: visualization.py:402-451)."""
    plt = _plt()
    both = np.concatenate([real, fake], axis=0)
    d = np.sqrt(((both[:, None] - both[None, :]) ** 2).sum(-1))
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(d, cmap="magma")
    fig.colorbar(im, ax=ax)
    ax.axhline(len(real) - 0.5, color="w", lw=0.5)
    ax.axvline(len(real) - 0.5, color="w", lw=0.5)
    ax.set_title("pairwise distances [real | generated]")
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


def scatter_2d(data_2d: np.ndarray, labels: Sequence,
               out_path: Optional[str] = None, title: str = ""):
    """Label-colored 2-D embedding scatter (parity: visualization.py:85-142
    `plot_tsne_2d`/`scatter_2d`): one color per label value, legend outside."""
    plt = _plt()
    labels = np.asarray(labels)
    fig, ax = plt.subplots(figsize=(6, 5))
    for lab in np.unique(labels):
        m = labels == lab
        ax.scatter(data_2d[m, 0], data_2d[m, 1], s=8, alpha=0.7, label=str(lab))
    ax.legend(fontsize=6, bbox_to_anchor=(1.02, 1), loc="upper left")
    if title:
        ax.set_title(title)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


def plot_distance_matrices(real: np.ndarray, fake: np.ndarray,
                           out_path: Optional[str] = None):
    """Side-by-side gene-gene correlation-distance matrices real vs generated
    plus their difference (parity: visualization.py:412-451
    `plot_distance_matrices` with the pearson corr_fn)."""
    plt = _plt()

    def corr_dist(a):
        s = (a - a.mean(0)) / (a.std(0) + 1e-8)
        return 1.0 - (s.T @ s) / a.shape[0]

    dr, df = corr_dist(real), corr_dist(fake)
    lo = min(dr.min(), df.min())
    hi = max(dr.max(), df.max())
    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    for ax, (m, t) in zip(axes, ((dr, "real"), (df, "generated"),
                                 (np.abs(dr - df), "|difference|"))):
        im = ax.imshow(m, cmap="magma",
                       vmin=lo if t != "|difference|" else None,
                       vmax=hi if t != "|difference|" else None)
        ax.set_title(t)
        fig.colorbar(im, ax=ax, fraction=0.046)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


def plot_learned_graph(adj: np.ndarray, out_dir: str, epoch: int):
    """Save a learned gene-graph adjacency as npy + inferno heatmap png
    (parity: visualization.py:291-299 `plot_graph` — the reference pulls
    `model.adj` itself; here the caller passes the matrix).

    Writes `learned_graph{epoch}.npy` and `learned_graph{epoch}.png` into
    `out_dir`; returns the png path.
    """
    import os

    adj = np.asarray(adj)
    np.save(os.path.join(out_dir, f"learned_graph{epoch}.npy"), adj)
    plt = _plt()
    fig = plt.figure(figsize=(4, 4))
    im = plt.imshow(adj, cmap="inferno", interpolation="nearest",
                    vmin=0, vmax=1.0)
    plt.colorbar(im, fraction=0.046, pad=0.04)
    plt.title("Learned graph")
    plt.axis("off")
    png = os.path.join(out_dir, f"learned_graph{epoch}.png")
    fig.savefig(png, bbox_inches="tight")
    plt.close(fig)
    return png

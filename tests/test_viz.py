"""Visualization surface (parity: /root/reference/src/visualization.py):
every plotting entry point renders to a non-trivial file on synthetic data."""

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from gemm_gan_tpu import viz


@pytest.fixture
def rf(rng):
    return rng.randn(40, 12).astype(np.float32), \
        rng.randn(40, 12).astype(np.float32)


def _saved(path):
    import os

    return os.path.exists(path) and os.path.getsize(path) > 1000


def test_plot_curves(tmp_path):
    p = viz.plot_curves({"d_loss": [1.0, 0.5, 0.2], "g_loss": [0.1, 0.2, 0.3]},
                        str(tmp_path / "c.png"))
    assert _saved(p)


def test_tsne_and_scatter(rng, rf, tmp_path):
    real, _ = rf
    emb = viz.tsne_2d(real, perplexity=5.0)
    assert emb.shape == (40, 2)
    p = viz.scatter_2d(emb, np.array(["a", "b"] * 20), str(tmp_path / "s.png"))
    assert _saved(p)


def test_embedding_panels(rf, tmp_path):
    real, fake = rf
    p = viz.plot_embedding_panels(real, fake, labels=np.array([0, 1] * 20),
                                  out_path=str(tmp_path / "p.png"))
    assert _saved(p)


def test_gene_distributions(rf, tmp_path):
    real, fake = rf
    p = viz.plot_gene_distributions(real, fake, [0, 3, 7],
                                    str(tmp_path / "g.png"))
    assert _saved(p)


def test_distance_matrix_and_matrices(rf, tmp_path):
    real, fake = rf
    assert _saved(viz.plot_distance_matrix(real, fake, str(tmp_path / "d.png")))
    assert _saved(viz.plot_distance_matrices(real, fake, str(tmp_path / "m.png")))


def test_plot_learned_graph(rng, tmp_path):
    from gemm_gan_tpu.viz import plot_learned_graph

    adj = rng.rand(12, 12).astype(np.float32)
    png = plot_learned_graph(adj, str(tmp_path), epoch=7)
    assert (tmp_path / "learned_graph7.npy").exists()
    assert (tmp_path / "learned_graph7.png").exists()
    np.testing.assert_array_equal(
        np.load(tmp_path / "learned_graph7.npy"), adj)
    assert png.endswith("learned_graph7.png")


# ------------------------------------------------------------ umap_lite
def test_umap_lite_separates_clusters_and_is_deterministic():
    """The from-scratch UMAP (utils/umap_lite.py) must actually lay out
    structure: 3 well-separated 50-d gaussian clusters stay separated in the
    2-d embedding (nearest-centroid accuracy ~1), and a fixed seed is
    bitwise reproducible. Reference capability: visualization.py:71-80
    (umap-learn, absent from this image)."""
    from gemm_gan_tpu.utils.umap_lite import umap_embed

    rng = np.random.RandomState(0)
    centers = rng.randn(3, 50) * 6
    labels = np.repeat(np.arange(3), 60)
    X = centers[labels] + rng.randn(180, 50)
    emb = umap_embed(X, n_epochs=200, seed=42)
    assert emb.shape == (180, 2) and np.isfinite(emb).all()
    cents = np.stack([emb[labels == i].mean(0) for i in range(3)])
    pred = np.argmin(((emb[:, None, :] - cents[None]) ** 2).sum(-1), axis=1)
    assert (pred == labels).mean() >= 0.95
    emb2 = umap_embed(X, n_epochs=200, seed=42)
    np.testing.assert_array_equal(emb, emb2)


def test_umap_lite_fuzzy_graph_properties():
    """Calibration invariants of the fuzzy simplicial set: smoothed kNN
    weights sum to ~log2(k) per row pre-symmetrization, and the symmetrized
    graph is symmetric with weights in (0, 1]."""
    from scipy.sparse import coo_matrix

    from gemm_gan_tpu.utils.umap_lite import (_fuzzy_graph, _knn,
                                              _smooth_knn_weights)

    rng = np.random.RandomState(1)
    X = rng.randn(100, 10)
    k = 12
    _, dst = _knn(X, k)
    _, _, w = _smooth_knn_weights(dst, k)
    np.testing.assert_allclose(w.sum(axis=1), np.log2(k), rtol=0.05)
    h, t, wt, n = _fuzzy_graph(X, k)
    g = coo_matrix((wt, (h, t)), shape=(n, n)).toarray()
    np.testing.assert_allclose(g, g.T, atol=1e-12)
    assert (wt > 0).all() and (wt <= 1.0 + 1e-12).all()


def test_umap_lite_duplicate_rows_stay_finite():
    """Duplicated rows (the shape of mode-collapsed GAN fakes) land on
    identical spectral-init coordinates; the attraction gradient must zero
    out at d2 == 0 (umap-learn's `dist_squared > 0` guard) instead of
    NaN-poisoning the layout via inf * 0."""
    from gemm_gan_tpu.utils.umap_lite import umap_embed

    rng = np.random.RandomState(3)
    X = np.repeat(rng.randn(5, 16), 12, axis=0)  # 60 rows, 5 unique
    emb = umap_embed(X, n_neighbors=8, n_epochs=100, seed=0)
    assert emb.shape == (60, 2)
    assert np.isfinite(emb).all()


def test_umap_2d_uses_lite_fallback():
    from gemm_gan_tpu import viz as v

    X = np.random.RandomState(2).randn(40, 8)
    emb = v.umap_2d(X, n_neighbors=8, seed=3)
    assert emb.shape == (40, 2) and np.isfinite(emb).all()

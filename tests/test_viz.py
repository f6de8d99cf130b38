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

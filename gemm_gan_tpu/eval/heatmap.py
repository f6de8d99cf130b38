"""Gene-gene correlation heatmap comparison.

Capability parity with /root/reference/src/heatmap_corr_eval.py:7-55:
corr matrices of real vs generated expression, their MSE, and a difference
heatmap figure. Correlations are computed on device (one standardized GEMM).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def _corrcoef_cols(x):
    x = jnp.asarray(x, jnp.float32)
    xc = x - jnp.mean(x, axis=0)
    std = jnp.sqrt(jnp.mean(xc * xc, axis=0))
    xs = xc / jnp.where(std > 0, std, 1.0)
    return jnp.dot(xs.T, xs, preferred_element_type=jnp.float32) / x.shape[0]


class CorrelationEvaluator:
    def __init__(self, real: np.ndarray, gen: np.ndarray):
        self.corr_real = np.asarray(_corrcoef_cols(real))
        self.corr_gen = np.asarray(_corrcoef_cols(gen))

    def mse(self) -> float:
        return float(np.mean((self.corr_real - self.corr_gen) ** 2))

    def plot_diff(self, out_path: Optional[str] = None):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        diff = np.abs(self.corr_real - self.corr_gen)
        fig, ax = plt.subplots(figsize=(6, 5))
        im = ax.imshow(diff, cmap="viridis")
        fig.colorbar(im, ax=ax)
        ax.set_title(f"|corr_real - corr_gen|, MSE={self.mse():.4f}")
        if out_path:
            fig.savefig(out_path, dpi=120, bbox_inches="tight")
            plt.close(fig)
            return out_path
        return fig

from gemm_gan_tpu.eval.gamma import gamma_coef, gamma_coeff_score, pearson_correlation, upper_diag_list  # noqa: F401
from gemm_gan_tpu.eval.prdc import compute_prdc  # noqa: F401
from gemm_gan_tpu.eval.distances import (  # noqa: F401
    compute_distribution_distances,
    linear_mmd2,
    mix_rbf_mmd2,
    poly_mmd2,
    wasserstein,
)
from gemm_gan_tpu.eval.knn_pr import get_precision_recall, knn_precision_recall_features  # noqa: F401
from gemm_gan_tpu.eval.privacy import dcr, nndr  # noqa: F401
from gemm_gan_tpu.eval.detection import detection, compute_evaluation_metrics  # noqa: F401

"""Post-hoc evaluation CLI over dumped test_* artifact directories.

Covers the reference's standalone evaluator mains
(/root/reference/src/utility_evaluation.py, src/privacy_evaluator.py usage at
conditional_gan_concat.py:1075-1110): utility TRTR/TSTR/TR+TSR (disease +
primary site), DCR/NNDR privacy, gamma + distribution distances per run dir.
"""

from __future__ import annotations

import argparse
import json
import os
from glob import glob


def main(argv=None):
    p = argparse.ArgumentParser(description="gemm_gan_tpu post-hoc evaluator")
    p.add_argument("--results_path", required=True)
    p.add_argument("--train_real", help="npy of train-real expressions (for privacy)")
    p.add_argument("--skip_utility", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import numpy as np

    from gemm_gan_tpu.eval.distances import compute_distribution_distances
    from gemm_gan_tpu.eval.gamma import gamma_coef
    from gemm_gan_tpu.eval.privacy import dcr, nndr
    from gemm_gan_tpu.eval.utility import UtilityEvaluator, UtilityEvaluatorPrimary

    out = {}
    if not args.skip_utility:
        ev = UtilityEvaluator(args.results_path)
        if ev.results_dirs:
            ev.evaluate()
            out["utility_disease"] = ev.report()
        evp = UtilityEvaluatorPrimary(args.results_path)
        try:
            if evp.results_dirs:
                evp.evaluate()
                out["utility_primary_site"] = evp.report()
        except FileNotFoundError:
            pass

    per_run = []
    for d in sorted(glob(os.path.join(args.results_path, "test_*"))):
        test_real = np.load(os.path.join(d, "test_real.npy"))
        test_gen = np.load(os.path.join(d, "test_gen.npy"))
        rec = {"dir": os.path.basename(d),
               "gamma": float(gamma_coef(test_real, test_gen))}
        rec.update(compute_distribution_distances(test_gen, test_real))
        if args.train_real:
            train_real = np.load(args.train_real)
            gen = np.load(os.path.join(d, "data_gen.npy"))
            rec["dcr"] = dcr(train_real, gen, test_real)
            rec["nndr"] = nndr(train_real, gen, test_real)
        per_run.append(rec)
    out["per_run"] = per_run

    text = json.dumps(out, indent=2, default=float)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)
    return out


if __name__ == "__main__":
    main()

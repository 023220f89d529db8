"""FID scoring CLI: generated ``output.npz`` vs a reference batch or stats.

Completes the ADM-suite workflow in-framework (reference README.md:102 points
users at the external OpenAI evaluator; ``SaveImagesHook`` already writes the
evaluator's ``arr_0`` npz layout — src/callbacks/save_images.py:61-66):

    python -m deco_tpu.eval_fid samples.npz reference.npz [--stats-out s.npz]

The reference side may be (a) an image batch npz (``arr_0`` uint8 NHWC, the
ADM "reference batch" format), or (b) a precomputed statistics npz with
``mu``/``sigma`` keys (pytorch-fid convention) — computed once from the real
dataset with ``--stats-out``, then reused for every eval, which is how the
50k-sample protocol is run in practice.

Inception weights: pass ``--inception path`` (converted torch weights via
models/inception); without them the tower is randomly initialized and the
score is self-consistent-only (warned).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _load_images(path: str) -> np.ndarray:
    with np.load(path) as z:
        key = "arr_0" if "arr_0" in z else list(z.keys())[0]
        return z[key]


def _stats_from_images(images: np.ndarray, inception_variables, batch_size):
    from deco_tpu.models.inception import compute_fid_features
    from deco_tpu.train.metrics import FIDStats

    arr = np.asarray(images, np.float32)
    if arr.max() > 1.5:
        arr = arr / 255.0
    feats = compute_fid_features(arr, inception_variables, batch_size)
    s = FIDStats(feats.shape[1])
    s.update(feats)
    return s.finalize()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("samples", help="generated output.npz (arr_0 NHWC uint8)")
    ap.add_argument("reference",
                    help="reference npz: arr_0 image batch OR mu/sigma stats")
    ap.add_argument("--inception", default=None,
                    help="converted InceptionV3 weights (msgpack/orbax dir)")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--stats-out", default=None,
                    help="also write the SAMPLES side's mu/sigma to this npz "
                         "(use once on the real dataset to make a reusable "
                         "reference-stats file)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from deco_tpu.models.inception import InceptionV3Features
    from deco_tpu.train.metrics import frechet_distance

    if args.inception:
        from deco_tpu.models.inception import load_inception_variables

        variables = load_inception_variables(args.inception)
    else:
        import warnings

        warnings.warn(
            "FID with a randomly initialized Inception tower — values are "
            "self-consistent but not comparable to published FIDs."
        )
        model = InceptionV3Features()
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))

    mu_s, cov_s = _stats_from_images(
        _load_images(args.samples), variables, args.batch_size)
    if args.stats_out:
        np.savez(args.stats_out, mu=mu_s, sigma=cov_s)

    with np.load(args.reference) as z:
        if "mu" in z and "sigma" in z:
            mu_r, cov_r = z["mu"], z["sigma"]
        else:
            key = "arr_0" if "arr_0" in z else list(z.keys())[0]
            mu_r, cov_r = _stats_from_images(z[key], variables,
                                             args.batch_size)

    fid = frechet_distance(mu_s, cov_s, mu_r, cov_r)
    print(f"FID: {fid:.4f}")
    return fid


if __name__ == "__main__":
    # non-zero exit on a degenerate score (singular covariance etc.) so
    # scripted eval pipelines don't treat a broken run as success
    import numpy as _np

    sys.exit(0 if _np.isfinite(main()) else 1)

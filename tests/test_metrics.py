"""Metrics: PSNR/SSIM sanity, FID statistics and Frechet distance."""

import jax.numpy as jnp
import numpy as np

from deco_tpu.train.metrics import FIDStats, frechet_distance, psnr, ssim


class TestPSNRSSIM:
    def test_psnr_identity_is_high(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3) * 255)
        assert float(psnr(x, x)) > 100

    def test_psnr_known_value(self):
        a = jnp.zeros((1, 8, 8, 1))
        b = jnp.full((1, 8, 8, 1), 10.0)
        # mse=100 -> psnr = 20log10(255) - 10log10(100) = 48.13 - 20
        np.testing.assert_allclose(float(psnr(a, b)), 28.1308, atol=1e-3)

    def test_ssim_identity_is_one(self):
        x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3) * 255)
        np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-5)

    def test_ssim_noise_lower(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(1, 32, 32, 3) * 255)
        y = x + jnp.asarray(rng.randn(1, 32, 32, 3) * 50)
        assert float(ssim(x, y)) < 0.9

    def test_ssim_matches_independent_numpy_oracle(self):
        """Pin the conv-based SSIM against a direct float64 sliding-window
        implementation of the canonical Wang et al. formula with the
        torchmetrics defaults (gaussian 11/1.5, k1=.01, k2=.03, VALID map
        averaged per image) — neither torchmetrics nor skimage exists in this
        image, so the oracle is written out longhand."""
        rng = np.random.RandomState(7)
        x = (rng.rand(2, 18, 20, 3) * 255).astype(np.float64)
        y = np.clip(x + rng.randn(2, 18, 20, 3) * 25, 0, 255)

        k = 11
        g1 = np.exp(-((np.arange(k) - k // 2) ** 2) / (2 * 1.5 ** 2))
        w = np.outer(g1, g1)
        w /= w.sum()
        c1, c2 = (0.01 * 255.0) ** 2, (0.03 * 255.0) ** 2

        def win_mean(img):  # (H, W) -> VALID gaussian-window means
            H, W = img.shape
            out = np.empty((H - k + 1, W - k + 1))
            for i in range(out.shape[0]):
                for j in range(out.shape[1]):
                    out[i, j] = np.sum(img[i:i + k, j:j + k] * w)
            return out

        expected = []
        for b in range(x.shape[0]):
            vals = []
            for c in range(x.shape[-1]):
                xp, yp = x[b, :, :, c], y[b, :, :, c]
                mx, my = win_mean(xp), win_mean(yp)
                sx = win_mean(xp * xp) - mx * mx
                sy = win_mean(yp * yp) - my * my
                sxy = win_mean(xp * yp) - mx * my
                m = ((2 * mx * my + c1) * (2 * sxy + c2)
                     / ((mx * mx + my * my + c1) * (sx + sy + c2)))
                vals.append(m.mean())
            expected.append(np.mean(vals))

        got = np.asarray(ssim(jnp.asarray(x, jnp.float32),
                              jnp.asarray(y, jnp.float32), per_image=True))
        np.testing.assert_allclose(got, np.asarray(expected), atol=2e-5)


class TestFID:
    def test_identical_distributions_zero(self):
        rng = np.random.RandomState(0)
        acts = rng.randn(500, 8)
        s1, s2 = FIDStats(8), FIDStats(8)
        s1.update(acts)
        s2.update(acts)
        mu1, c1 = s1.finalize()
        mu2, c2 = s2.finalize()
        assert abs(frechet_distance(mu1, c1, mu2, c2)) < 1e-6

    def test_mean_shift(self):
        rng = np.random.RandomState(1)
        a = rng.randn(2000, 4)
        b = rng.randn(2000, 4) + 2.0
        sa, sb = FIDStats(4), FIDStats(4)
        sa.update(a)
        sb.update(b)
        fid = frechet_distance(*sa.finalize(), *sb.finalize())
        # dominated by ||mu1-mu2||^2 = 4 * 4
        np.testing.assert_allclose(fid, 16.0, atol=1.0)

    def test_streaming_matches_batch(self):
        rng = np.random.RandomState(2)
        acts = rng.randn(300, 6)
        s_all = FIDStats(6)
        s_all.update(acts)
        s_stream = FIDStats(6)
        for chunk in np.split(acts, 3):
            s_stream.update(chunk)
        mu_a, c_a = s_all.finalize()
        mu_s, c_s = s_stream.finalize()
        np.testing.assert_allclose(mu_a, mu_s, atol=1e-12)
        np.testing.assert_allclose(c_a, c_s, atol=1e-10)

    def test_merge(self):
        rng = np.random.RandomState(3)
        acts = rng.randn(200, 4)
        s1, s2 = FIDStats(4), FIDStats(4)
        s1.update(acts[:100])
        s2.update(acts[100:])
        s1.merge(s2)
        ref = FIDStats(4)
        ref.update(acts)
        np.testing.assert_allclose(s1.finalize()[0], ref.finalize()[0], atol=1e-12)


class TestInceptionFID:
    def test_identical_sets_zero(self):
        import warnings

        import jax

        warnings.filterwarnings("ignore")
        from deco_tpu.train.metrics import fid_from_images

        rng = np.random.RandomState(0)
        imgs = rng.rand(8, 32, 32, 3).astype(np.float32)
        fid = fid_from_images(imgs, imgs)
        assert abs(fid) < 1e-3

    def test_different_sets_positive(self):
        import warnings

        warnings.filterwarnings("ignore")
        from deco_tpu.train.metrics import fid_from_images

        rng = np.random.RandomState(1)
        a = rng.rand(8, 32, 32, 3).astype(np.float32)
        b = np.clip(a + 0.5, 0, 1)
        # the untrained fallback tower is weakly discriminative; assert the
        # ordering rather than a magnitude (real use loads converted weights)
        assert fid_from_images(a, b) > 10 * max(fid_from_images(a, a), 1e-9)

    def test_converter_shapes(self):
        """Converter maps a torchvision-layout random state dict exactly."""
        import jax
        import jax.numpy as jnp

        from deco_tpu.models.inception import (
            InceptionV3Features,
            inception_params_from_torch,
        )

        model = InceptionV3Features()
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        # build a fake torch state dict from our own params (layout inverse)
        sd = {}
        flat = jax.tree_util.tree_flatten_with_path(ref["params"])[0]
        for path, leaf in flat:
            keys = [p.key for p in path]
            name = ".".join(keys[:-2])
            if keys[-2] == "conv":
                sd[name + ".conv.weight"] = np.asarray(leaf).transpose(3, 2, 0, 1)
            elif keys[-1] == "scale":
                sd[name + ".bn.weight"] = np.asarray(leaf)
            elif keys[-1] == "bias":
                sd[name + ".bn.bias"] = np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            ref["batch_stats"]
        )[0]:
            keys = [p.key for p in path]
            name = ".".join(keys[:-2])
            stat = "running_mean" if keys[-1] == "mean" else "running_var"
            sd[name + f".bn.{stat}"] = np.asarray(leaf)
        back = inception_params_from_torch(sd)
        for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(ref)[0],
            jax.tree_util.tree_flatten_with_path(back)[0],
        ):
            assert la.shape == lb.shape, (pa, la.shape, lb.shape)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(ref["params"])[0]),
            np.asarray(jax.tree.leaves(back["params"])[0]),
        )


class TestEvalFIDCLI:
    """python -m deco_tpu.eval_fid: output.npz vs image batch OR mu/sigma
    stats (the ADM-suite workflow closed in-framework)."""

    def test_images_and_stats_references_agree(self, tmp_path):
        import warnings

        warnings.filterwarnings("ignore")
        from deco_tpu.eval_fid import main

        rng = np.random.RandomState(0)
        gen = (rng.rand(8, 32, 32, 3) * 255).astype(np.uint8)
        ref = (rng.rand(8, 32, 32, 3) * 255).astype(np.uint8)
        gen_p, ref_p = str(tmp_path / "gen.npz"), str(tmp_path / "ref.npz")
        np.savez(gen_p, arr_0=gen)
        np.savez(ref_p, arr_0=ref)

        # image-batch reference, also emitting the samples side's stats
        stats_p = str(tmp_path / "stats.npz")
        fid_imgs = main([gen_p, ref_p, "--stats-out", stats_p])
        assert np.isfinite(fid_imgs)

        # reuse those stats as a mu/sigma reference for the REF side: score
        # ref vs gen-stats — FID is symmetric, so the two calls must agree
        fid_stats = main([ref_p, stats_p])
        np.testing.assert_allclose(fid_stats, fid_imgs, rtol=1e-4)

        # self-FID via the stats path is ~0
        self_stats = str(tmp_path / "self.npz")
        main([gen_p, gen_p, "--stats-out", self_stats])
        assert abs(main([gen_p, self_stats])) < 1e-3


class TestComputeMetricsHook:
    def test_streaming_and_scores(self):
        import warnings

        warnings.filterwarnings("ignore")
        from deco_tpu.train.hooks import ComputeMetricsHook

        rng = np.random.RandomState(0)
        a = rng.randint(0, 255, (4, 32, 32, 3)).astype(np.uint8)
        hook = ComputeMetricsHook(compute_fid=True)
        hook.on_batch_end(a, a)
        hook.on_batch_end(a, a)
        scores = hook.on_epoch_end()
        assert scores["metrics/psnr"] > 100
        np.testing.assert_allclose(scores["metrics/ssim"], 1.0, atol=1e-5)
        assert abs(scores["metrics/fid"]) < 1e-3
        # state reset for the next epoch
        assert hook._n_images == 0

    def test_psnr_inf_on_perfect_reconstruction(self):
        """torchmetrics PeakSignalNoiseRatio returns +inf for a bit-perfect
        reconstruction (log10(0) → -inf); the stats path must match rather
        than flooring MSE."""
        from deco_tpu.train.metrics import psnr_from_stats

        assert psnr_from_stats(0.0, 1024.0) == float("inf")
        assert np.isfinite(psnr_from_stats(1.0, 1024.0))

    def test_psnr_pools_global_sse_like_torchmetrics(self):
        """The production protocol (compute_metrics.py:27,
        PeakSignalNoiseRatio(dim=None)) pools ONE epoch-global MSE — a
        mean of per-batch PSNRs is a different (wrong) number whenever the
        per-batch MSE varies. Pin the hook to the global pooling, with
        uneven batch sizes so mean-of-means would also diverge."""
        from deco_tpu.train.hooks import ComputeMetricsHook
        from deco_tpu.train.metrics import psnr

        rng = np.random.RandomState(3)
        origs = [rng.randint(0, 256, (b, 16, 16, 3)).astype(np.uint8)
                 for b in (5, 2)]
        # very different per-batch error scales
        preds = [np.clip(o.astype(np.int32) + rng.randint(-d, d + 1, o.shape),
                         0, 255).astype(np.uint8)
                 for o, d in zip(origs, (2, 60))]
        hook = ComputeMetricsHook(compute_fid=False)
        for p, o in zip(preds, origs):
            hook.on_batch_end(p, o)
        scores = hook.on_epoch_end()

        sse = sum(np.sum((p.astype(np.float64) - o.astype(np.float64)) ** 2)
                  for p, o in zip(preds, origs))
        n = sum(p.size for p in preds)
        expected = 10 * np.log10(255.0 ** 2 / (sse / n))
        np.testing.assert_allclose(scores["metrics/psnr"], expected, rtol=1e-6)

        per_batch_mean = np.mean([float(psnr(jnp.asarray(p, jnp.float32),
                                             jnp.asarray(o, jnp.float32)))
                                  for p, o in zip(preds, origs)])
        assert abs(per_batch_mean - expected) > 0.5  # protocols truly differ

    def test_ssim_weighs_images_not_batches(self):
        """torchmetrics SSIM state is (sum of per-image means, n_images);
        with uneven batches a mean of per-batch means is a different number."""
        from deco_tpu.train.hooks import ComputeMetricsHook
        from deco_tpu.train.metrics import ssim

        rng = np.random.RandomState(4)
        origs = [rng.randint(0, 256, (b, 16, 16, 3)).astype(np.uint8)
                 for b in (4, 1)]
        preds = [np.clip(o.astype(np.int32) + rng.randint(-d, d + 1, o.shape),
                         0, 255).astype(np.uint8)
                 for o, d in zip(origs, (3, 80))]
        hook = ComputeMetricsHook(compute_fid=False)
        for p, o in zip(preds, origs):
            hook.on_batch_end(p, o)
        scores = hook.on_epoch_end()

        per_img = np.concatenate([
            np.asarray(ssim(jnp.asarray(p, jnp.float32),
                            jnp.asarray(o, jnp.float32), per_image=True))
            for p, o in zip(preds, origs)])
        np.testing.assert_allclose(scores["metrics/ssim"], per_img.mean(),
                                   rtol=1e-5)

    def test_no_fid_mode(self):
        from deco_tpu.train.hooks import ComputeMetricsHook

        rng = np.random.RandomState(1)
        a = rng.randint(0, 255, (2, 16, 16, 3)).astype(np.uint8)
        b = 255 - a
        hook = ComputeMetricsHook(compute_fid=False)
        hook.on_batch_end(a, b)
        scores = hook.on_epoch_end()
        assert "metrics/fid" not in scores
        assert scores["metrics/psnr"] < 20

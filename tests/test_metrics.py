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
        assert hook._n_batches == 0

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

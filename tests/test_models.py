"""End-to-end model tests (beyond the reference's coverage, per SURVEY.md §4
"not covered by tests: models end-to-end")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbmc_tpu import ops
from sbmc_tpu.models import KPCN, Multisteps

ops.set_backend("xla")


def _batch(rng, bs=1, spp=4, nf=8, ngf=3, h=32, w=32):
    return {
        "radiance": jnp.array(rng.rand(bs, spp, 3, h, w), jnp.float32),
        "features": jnp.array(rng.rand(bs, spp, nf, h, w), jnp.float32),
        "global_features": jnp.array(rng.rand(bs, ngf, 1, 1), jnp.float32),
    }


def _small_model(**kw):
    args = dict(n_features=8, n_global_features=3, width=16,
                embedding_width=16, ksize=5, nsteps=2)
    args.update(kw)
    return Multisteps(**args)


class TestMultisteps:
    def test_output_shape_and_crop(self, rng):
        m = _small_model()
        b = _batch(rng)
        params = m.init(jax.random.PRNGKey(0), b)
        out = m.apply(params, b)
        o = (5 - 1) // 2
        assert out["radiance"].shape == (1, 3, 32 - 2 * o, 32 - 2 * o)
        assert np.isfinite(np.array(out["radiance"])).all()

    def test_bad_ksize_raises(self, rng):
        b = _batch(rng)
        with pytest.raises(ValueError):
            _small_model(ksize=4).init(jax.random.PRNGKey(0), b)
        with pytest.raises(ValueError):
            _small_model(nsteps=0).init(jax.random.PRNGKey(0), b)

    def test_sample_permutation_invariance(self, rng):
        """The sample reduction is a mean -> permuting samples must leave the
        output unchanged (reference property, sbmc/models.py:179)."""
        m = _small_model()
        b = _batch(rng)
        params = m.init(jax.random.PRNGKey(0), b)
        out = m.apply(params, b)
        perm = [2, 0, 3, 1]
        b2 = dict(b)
        b2["radiance"] = b["radiance"][:, perm]
        b2["features"] = b["features"][:, perm]
        out2 = m.apply(params, b2)
        assert np.allclose(np.array(out["radiance"]),
                           np.array(out2["radiance"]), atol=1e-4)

    def test_masked_spp_matches_exact(self, rng):
        """Padding the sample axis with masked slots must equal the unpadded
        forward exactly (static-shape variable-spp support)."""
        m = _small_model()
        b = _batch(rng, spp=4)
        params = m.init(jax.random.PRNGKey(0), b)
        b3 = {k: (v[:, :3] if v.ndim == 5 else v) for k, v in b.items()}
        out3 = m.apply(params, b3)
        bp = dict(b)
        bp["sample_mask"] = jnp.array([[True, True, True, False]])
        outp = m.apply(params, bp)
        assert np.allclose(np.array(out3["radiance"]),
                           np.array(outp["radiance"]), atol=1e-5)

    def test_pixel_ablation(self, rng):
        m = _small_model(pixel=True)
        b = _batch(rng)
        params = m.init(jax.random.PRNGKey(0), b)
        out = m.apply(params, b)
        assert out["radiance"].shape[0:2] == (1, 3)

    def test_gather_ablation(self, rng):
        m = _small_model(splat=False)
        b = _batch(rng)
        params = m.init(jax.random.PRNGKey(0), b)
        out = m.apply(params, b)
        assert np.isfinite(np.array(out["radiance"])).all()

    def test_constant_radiance_is_preserved(self, rng):
        """Denoising a constant image must return (approximately) the same
        constant: kernels are softmax-normalized so the weighted average of a
        constant is the constant (away from borders, which are cropped)."""
        m = _small_model()
        b = _batch(rng)
        b["radiance"] = jnp.full_like(b["radiance"], 0.7)
        params = m.init(jax.random.PRNGKey(0), b)
        out = m.apply(params, b)
        assert np.allclose(np.array(out["radiance"]), 0.7, atol=1e-3)

    def test_gradients_flow(self, rng):
        m = _small_model()
        b = _batch(rng, h=16, w=16)
        params = m.init(jax.random.PRNGKey(0), b)

        def loss(p):
            return jnp.mean(m.apply(p, b)["radiance"] ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.array(x)).all() for x in leaves)
        # every parameter receives gradient signal somewhere
        nonzero = [float(jnp.abs(x).max()) > 0 for x in leaves]
        assert np.mean(nonzero) > 0.9


class TestKPCN:
    def _batch(self, rng, bs=1, h=52, w=52):
        return {
            "kpcn_diffuse_in": jnp.array(rng.rand(bs, 27, h, w), jnp.float32),
            "kpcn_specular_in": jnp.array(rng.rand(bs, 27, h, w), jnp.float32),
            "kpcn_diffuse_buffer": jnp.array(rng.rand(bs, 3, h, w), jnp.float32),
            "kpcn_specular_buffer": jnp.array(rng.rand(bs, 3, h, w), jnp.float32),
            "kpcn_albedo": jnp.array(rng.rand(bs, 3, h, w), jnp.float32),
        }

    def test_output_shape(self, rng):
        m = KPCN(ksize=5, depth=3, width=8)
        b = self._batch(rng)
        params = m.init(jax.random.PRNGKey(0), b)
        out = m.apply(params, b)
        # 3 valid 5x5 convs shrink by 3*4=12
        assert out["radiance"].shape == (1, 3, 40, 40)
        assert set(out.keys()) == {"radiance", "diffuse", "specular"}

    def test_recombination(self, rng):
        """radiance == albedo * diffuse + exp(specular) - 1."""
        m = KPCN(ksize=5, depth=3, width=8)
        b = self._batch(rng)
        params = m.init(jax.random.PRNGKey(0), b)
        out = m.apply(params, b)
        from sbmc_tpu.utils.image import crop_like
        albedo = crop_like(b["kpcn_albedo"], out["diffuse"])
        expected = albedo * out["diffuse"] + jnp.exp(out["specular"]) - 1
        assert np.allclose(np.array(out["radiance"]), np.array(expected),
                           atol=1e-5)

    def test_gradients_flow(self, rng):
        m = KPCN(ksize=3, depth=2, width=4)
        b = self._batch(rng, h=24, w=24)
        params = m.init(jax.random.PRNGKey(0), b)

        def loss(p):
            return jnp.mean(m.apply(p, b)["radiance"] ** 2)

        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.array(x)).all()
                   for x in jax.tree.leaves(g))


class TestLBF:
    """LBF learned-bilateral baseline (models/lbf.py, [Kalantari2015])."""

    def _model(self, **kw):
        from sbmc_tpu.models import LBF
        args = dict(n_features=8, n_global_features=3, window_r=3,
                    width=8, n_guides=4)
        args.update(kw)
        return LBF(**args)

    def test_output_shape_and_crop(self, rng):
        m = self._model()
        b = _batch(rng)
        params = m.init(jax.random.PRNGKey(0), b)
        out = m.apply(params, b)
        assert out["radiance"].shape == (1, 3, 32 - 6, 32 - 6)
        assert np.isfinite(np.array(out["radiance"])).all()

    def test_too_small_input_raises(self, rng):
        m = self._model(window_r=8)
        b = _batch(rng, h=12, w=12)
        with pytest.raises(ValueError):
            m.init(jax.random.PRNGKey(0), b)

    def test_masked_spp_matches_exact(self, rng):
        """Masked padded samples must not change the statistics or output."""
        m = self._model()
        b = _batch(rng, spp=4)
        params = m.init(jax.random.PRNGKey(0), b)
        b3 = {k: (v[:, :3] if v.ndim == 5 else v) for k, v in b.items()}
        out3 = m.apply(params, b3)
        bp = dict(b)
        bp["sample_mask"] = jnp.array([[True, True, True, False]])
        outp = m.apply(params, bp)
        assert np.allclose(np.array(out3["radiance"]),
                           np.array(outp["radiance"]), atol=1e-5)

    def test_constant_radiance_is_preserved(self, rng):
        """The filter is a convex combination of neighbor means: a constant
        radiance field must pass through unchanged."""
        m = self._model()
        b = _batch(rng)
        b["radiance"] = jnp.full_like(b["radiance"], 0.375)
        params = m.init(jax.random.PRNGKey(0), b)
        out = m.apply(params, b)
        assert np.allclose(np.array(out["radiance"]), 0.375, atol=1e-5)

    def test_gradients_flow(self, rng):
        m = self._model()
        b = _batch(rng, h=16, w=16)
        params = m.init(jax.random.PRNGKey(0), b)

        def loss(p):
            return jnp.mean(m.apply(p, b)["radiance"] ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.array(x)).all() for x in leaves)
        # the parameter net must receive gradient through the filter
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        pn = [np.abs(np.array(v)).sum() for k, v in flat
              if "param_net" in jax.tree_util.keystr(k)]
        assert pn and sum(pn) > 0

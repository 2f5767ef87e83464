"""Tests for ConvChain / Autoencoder (ports the construction-invariant tests
of reference tests/test_modules.py:17-60) and the kernel-apply operators
(reference: tests/test_modules.py:63-140)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbmc_tpu import ops
from sbmc_tpu.nn import (
    Autoencoder,
    ConvChain,
    kernel_apply,
    progressive_init,
    progressive_kernel_apply,
)

ops.set_backend("xla")


def _init_and_run(module, x, seed=0):
    params = module.init(jax.random.PRNGKey(seed), x)
    return params, module.apply(params, x)


class TestConvChain:
    def test_shapes_same_padding(self):
        x = jnp.zeros((2, 16, 16, 7))
        m = ConvChain(noutputs=5, depth=3, width=8, ksize=3, pad=True)
        params, y = _init_and_run(m, x)
        assert y.shape == (2, 16, 16, 5)
        # depth-1 intermediate layers + prediction layer
        names = set(params["params"].keys())
        assert names == {"layer_0", "layer_1", "prediction"}

    def test_shapes_valid_padding(self):
        x = jnp.zeros((1, 20, 20, 3))
        m = ConvChain(noutputs=4, depth=4, width=8, ksize=5, pad=False)
        _, y = _init_and_run(m, x)
        assert y.shape == (1, 20 - 4 * 4, 20 - 4 * 4, 4)

    def test_depth_one_uses_input_channels(self):
        x = jnp.zeros((1, 8, 8, 3))
        m = ConvChain(noutputs=2, depth=1, width=64, ksize=1)
        params, y = _init_and_run(m, x)
        assert y.shape == (1, 8, 8, 2)
        assert set(params["params"].keys()) == {"prediction"}

    def test_bad_depth_raises(self):
        with pytest.raises(ValueError):
            _init_and_run(ConvChain(noutputs=1, depth=0),
                          jnp.zeros((1, 4, 4, 1)))

    def test_bad_activation_raises(self):
        with pytest.raises(ValueError):
            _init_and_run(ConvChain(noutputs=1, activation="nope"),
                          jnp.zeros((1, 4, 4, 1)))

    def test_bad_output_type_raises(self):
        with pytest.raises(ValueError):
            _init_and_run(ConvChain(noutputs=1, output_type="nope"),
                          jnp.zeros((1, 4, 4, 1)))

    def test_weight_norm_matches_plain_conv_at_init(self):
        """g is initialized to ||v||, so at init the weight-normed conv must
        equal the plain conv with the same v."""
        x = jnp.array(np.random.RandomState(0).rand(1, 8, 8, 3), jnp.float32)
        m_wn = ConvChain(noutputs=4, depth=1, ksize=3, weight_norm=True)
        m_pl = ConvChain(noutputs=4, depth=1, ksize=3, weight_norm=False)
        p_wn, y_wn = _init_and_run(m_wn, x)
        p_pl = {"params": {"prediction": {
            "v": p_wn["params"]["prediction"]["v"],
            "bias": p_wn["params"]["prediction"]["bias"]}}}
        y_pl = m_pl.apply(p_pl, x)
        assert np.allclose(np.array(y_wn), np.array(y_pl), atol=1e-5)

    def test_output_activation_applied(self):
        x = jnp.array(np.random.RandomState(0).randn(1, 8, 8, 3) * 10,
                      jnp.float32)
        m = ConvChain(noutputs=4, depth=2, width=8, output_type="relu")
        _, y = _init_and_run(m, x)
        assert float(jnp.min(y)) >= 0.0


class TestAutoencoder:
    @pytest.mark.parametrize("pooling", ["max", "average", "conv"])
    def test_shapes(self, pooling):
        x = jnp.zeros((1, 32, 32, 6))
        m = Autoencoder(noutputs=5, num_levels=3, width=8,
                        increase_factor=2.0, pooling=pooling)
        _, y = _init_and_run(m, x)
        assert y.shape == (1, 32, 32, 5)

    def test_width_growth_capped(self):
        m = Autoencoder(noutputs=5, num_levels=4, width=8,
                        increase_factor=2.0, max_width=16)
        assert m._width(0) == 8 and m._width(1) == 16 and m._width(3) == 16

    def test_single_level(self):
        x = jnp.zeros((1, 16, 16, 3))
        m = Autoencoder(noutputs=2, num_levels=1, width=8)
        _, y = _init_and_run(m, x)
        assert y.shape == (1, 16, 16, 2)

    def test_non_pow2_input(self):
        x = jnp.zeros((1, 36, 44, 3))
        m = Autoencoder(noutputs=2, num_levels=3, width=8)
        _, y = _init_and_run(m, x)
        assert y.shape == (1, 36, 44, 2)


class TestKernelApply:
    """Impulse semantics of the one-shot and progressive apply
    (reference: tests/test_modules.py:63-140)."""

    def test_gather_impulse(self, rng):
        k, h, w = 3, 8, 8
        data = rng.randn(1, 3, h, w).astype(np.float32)
        kernels = np.full((1, k * k, h, w), -1e9, np.float32)
        kernels[0, 4] = 0.0  # center tap only -> softmax == 1 at center
        out, sum_w = kernel_apply(jnp.array(data), jnp.array(kernels),
                                  softmax=True, splat=False)
        assert np.allclose(np.array(out), data, atol=1e-5)
        assert np.allclose(np.array(sum_w), 1.0, atol=1e-5)

    def test_splat_impulse_moves_data(self, rng):
        k, h, w = 3, 8, 8
        o = (k - 1) // 2
        data = np.zeros((1, 3, h, w), np.float32)
        data[0, :, 4, 4] = 1.0
        # Sample at (4,4) splats its value to the tap-(dy=2, dx=1) offset.
        dst = (4 + 2 - o, 4 + 1 - o)
        kernels = np.zeros((1, k * k, h, w), np.float32)
        kernels[0, 2 * k + 1, 4, 4] = 1.0
        out, _ = kernel_apply(jnp.array(data), jnp.array(kernels),
                              softmax=False, splat=True)
        out = np.array(out)
        assert np.isclose(out[0, 0, dst[0], dst[1]], 1.0)
        out[0, :, dst[0], dst[1]] = 0
        assert np.abs(out).max() == 0.0

    def test_progressive_matches_oneshot_softmax(self, rng):
        """Accumulating all samples progressively must equal a joint softmax
        over (samples x taps) followed by a weighted sum."""
        k, h, w, spp = 3, 8, 8, 4
        data = rng.randn(spp, 1, 3, h, w).astype(np.float32)
        kernels = rng.randn(spp, 1, k * k, h, w).astype(np.float32)

        state = progressive_init(1, 3, h, w)
        for s in range(spp):
            state = progressive_kernel_apply(
                jnp.array(data[s]), jnp.array(kernels[s]), state, splat=False)
        got = np.array(state.sum_r / state.sum_w)

        # Direct dense computation: softmax over all (s, tap) per pixel.
        from sbmc_tpu.ops.reference import extract_patches
        num = np.zeros((1, 3, h, w), np.float64)
        den = np.zeros((1, 1, h, w), np.float64)
        m = kernels.max(axis=(0, 2), keepdims=True)
        for s in range(spp):
            kexp = np.exp(kernels[s] - m[0])
            patches = np.array(extract_patches(jnp.array(data[s]), k))
            num += np.einsum("nkyx,nckyx->ncyx", kexp, patches)
            den += kexp.sum(1, keepdims=True)
        expected = num / den
        assert np.allclose(got, expected, atol=1e-4)

    def test_progressive_invariant_to_sample_order(self, rng):
        k, h, w, spp = 3, 6, 6, 3
        data = rng.randn(spp, 1, 3, h, w).astype(np.float32)
        kernels = rng.randn(spp, 1, k * k, h, w).astype(np.float32)

        def run(order):
            state = progressive_init(1, 3, h, w)
            for s in order:
                state = progressive_kernel_apply(
                    jnp.array(data[s]), jnp.array(kernels[s]), state)
            return np.array(state.sum_r / state.sum_w)

        assert np.allclose(run([0, 1, 2]), run([2, 0, 1]), atol=1e-4)

    def test_progressive_masked_sample_is_noop(self, rng):
        k, h, w = 3, 6, 6
        data = rng.randn(1, 3, h, w).astype(np.float32)
        kernels = rng.randn(1, k * k, h, w).astype(np.float32)
        state = progressive_init(1, 3, h, w)
        state = progressive_kernel_apply(jnp.array(data), jnp.array(kernels),
                                         state)
        garbage = rng.randn(1, k * k, h, w).astype(np.float32) * 100
        state2 = progressive_kernel_apply(
            jnp.array(data), jnp.array(garbage), state,
            valid=jnp.array([False]))
        for a, b in zip(state, state2):
            assert np.allclose(np.array(a), np.array(b))


class TestFusedProgressive:
    """Fused (single-HBM-pass) progressive splat vs the composed path."""

    def test_forward_exact_match(self, rng):
        k, h, w, spp = 5, 12, 16, 3
        data = rng.randn(spp, 1, 3, h, w).astype(np.float32)
        kernels = rng.randn(spp, 1, k * k, h, w).astype(np.float32)

        def run(fused):
            state = progressive_init(1, 3, h, w)
            for s in range(spp):
                state = progressive_kernel_apply(
                    jnp.array(data[s]), jnp.array(kernels[s]), state,
                    splat=True, fused=fused)
            return state

        a, b = run(True), run(False)
        for x, y in zip(a, b):
            assert np.allclose(np.array(x), np.array(y), atol=1e-5)

    def test_gradients_match_on_normalized_output(self, rng):
        """The fused op stop-grads the softmax shift; gradients of the
        normalized output must still match the composed path (shift
        invariance)."""
        k, h, w, spp = 3, 8, 8, 2
        data = rng.randn(spp, 1, 3, h, w).astype(np.float32)
        kernels = rng.randn(spp, 1, k * k, h, w).astype(np.float32)

        def loss(kn, fused):
            state = progressive_init(1, 3, h, w)
            for s in range(spp):
                state = progressive_kernel_apply(
                    jnp.array(data[s]), kn[s], state, splat=True,
                    fused=fused)
            out = state.sum_r / (state.sum_w + 1e-8)
            return jnp.sum(out * jnp.sin(out))

        kj = jnp.array(kernels)
        g_fused = np.array(jax.grad(lambda kn: loss(kn, True))(kj))
        g_ref = np.array(jax.grad(lambda kn: loss(kn, False))(kj))
        assert np.allclose(g_fused, g_ref, atol=1e-4), \
            np.abs(g_fused - g_ref).max()

    def test_masked_sample_is_noop_fused(self, rng):
        k, h, w = 3, 6, 6
        data = rng.randn(1, 3, h, w).astype(np.float32)
        kernels = rng.randn(1, k * k, h, w).astype(np.float32)
        state = progressive_init(1, 3, h, w)
        state = progressive_kernel_apply(jnp.array(data),
                                         jnp.array(kernels), state,
                                         splat=True, fused=True)
        garbage = rng.randn(1, k * k, h, w).astype(np.float32) * 100
        state2 = progressive_kernel_apply(
            jnp.array(data), jnp.array(garbage), state, splat=True,
            fused=True, valid=jnp.array([False]))
        for a, b in zip(state, state2):
            assert np.allclose(np.array(a), np.array(b))

    def test_fused_bf16_kernel_stream(self, rng):
        """bf16 kernel logits through the fused op stay close to f32."""
        k, h, w = 5, 16, 16
        data = rng.randn(1, 3, h, w).astype(np.float32)
        kern = (rng.randn(1, k * k, h, w) * 0.3).astype(np.float32)
        state = progressive_init(1, 3, h, w)
        a = progressive_kernel_apply(jnp.array(data), jnp.array(kern),
                                     state, splat=True)
        b = progressive_kernel_apply(
            jnp.array(data), jnp.array(kern).astype(jnp.bfloat16),
            state, splat=True)
        out_a = np.array(a.sum_r / (a.sum_w + 1e-8))
        out_b = np.array(b.sum_r / (b.sum_w + 1e-8))
        rel = np.abs(out_a - out_b) / (np.abs(out_a) + 1e-2)
        assert rel.max() < 0.02


class TestBF16Trainability:
    """bf16 conv stacks must be TRAINABLE, not just runnable forward:
    before 2026-08-19, preferred_element_type=f32 on a bf16 conv made the
    transpose rule fail at trace time (f32 cotangent x bf16 kernel), so
    every --bf16 train step crashed with a TypeError before running a
    single step. Pin grad traceability for every WNConv2D variant and a
    full bf16 Multisteps train step."""

    def test_grad_through_bf16_conv_variants(self, rng):
        from sbmc_tpu.nn.layers import WNConv2D
        x = jnp.array(rng.randn(1, 12, 12, 4), jnp.float32)
        for ks, layout in [(3, "NHWC"), (1, "NHWC"), (1, "NCHW"),
                           (3, "NCHW")]:
            m = WNConv2D(features=6, ksize=ks, dtype=jnp.bfloat16,
                         out_layout=layout)
            p = m.init(jax.random.PRNGKey(0), x)
            g = jax.grad(
                lambda p: m.apply(p, x).astype(jnp.float32).sum())(p)
            leaves = jax.tree_util.tree_leaves(g)
            assert all(le.dtype == jnp.float32 for le in leaves)
            assert any(float(jnp.abs(le).max()) > 0 for le in leaves), \
                (ks, layout)

    def test_bf16_multisteps_train_step(self, rng):
        from sbmc_tpu.models import Multisteps
        from sbmc_tpu.train import DenoiserInterface
        h = w = 28
        spp, nf, ngf = 2, 7, 3
        batch = {
            "radiance": jnp.array(rng.rand(1, spp, 3, h, w), jnp.float32),
            "features": jnp.array(rng.rand(1, spp, nf, h, w), jnp.float32),
            "global_features": jnp.array(rng.rand(1, ngf, 1, 1),
                                         jnp.float32),
            "target_image": jnp.array(rng.rand(1, 3, h, w), jnp.float32),
        }
        model = Multisteps(n_features=nf, n_global_features=ngf, ksize=5,
                           width=16, embedding_width=16,
                           conv_dtype="bfloat16")
        iface = DenoiserInterface(model)
        state = iface.init(jax.random.PRNGKey(0), batch)
        state2, metrics = iface.train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["input_loss"]))
        assert int(state2.step) == 1

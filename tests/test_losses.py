"""Closed-form single-pixel checks of the losses (ports reference
tests/test_losses.py:22-128)."""

import jax
import jax.numpy as jnp
import numpy as np

from sbmc_tpu import losses


def _one(v):
    return jnp.full((1, 3, 1, 1), v, jnp.float32)


def test_relative_mse_zero_when_equal():
    assert float(losses.relative_mse(_one(0.5), _one(0.5))) == 0.0


def test_relative_mse_value():
    # 0.5 * (im-ref)^2 / (ref^2 + eps) = 0.5 * 1 / (4 + 0.01)
    im, ref = _one(3.0), _one(2.0)
    expected = 0.5 * 1.0 / (4.0 + 1e-2)
    assert np.isclose(float(losses.relative_mse(im, ref)), expected)

def test_relative_mse_symmetric_in_error_sign():
    ref = _one(2.0)
    a = float(losses.relative_mse(_one(3.0), ref))
    b = float(losses.relative_mse(_one(1.0), ref))
    assert np.isclose(a, b)


def test_smape_value():
    im, ref = _one(3.0), _one(1.0)
    expected = 2.0 / (1e-2 + 3.0 + 1.0)
    assert np.isclose(float(losses.smape(im, ref)), expected)


def test_smape_denominator_detached():
    """The denominator must not contribute gradients."""
    im, ref = _one(3.0), _one(1.0)
    g = jax.grad(lambda x: losses.smape(x, ref))(im)
    # d/dim |im-ref| / (eps+|im|+|ref|) with detached denom = 1/denom
    expected = 1.0 / (1e-2 + 3.0 + 1.0) / im.size
    assert np.allclose(np.array(g), expected, atol=1e-6)


def test_tonemapped_mse_value():
    im, ref = _one(1.0), _one(3.0)
    t_im, t_ref = 0.5, 0.75
    expected = 0.5 * (t_im - t_ref) ** 2
    assert np.isclose(float(losses.tonemapped_mse(im, ref)), expected)


def test_tonemapped_mse_clamps_negatives():
    im, ref = _one(-5.0), _one(0.0)
    assert float(losses.tonemapped_mse(im, ref)) == 0.0


def test_tonemapped_relative_mse_value():
    im, ref = _one(1.0), _one(3.0)
    t_im, t_ref = 0.5, 0.75
    expected = 0.5 * (t_im - t_ref) ** 2 / (t_ref ** 2 + 1e-2)
    assert np.isclose(float(losses.tonemapped_relative_mse(im, ref)),
                      expected)


def test_class_wrappers():
    im, ref = _one(1.0), _one(3.0)
    assert np.isclose(float(losses.RelativeMSE()(im, ref)),
                      float(losses.relative_mse(im, ref)))
    assert np.isclose(float(losses.TonemappedRelativeMSE()(im, ref)),
                      float(losses.tonemapped_relative_mse(im, ref)))


def test_losses_finite_gradients():
    rng = np.random.RandomState(0)
    im = jnp.array(rng.rand(2, 3, 8, 8), jnp.float32)
    ref = jnp.array(rng.rand(2, 3, 8, 8), jnp.float32)
    for fn in [losses.relative_mse, losses.smape, losses.tonemapped_mse,
               losses.tonemapped_relative_mse]:
        g = jax.grad(lambda x: fn(x, ref))(im)
        assert np.isfinite(np.array(g)).all()

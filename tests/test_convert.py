"""Tests for the torch->flax checkpoint converter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbmc_tpu import ops
from sbmc_tpu.models import KPCN, Multisteps
from sbmc_tpu.nn.layers import WNConv2D
from sbmc_tpu.train.convert import flax_to_torch_key, torch_state_dict_to_flax

ops.set_backend("xla")

torch = pytest.importorskip("torch")


def _flatten(tree, path=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, path + (k,)))
        else:
            out[path + (k,)] = np.asarray(v)
    return out


def test_weight_normed_conv_matches_torch(rng):
    """A converted weight-normed torch conv must produce identical outputs
    through our WNConv2D (layout + norm semantics)."""
    cin, cout, k = 5, 7, 3
    conv = torch.nn.utils.weight_norm(
        torch.nn.Conv2d(cin, cout, k, padding=k // 2))
    x = rng.rand(1, cin, 9, 11).astype(np.float32)
    with torch.no_grad():
        y_t = conv(torch.from_numpy(x)).numpy()

    sd = {f"m.prediction.{k_}": v for k_, v in
          conv.state_dict().items()}  # name it like a ConvChain prediction
    v = np.asarray(sd["m.prediction.weight_v"].detach()).transpose(2, 3, 1, 0)
    g = np.asarray(sd["m.prediction.weight_g"].detach()).reshape(-1)
    b = np.asarray(sd["m.prediction.bias"].detach())

    m = WNConv2D(features=cout, ksize=k, pad=True, weight_norm=True)
    params = {"params": {"v": jnp.array(v), "g": jnp.array(g),
                         "bias": jnp.array(b)}}
    y_j = m.apply(params, jnp.array(x.transpose(0, 2, 3, 1)))
    y_j = np.asarray(y_j).transpose(0, 3, 1, 2)
    assert np.allclose(y_t, y_j, atol=1e-5)


def test_plain_conv_matches_torch(rng):
    cin, cout, k = 4, 6, 5
    conv = torch.nn.Conv2d(cin, cout, k, padding=0)
    x = rng.rand(1, cin, 12, 12).astype(np.float32)
    with torch.no_grad():
        y_t = conv(torch.from_numpy(x)).numpy()
    v = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    b = conv.bias.detach().numpy()
    m = WNConv2D(features=cout, ksize=k, pad=False, weight_norm=False)
    params = {"params": {"v": jnp.array(v), "bias": jnp.array(b)}}
    y_j = np.asarray(m.apply(params, jnp.array(x.transpose(0, 2, 3, 1))))
    assert np.allclose(y_t, y_j.transpose(0, 3, 1, 2), atol=1e-5)


def _fake_torch_state_dict(template, weight_norm=True):
    """Build a torch-style state_dict with correct names/shapes from our
    template tree via the inverse name mapping."""
    sd = {}
    rng = np.random.RandomState(0)
    for path, arr in _flatten(template["params"]).items():
        key = flax_to_torch_key(path, weight_norm=weight_norm)
        if path[-1] == "v":
            val = rng.randn(arr.shape[3], arr.shape[2], arr.shape[0],
                            arr.shape[1]).astype(np.float32)
        elif path[-1] == "g":
            val = rng.rand(arr.shape[0], 1, 1, 1).astype(np.float32) + 0.5
        else:
            val = rng.randn(*arr.shape).astype(np.float32)
        sd[key] = val
    return sd


def test_multisteps_state_dict_roundtrip(rng):
    model = Multisteps(n_features=8, n_global_features=3, width=8,
                       embedding_width=8, ksize=3, nsteps=2)
    batch = {
        "radiance": jnp.array(rng.rand(1, 2, 3, 16, 16), jnp.float32),
        "features": jnp.array(rng.rand(1, 2, 8, 16, 16), jnp.float32),
        "global_features": jnp.array(rng.rand(1, 3, 1, 1), jnp.float32),
    }
    template = model.init(jax.random.PRNGKey(0), batch)
    sd = _fake_torch_state_dict(template)
    params = torch_state_dict_to_flax(sd, template=template)
    # converted params drive the model
    out = model.apply(params, batch)
    assert np.isfinite(np.array(out["radiance"])).all()
    # spot-check one mapped tensor: propagation net.next_level.left -> left_1
    key = "propagation_00.net.next_level.left.layer_0.layer.0.weight_v"
    expected = sd[key].transpose(2, 3, 1, 0)
    got = params["params"]["propagation_00"]["left_1"]["layer_0"]["v"]
    np.testing.assert_array_equal(np.asarray(got), expected)
    # kernel regressor lands under the scan module
    key = "kernel_regressor.prediction.weight_g"
    got = params["params"]["kernel_stage"]["kernel_regressor"][
        "prediction"]["g"]
    np.testing.assert_array_equal(np.asarray(got), sd[key].reshape(-1))


def test_kpcn_state_dict_roundtrip(rng):
    model = KPCN(n_in=9, ksize=3, depth=2, width=4)
    batch = {k: jnp.array(rng.rand(1, c, 20, 20), jnp.float32) for k, c in [
        ("kpcn_diffuse_in", 9), ("kpcn_specular_in", 9),
        ("kpcn_diffuse_buffer", 3), ("kpcn_specular_buffer", 3),
        ("kpcn_albedo", 3)]}
    template = model.init(jax.random.PRNGKey(0), batch)
    sd = _fake_torch_state_dict(template, weight_norm=False)
    params = torch_state_dict_to_flax(sd, template=template)
    out = model.apply(params, batch)
    assert np.isfinite(np.array(out["radiance"])).all()


def test_shape_mismatch_raises(rng):
    model = KPCN(n_in=9, ksize=3, depth=2, width=4)
    batch = {k: jnp.array(rng.rand(1, c, 20, 20), jnp.float32) for k, c in [
        ("kpcn_diffuse_in", 9), ("kpcn_specular_in", 9),
        ("kpcn_diffuse_buffer", 3), ("kpcn_specular_buffer", 3),
        ("kpcn_albedo", 3)]}
    template = model.init(jax.random.PRNGKey(0), batch)
    sd = _fake_torch_state_dict(template, weight_norm=False)
    key = next(iter(sd))
    sd[key] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError):
        torch_state_dict_to_flax(sd, template=template)

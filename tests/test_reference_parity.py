"""Full-model numerical cross-validation against the reference itself.

The reference implementation (/root/reference, torch) is importable on
this host once its two unavailable dependencies are stubbed:

- ``ttools``: only ``get_logger`` and ``crop_like`` are used by the model
  stack (reference sbmc/modules.py:25, sbmc/models.py:27);
- ``sbmc.halide_ops``: the compiled Halide extension. Its two forward
  entry points are implemented here in numpy via this repo's pure-jnp
  oracle (sbmc_tpu/ops/reference.py), which the op-level tests validate
  against the Halide algorithm's impulse/adjoint semantics.

With those in place, we instantiate the *reference's own* ``Multisteps``
and ``KPCN`` classes, convert their randomly-initialized ``state_dict``
through ``torch_state_dict_to_flax``, and assert the flax models produce
the same forward output — end-to-end parity of the conv stacks,
weight-norm parameterization, online-softmax accumulation, tap ordering
and crop bookkeeping. This is the checkpoint-migration path
(scripts/convert_checkpoint.py) exercised against the genuine source
model graph (the released pretrained weights themselves are not
downloadable from this host, see PARITY.md).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"


def _install_ttools_stub():
    if "ttools" in sys.modules:
        return
    import logging

    ttools = types.ModuleType("ttools")
    ttools.get_logger = logging.getLogger
    ttools.set_logger = lambda *a, **k: None
    mods = types.ModuleType("ttools.modules")
    imgops = types.ModuleType("ttools.modules.image_operators")

    def crop_like(src, tgt):
        sh, sw = src.shape[-2], src.shape[-1]
        th_, tw_ = tgt.shape[-2], tgt.shape[-1]
        if (sh, sw) == (th_, tw_):
            return src
        dy, dx = (sh - th_) // 2, (sw - tw_) // 2
        return src[..., dy:dy + th_, dx:dx + tw_]

    imgops.crop_like = crop_like
    mods.image_operators = imgops
    ttools.modules = mods
    sys.modules["ttools"] = ttools
    sys.modules["ttools.modules"] = mods
    sys.modules["ttools.modules.image_operators"] = imgops


def _install_halide_stub():
    """Torch-facing fakes of the Halide ops, backed by the jnp oracle.

    Signatures mirror the generated pytorch wrappers (reference
    sbmc/functions.py:52-120): output buffers are passed in and filled."""
    if "sbmc.halide_ops" in sys.modules:
        return
    from sbmc_tpu.ops.reference import (kernel_weighting_ref,
                                        scatter2gather_ref)

    ops = types.ModuleType("sbmc.halide_ops")

    def scatter2gather_cpu_float32(data, output):
        bs, kh, kw, h, w = data.shape
        out = scatter2gather_ref(
            np.asarray(data.detach()).reshape(bs, kh * kw, h, w))
        output.copy_(torch.from_numpy(
            np.asarray(out).reshape(bs, kh, kw, h, w)))

    def kernel_weighting_cpu_float32(data, weights, output, sum_w):
        bs, kh, kw, h, w = weights.shape
        out, sw = kernel_weighting_ref(
            np.asarray(data.detach()),
            np.asarray(weights.detach()).reshape(bs, kh * kw, h, w))
        output.copy_(torch.from_numpy(np.asarray(out)))
        sum_w.copy_(torch.from_numpy(np.asarray(sw)))

    ops.scatter2gather_cpu_float32 = scatter2gather_cpu_float32
    ops.kernel_weighting_cpu_float32 = kernel_weighting_cpu_float32
    sys.modules["sbmc.halide_ops"] = ops


@pytest.fixture(scope="module")
def ref_models():
    """The reference's models module, imported without its package
    __init__ (which needs lz4) and with the stubs above installed."""
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "sbmc")):
        pytest.skip("reference checkout not available")
    _install_ttools_stub()
    pkg = types.ModuleType("sbmc")
    pkg.__path__ = [os.path.join(REFERENCE_ROOT, "sbmc")]
    sys.modules.setdefault("sbmc", pkg)
    _install_halide_stub()
    import importlib
    return importlib.import_module("sbmc.models")


def _to_flax(ref_model, our_model, example):
    import jax
    from sbmc_tpu.train.convert import torch_state_dict_to_flax
    template = our_model.init(jax.random.PRNGKey(0), example)
    state = {k: v.detach().numpy()
             for k, v in ref_model.state_dict().items()}
    return torch_state_dict_to_flax(state, template=template)


class TestReferenceParity:
    def test_multisteps_forward_matches_reference(self, ref_models):
        from sbmc_tpu import ops
        from sbmc_tpu.models import Multisteps
        ops.set_backend("xla")

        nf, ngf, spp, h, w = 7, 3, 3, 32, 32
        kw = dict(n_features=nf, n_global_features=ngf, width=8,
                  embedding_width=8, ksize=5, nsteps=2)
        torch.manual_seed(0)
        ref = ref_models.Multisteps(**kw)
        rng = np.random.RandomState(1)
        batch = {
            "radiance": rng.rand(1, spp, 3, h, w).astype(np.float32),
            "features": rng.rand(1, spp, nf, h, w).astype(np.float32),
            "global_features": rng.rand(1, ngf, 1, 1).astype(np.float32),
        }
        with torch.no_grad():
            ref_out = ref({k: torch.from_numpy(v)
                           for k, v in batch.items()})["radiance"].numpy()

        ours = Multisteps(**kw)
        params = _to_flax(ref, ours, batch)
        our_out = np.asarray(ours.apply(params, batch)["radiance"])

        assert our_out.shape == ref_out.shape
        np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-5)

    def test_multisteps_gather_ablation_matches_reference(self, ref_models):
        from sbmc_tpu import ops
        from sbmc_tpu.models import Multisteps
        ops.set_backend("xla")

        nf, ngf, spp, h, w = 5, 2, 2, 32, 32
        kw = dict(n_features=nf, n_global_features=ngf, width=8,
                  embedding_width=8, ksize=5, nsteps=1, splat=False)
        torch.manual_seed(2)
        ref = ref_models.Multisteps(**kw)
        rng = np.random.RandomState(3)
        batch = {
            "radiance": rng.rand(1, spp, 3, h, w).astype(np.float32),
            "features": rng.rand(1, spp, nf, h, w).astype(np.float32),
            "global_features": rng.rand(1, ngf, 1, 1).astype(np.float32),
        }
        with torch.no_grad():
            ref_out = ref({k: torch.from_numpy(v)
                           for k, v in batch.items()})["radiance"].numpy()
        ours = Multisteps(**kw)
        params = _to_flax(ref, ours, batch)
        our_out = np.asarray(ours.apply(params, batch)["radiance"])
        np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-5)

    def test_kpcn_forward_matches_reference(self, ref_models):
        from sbmc_tpu import ops
        from sbmc_tpu.models import KPCN
        ops.set_backend("xla")

        h, w = 40, 40
        torch.manual_seed(4)
        ref = ref_models.KPCN(27, ksize=5, depth=3, width=16)
        rng = np.random.RandomState(5)
        batch = {
            "kpcn_diffuse_in": rng.rand(1, 27, h, w).astype(np.float32),
            "kpcn_specular_in": rng.rand(1, 27, h, w).astype(np.float32),
            "kpcn_diffuse_buffer": rng.rand(1, 3, h, w).astype(np.float32),
            "kpcn_specular_buffer": rng.rand(1, 3, h, w).astype(np.float32),
            "kpcn_albedo": rng.rand(1, 3, h, w).astype(np.float32),
        }
        with torch.no_grad():
            ref_out = ref({k: torch.from_numpy(v)
                           for k, v in batch.items()})["radiance"].numpy()
        ours = KPCN(n_in=27, ksize=5, depth=3, width=16)
        params = _to_flax(ref, ours, batch)
        our_out = np.asarray(ours.apply(params, batch)["radiance"])
        assert our_out.shape == ref_out.shape
        np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-5)


class TestReferenceLossParity:
    """The four training losses evaluated against the reference's own
    torch implementations on random tensors."""

    CASES = [("RelativeMSE", "relative_mse"),
             ("SMAPE", "smape"),
             ("TonemappedMSE", "tonemapped_mse"),
             ("TonemappedRelativeMSE", "tonemapped_relative_mse")]

    def test_losses_match_reference(self, ref_models):
        import importlib
        from sbmc_tpu import losses as ours
        ref_losses = importlib.import_module("sbmc.losses")
        rng = np.random.RandomState(7)
        im = rng.rand(2, 3, 9, 9).astype(np.float32)
        ref = rng.rand(2, 3, 9, 9).astype(np.float32)
        for torch_name, our_name in self.CASES:
            with torch.no_grad():
                want = float(getattr(ref_losses, torch_name)()(
                    torch.from_numpy(im), torch.from_numpy(ref)))
            got = float(getattr(ours, our_name)(im, ref))
            np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=our_name)


class TestReferenceModuleParity:
    """Module-level cross-checks of ConvChain/Autoencoder/progressive
    accumulation against the reference's torch implementations."""

    def test_progressive_apply_matches_reference(self, ref_models):
        """ProgressiveKernelApply from a non-trivial running state."""
        import importlib
        from sbmc_tpu import ops
        from sbmc_tpu.nn.kernel_apply import (progressive_init,
                                              progressive_kernel_apply)
        ops.set_backend("xla")
        ref_modules = importlib.import_module("sbmc.modules")
        k, h, w, c = 5, 12, 12, 3
        rng = np.random.RandomState(11)
        apply_ref = ref_modules.ProgressiveKernelApply(splat=True)
        state_t = (None, None, None)
        state_j = progressive_init(1, c, h, w)
        for _ in range(3):
            data = rng.rand(1, c, h, w).astype(np.float32)
            logits = rng.randn(1, k * k, h, w).astype(np.float32) * 3
            with torch.no_grad():
                # clone: the reference mutates kernels in place (sub_/exp_)
                state_t = apply_ref(
                    torch.from_numpy(data),
                    torch.from_numpy(logits).clone(),
                    *state_t)
            state_j = progressive_kernel_apply(data, logits, state_j,
                                               splat=True)
        np.testing.assert_allclose(
            np.asarray(state_j.sum_r), state_t[0].numpy(),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(state_j.sum_w), state_t[1].numpy(),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(state_j.max_w), state_t[2].numpy(),
            rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def ref_datasets(ref_models):
    """The reference's dataset reader, with its ``lz4.frame`` dependency
    backed by this repo's ctypes liblz4 binding."""
    if "lz4" not in sys.modules:
        from sbmc_tpu.data import lz4f
        lz4 = types.ModuleType("lz4")
        frame = types.ModuleType("lz4.frame")
        frame.decompress = lz4f.decompress
        frame.compress = lz4f.compress
        lz4.frame = frame
        sys.modules["lz4"] = lz4
        sys.modules["lz4.frame"] = frame
    import importlib
    return importlib.import_module("sbmc.datasets")


class TestReferenceDataParity:
    """Byte-level + preprocessing cross-validation: .bin tiles written by
    this repo are read by the REFERENCE's own TilesDataset and must produce
    the same tensors as this repo's reader, in every mode."""

    @pytest.fixture(scope="class")
    def dataset_dir(self, tmp_path_factory):
        from sbmc_tpu.data.synthetic import generate_dataset
        path = tmp_path_factory.mktemp("bins")
        generate_dataset(str(path), n_scenes=2, ts=16, tiles_per_side=2,
                         spp=4, gt_spp=8, seed=0)
        return str(path)

    def _compare(self, ref_d, our_d):
        assert len(ref_d) == len(our_d)
        assert list(ref_d.labels) == list(our_d.labels)
        for idx in range(len(ref_d)):
            want = ref_d[idx]
            got = our_d[idx]
            for key, val in want.items():
                if not isinstance(val, np.ndarray):
                    continue
                assert key in got, key
                np.testing.assert_allclose(
                    np.asarray(got[key], np.float32), val.astype(np.float32),
                    rtol=1e-6, atol=1e-7, err_msg=key)

    def test_sbmc_mode_matches_reference(self, ref_datasets, dataset_dir):
        from sbmc_tpu.data import TilesDataset
        self._compare(ref_datasets.TilesDataset(dataset_dir, spp=4),
                      TilesDataset(dataset_dir, spp=4))

    def test_kpcn_mode_matches_reference(self, ref_datasets, dataset_dir):
        from sbmc_tpu.data import TilesDataset
        self._compare(
            ref_datasets.TilesDataset(dataset_dir, spp=4, mode="kpcn"),
            TilesDataset(dataset_dir, spp=4, mode=TilesDataset.KPCN_MODE))

    def test_raw_mode_matches_reference(self, ref_datasets, dataset_dir):
        from sbmc_tpu.data import TilesDataset
        self._compare(
            ref_datasets.TilesDataset(dataset_dir, spp=4, mode="raw"),
            TilesDataset(dataset_dir, spp=4, mode=TilesDataset.RAW_MODE))

    def test_reduced_spp_matches_reference(self, ref_datasets, dataset_dir):
        from sbmc_tpu.data import TilesDataset
        self._compare(ref_datasets.TilesDataset(dataset_dir, spp=2),
                      TilesDataset(dataset_dir, spp=2))


@pytest.fixture(scope="module")
def ref_scenegen(ref_models):
    """The reference's scene_generator package (``bridson`` backed by this
    repo's own Poisson-disc sampler)."""
    if "bridson" not in sys.modules:
        from sbmc_tpu.scene_generator import poisson_disc_samples
        br = types.ModuleType("bridson")
        br.poisson_disc_samples = poisson_disc_samples
        sys.modules["bridson"] = br
    import importlib
    pkg = importlib.import_module("sbmc.scene_generator")
    pkg.textures = importlib.import_module("sbmc.scene_generator.textures")
    return pkg


def _norm(s):
    """Whitespace-normalize a pbrt scene string (token-stream equality is
    what the pbrt lexer sees; brackets are self-delimiting tokens — the
    reference omits a newline between a texture's suffix and the following
    directive, which pbrt parses identically)."""
    return " ".join(s.replace("[", " [ ").replace("]", " ] ").split())


class TestReferenceScenePbrtParity:
    """The pbrt scene-description strings this repo emits are token-for-
    token what the reference emits — the exact byte stream the external
    instrumented PBRT binary consumes."""

    def test_materials_match_reference(self, ref_scenegen):
        import sbmc_tpu.scene_generator as osg
        cases = [
            ("MatteMaterial", dict(id="m", diffuse=[0.3, 0.4, 0.5])),
            ("UberMaterial", dict(id="u", diffuse=[0.1, 0.2, 0.3],
                                  glossy_reflection=0.5,
                                  specular_reflection=0.25, roughness=0.7,
                                  index=1.3, opacity=0.8)),
            ("MirrorMaterial", dict(id="mi", specular=[0.9, 0.8, 0.7])),
            ("GlassMaterial", dict(id="g", reflection=[1, 1, 1],
                                   transmission=[0.9, 0.9, 0.9], index=1.4)),
            ("MetalMaterial", dict(id="me", eta=[0.2, 0.9, 1.4],
                                   k=[3.9, 2.4, 2.1], roughness=0.05)),
            ("PlasticMaterial", dict(id="p", diffuse=[0.4, 0.1, 0.1],
                                     specular=[0.6, 0.6, 0.6],
                                     roughness=0.02)),
            ("SubstrateMaterial", dict(id="s", diffuse=[0.2, 0.3, 0.1],
                                       specular=[0.5, 0.5, 0.5],
                                       uroughness=0.2, vroughness=0.3)),
        ]
        for name, kwargs in cases:
            want = getattr(ref_scenegen, name)(**kwargs).pbrt()
            got = getattr(osg, name)(**kwargs).pbrt()
            assert _norm(got) == _norm(want), name

    def test_textured_material_matches_reference(self, ref_scenegen):
        import sbmc_tpu.scene_generator as osg
        tex_kw = dict(gamma=2.2, scale=1.5, uscale=3.0, vscale=4.0,
                      udelta=0.1, vdelta=0.2)
        want = ref_scenegen.MatteMaterial(
            id="m", diffuse_texture=ref_scenegen.textures.Imagemap(
                "t0", "spectrum", "wood.tga", **tex_kw)).pbrt()
        got = osg.MatteMaterial(
            id="m", diffuse_texture=osg.Imagemap(
                "t0", "spectrum", "wood.tga", **tex_kw)).pbrt()
        assert _norm(got) == _norm(want)

    def test_lights_match_reference(self, ref_scenegen):
        import sbmc_tpu.scene_generator as osg
        for build in (
            lambda sg: sg.PointLight(spectrum=[10, 20, 30]),
            lambda sg: sg.InifiniteLight(mapname="sky.pfm", nsamples=4),
            lambda sg: sg.InifiniteLight(spectrum=[1, 2, 3]),
            lambda sg: sg.AreaLight(sg.Sphere(0.5), spectrum=[5, 5, 5],
                                    nsamples=2),
        ):
            assert _norm(build(osg).pbrt()) == _norm(build(ref_scenegen).pbrt())

    def test_geometry_and_xforms_match_reference(self, ref_scenegen):
        import sbmc_tpu.scene_generator as osg

        def build(sg):
            s = sg.Sphere(2.0)
            sg.translate(s, [0, 0, 1])
            sg.rotate(s, [0, 1, 0], 45)
            sg.scale(s, [2, 2, 2])
            sg.translate(s, [0.5, 0, 0], target="end")  # motion blur
            return s

        assert _norm(build(osg).pbrt()) == _norm(build(ref_scenegen).pbrt())

        def build_ext(sg):
            g = sg.ExternalGeometry("geometry/obj0.pbrt")
            sg.transform(g, list(range(16)))
            return g

        assert _norm(build_ext(osg).pbrt()) == \
            _norm(build_ext(ref_scenegen).pbrt())

    def test_renderer_headers_match_reference(self, ref_scenegen):
        import sbmc_tpu.scene_generator as osg
        for kw in (
            dict(spp=4, gt_spp=64, tile_size=128, width=256, height=128),
            dict(integrator="path", spp=8, path_depth=3, width=64,
                 height=64, pixel_filter="box", sampler="lowdiscrepancy"),
        ):
            assert _norm(osg.Renderer(**kw).pbrt()) == \
                _norm(ref_scenegen.Renderer(**kw).pbrt())

    def test_full_scene_matches_reference(self, ref_scenegen):
        import sbmc_tpu.scene_generator as osg

        def build(sg):
            scn = sg.Scene(renderer=sg.Renderer(spp=2, gt_spp=8))
            scn.camera = sg.Camera(position=[0, 1, 2], target=[0, 0, 0],
                                   up=[0, 1, 0], fov=40, lensradius=0.01,
                                   focaldistance=2.5)
            scn.lights.append(sg.PointLight(spectrum=[9, 9, 9]))
            m = sg.MatteMaterial(id="m", diffuse=[0.5, 0.5, 0.5])
            scn.materials.append(m)
            sphere = sg.Sphere(1.0)
            sphere.material = m
            sg.translate(sphere, [0, 0, -2])
            scn.shapes.append(sphere)
            return scn.pbrt()

        assert _norm(build(osg)) == _norm(build(ref_scenegen))

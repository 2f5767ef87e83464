"""Tests for the PBRT rendering drivers using a mock pbrt executable."""

import os
import stat

import pytest

from sbmc_tpu.rendering import (PBRTRenderer, PBRTRenderingParser,
                                PBRTSamplesRenderer, SamplesRenderingParser)


def _mock_pbrt(tmp_path, mode):
    """A fake pbrt: writes scene.exr or a .bin tile into the cwd."""
    exe = tmp_path / "pbrt"
    if mode == "exr":
        body = "#!/bin/bash\ntouch scene.exr\n"
    else:
        body = "#!/bin/bash\ntouch 0000_0000.bin\n"
    exe.write_text(body)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    return str(exe)


def _scene(tmp_path):
    sdir = tmp_path / "myscene"
    sdir.mkdir()
    scene = sdir / "scene.pbrt"
    scene.write_text('WorldBegin\nShape "sphere"\nWorldEnd\n')
    (sdir / "asset.tga").write_text("x")  # an asset to symlink
    return str(scene)


class TestExrDriver:
    def test_renders_and_moves_output(self, tmp_path):
        exe = _mock_pbrt(tmp_path, "exr")
        scene = _scene(tmp_path)
        out = str(tmp_path / "out" / "result.exr")
        parser = PBRTRenderingParser()
        args = parser.parse_args(
            [exe, scene, out, "--tmp_dir", str(tmp_path / "work"),
             "--spp", "4", "--width", "64", "--height", "64"])
        # header is prepended with the plain path integrator
        assert 'SurfaceIntegrator "path"' in args.scene_desc
        assert '"integer pixelsamples" [4]' in args.scene_desc
        assert 'WorldBegin' in args.scene_desc
        PBRTRenderer(args).render()
        assert os.path.exists(out)

    def test_requires_exr_output(self, tmp_path):
        exe = _mock_pbrt(tmp_path, "exr")
        scene = _scene(tmp_path)
        parser = PBRTRenderingParser()
        with pytest.raises(RuntimeError):
            parser.parse_args([exe, scene, str(tmp_path / "out.png")])

    def test_missing_scene_raises(self, tmp_path):
        exe = _mock_pbrt(tmp_path, "exr")
        parser = PBRTRenderingParser()
        with pytest.raises(RuntimeError):
            parser.parse_args([exe, str(tmp_path / "nope.pbrt"),
                               str(tmp_path / "o.exr")])


class TestSamplesDriver:
    def test_renders_bins_to_folder(self, tmp_path):
        exe = _mock_pbrt(tmp_path, "bin")
        scene = _scene(tmp_path)
        out = str(tmp_path / "bins")
        parser = SamplesRenderingParser()
        args = parser.parse_args(
            [exe, scene, out, "--tmp_dir", str(tmp_path / "work"),
             "--spp", "4", "--gt_spp", "32"])
        # the instrumented renderer header is emitted
        assert 'Renderer "rendernet"' in args.scene_desc
        assert '"integer recordedsamples" [4]' in args.scene_desc
        assert '"integer pixelsamples" [32]' in args.scene_desc
        PBRTSamplesRenderer(args).render()
        assert any(f.endswith(".bin") for f in os.listdir(out))

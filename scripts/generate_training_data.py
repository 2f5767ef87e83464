#!/usr/bin/env python
"""Procedural training-data synthesis swarm (reference:
scripts/generate_training_data.py).

Two multiprocessing worker pools connected by joinable queues: scene
synthesizers (sample a random scene, write ``scene.pbrt``) feed render
workers (run the instrumented ``pbrt``, validate that ``.bin`` tiles were
produced, clean intermediates). Crash-tolerant: scene sampling retries up to
20 attempts, failed renders are logged and their directories deleted. Work
shards across machines via ``--worker_id/--num_workers/--start_index``.
"""

import argparse
import os
import shutil
import subprocess
import sys
import time
import uuid
from multiprocessing import JoinableQueue, Pool, cpu_count

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


import sbmc_tpu.scene_generator as scenegen  # noqa: E402
from sbmc_tpu.utils.logging import get_logger, set_logger  # noqa: E402

LOG = get_logger("sbmc_tpu.datagen")

MAX_SCENE_ATTEMPTS = 20


def _validate_render(path):
    """A render is valid iff it produced at least one .bin tile."""
    return any(f.endswith(".bin") for f in os.listdir(path))


def _clean_bin_folder(path):
    """Delete everything but the .bin tiles (scene file, geometry, links)."""
    for f in os.listdir(path):
        f = os.path.join(path, f)
        if os.path.splitext(f)[-1] == ".bin":
            continue
        if os.path.islink(f) or os.path.isfile(f):
            os.remove(f)
        elif os.path.isdir(f):
            shutil.rmtree(f)


def _random_dirname():
    """Host + timestamp + uuid so distributed workers never collide."""
    return "%s_%s_%s" % (os.uname()[1],
                         time.strftime("%Y-%m-%d-%H%M%S", time.localtime()),
                         str(uuid.uuid4())[:8])


class GeneratorParams:
    """Resolved asset lists + instantiated scene generators."""

    def __init__(self, args):
        self.working_dir = os.getcwd()
        self.output = args.output
        self.converter = os.path.abspath(args.obj2pbrt_exe)
        self.renderer = os.path.abspath(args.pbrt_exe)

        assets = os.path.abspath(args.assets)
        if not os.path.exists(assets):
            LOG.warning("No valid assets folder provided.")
        self.envmaps = self._filelist(os.path.join(assets, "envmaps.txt"))
        self.textures = self._filelist(os.path.join(assets, "textures.txt"))
        self.models = self._filelist(os.path.join(assets, "models.txt"))
        LOG.debug("Assets: %d envmaps, %d textures, %d models",
                  len(self.envmaps), len(self.textures), len(self.models))

        self.gen = []
        for name in args.generators:
            cls = getattr(scenegen, name, None)
            if cls is None:
                raise RuntimeError("Unknown generator `%s`" % name)
            extra = ()
            if cls is scenegen.SunCGSceneGenerator:
                # Legacy indoor generator; needs the (withdrawn) SunCG
                # distribution on disk (reference keeps this disabled,
                # scripts/generate_training_data.py:99-103).
                if not getattr(args, "suncg_root", None):
                    raise RuntimeError(
                        "SunCGSceneGenerator requires --suncg_root")
                extra = (os.path.abspath(args.suncg_root),)
            self.gen.append(cls(self.envmaps, self.textures, self.models,
                                self.converter, *extra))

    @staticmethod
    def _filelist(listpath):
        if not os.path.exists(listpath):
            return []
        root = os.path.dirname(listpath)
        out = []
        with open(listpath) as fid:
            for line in fid:
                path = os.path.join(root, line.strip()).replace("./", "")
                if os.path.exists(path):
                    out.append(path)
        return out


def create_scene_file(q, render_queue):
    """Scene-synthesis worker loop."""
    while True:
        data = q.get(block=True)
        idx = data["idx"]
        params = data["gen_params"]
        rparams = dict(data["render_params"])
        np.random.seed(idx)

        dst_dir = os.path.abspath(
            os.path.join(params.output, _random_dirname()))
        try:
            os.makedirs(os.path.join(dst_dir, "geometry"), exist_ok=True)
        except OSError as e:
            LOG.warning("Could not setup %s: %s", dst_dir, e)
            q.task_done()
            continue

        # Render at a random resolution multiple, cropped back to the target
        # size so object scale statistics vary.
        scale = int(np.random.choice([1, 2, 4, 8]))
        rparams["random_crop_w"] = rparams["width"]
        rparams["random_crop_h"] = rparams["height"]
        rparams["width"] = rparams["width"] * scale
        rparams["height"] = rparams["height"] * scale

        scn = scenegen.Scene(renderer=scenegen.Renderer(**rparams))
        try:
            gen = np.random.choice(params.gen)
            ok = False
            for _ in range(MAX_SCENE_ATTEMPTS):
                if gen.sample(scn, dst_dir):
                    ok = True
                    break
                LOG.warning("Sampling another Scene %s", gen)
            if not ok:
                LOG.warning("Could not generate scene %d, skipping", idx)
                q.task_done()
                continue
        except Exception as e:
            LOG.warning("Scene sampling failed: %s, continuing", e)
            q.task_done()
            continue

        try:
            with open(os.path.join(dst_dir, "scene.pbrt"), "w") as fid:
                fid.write(scn.pbrt())
        except OSError:
            LOG.error("Failed to save .pbrt file, continuing")
            q.task_done()
            continue

        render_queue.put({"idx": idx, "gen_params": params,
                          "scene_dir": dst_dir, "verbose": data["verbose"],
                          "clean": data["clean"]}, block=False)
        q.task_done()


def render(render_queue):
    """Render worker loop: run pbrt, validate, clean."""
    while True:
        data = render_queue.get(block=True)
        params = data["gen_params"]
        dst_dir = data["scene_dir"]
        LOG.info("Rendering scene '%s'", dst_dir)
        try:
            stderr = None if data["verbose"] else subprocess.DEVNULL
            subprocess.check_output([params.renderer, "scene.pbrt"],
                                    stderr=stderr, cwd=dst_dir)
        except Exception as e:
            LOG.warning("Rendering failed for scene %s: %s", dst_dir, e)
            render_queue.task_done()
            continue

        if not _validate_render(dst_dir):
            LOG.warning("Render did not complete properly, deleting %s",
                        dst_dir)
            shutil.rmtree(dst_dir)
            render_queue.task_done()
            continue

        if data["clean"]:
            _clean_bin_folder(dst_dir)
        LOG.info("Finished rendering scene #%d", data["idx"])
        render_queue.task_done()


def main(args):
    set_logger(args.verbose)
    if args.width % args.tile_size or args.height % args.tile_size:
        raise ValueError("Block size should divide width and height.")

    if args.renderer == "wavefront":
        # TPU-native path: render TracerScenes directly (no external
        # binaries); shards by worker like the PBRT path.
        from sbmc_tpu.render import pathtracer
        count = args.count if args.count > 0 else 1
        LOG.info("Wavefront renderer: %d scenes at %dx%d, %d spp "
                 "(gt %d)", count, args.width, args.height, args.spp,
                 args.gt_spp)
        obj_pool = None
        if args.obj_dir:
            from sbmc_tpu.render.assets import ObjPool
            obj_pool = ObjPool(args.obj_dir)
            LOG.info("ObjPool: %d meshes from %s", len(obj_pool),
                     args.obj_dir)
        tex_pool = None
        if args.tex_dir:
            from sbmc_tpu.render.assets import TexturePool
            tex_pool = TexturePool(args.tex_dir)
            LOG.info("TexturePool: %d images from %s", len(tex_pool),
                     args.tex_dir)
        env_pool = None
        if args.env_dir:
            from sbmc_tpu.render.assets import EnvmapPool
            env_pool = EnvmapPool(args.env_dir)
            LOG.info("EnvmapPool: %d envmaps from %s", len(env_pool),
                     args.env_dir)
        pathtracer.generate_wavefront_dataset(
            args.output, n_scenes=count, ts=args.tile_size,
            tiles_per_side=args.width // args.tile_size,
            tiles_y=args.height // args.tile_size, spp=args.spp,
            gt_spp=args.gt_spp,
            start_index=args.start_index + args.worker_id,
            seed=0, kpcn_mode=args.kpcn_data, obj_pool=obj_pool,
            tex_pool=tex_pool, env_pool=env_pool)
        return

    LOG.info("Starting job on worker %d of %d with %d threads",
             args.worker_id, args.num_workers, args.threads)
    gen_params = GeneratorParams(args)
    render_params = dict(spp=args.spp, gt_spp=args.gt_spp,
                         height=args.height, width=args.width,
                         path_depth=args.path_depth,
                         tile_size=args.tile_size)

    scene_queue = JoinableQueue()
    render_queue = JoinableQueue()
    Pool(args.threads, create_scene_file, (scene_queue, render_queue))
    Pool(args.threads, render, (render_queue,))

    count = 0
    while True:
        for _ in range(min(args.batch_size, max(args.count, 1))):
            if args.count > 0 and count == args.count:
                break
            # Deterministic per-scene seed, sharded across workers.
            idx = args.start_index + count * args.num_workers + args.worker_id
            scene_queue.put({"idx": idx, "gen_params": gen_params,
                             "render_params": render_params,
                             "verbose": args.verbose, "clean": args.clean},
                            block=False)
            count += 1
        scene_queue.join()
        render_queue.join()
        if args.count > 0 and count == args.count:
            break


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("pbrt_exe", help="path to the `pbrt` executable "
                        "(ignored with --renderer wavefront; pass '-').")
    parser.add_argument("obj2pbrt_exe",
                        help="path to PBRT's `obj2pbrt` executable "
                        "(ignored with --renderer wavefront; pass '-').")
    parser.add_argument("--renderer", default="pbrt",
                        choices=["pbrt", "wavefront"],
                        help="'pbrt': external instrumented renderer; "
                        "'wavefront': built-in TPU-native path tracer.")
    parser.add_argument("--tex_dir", type=str, default=None,
                        help="directory of image textures (png/jpg/exr) "
                        "randomly assigned to materials and the ground "
                        "(wavefront renderer; the reference's Imagemap "
                        "randomization, randomizers.py:27-93).")
    parser.add_argument("--env_dir", type=str, default=None,
                        help="directory of equirect HDR envmaps (exr/png) "
                        "randomly substituted for the procedural sky lobes "
                        "(wavefront renderer; randomizers.py "
                        "random_envmap).")
    parser.add_argument("--obj_dir", type=str, default=None,
                        help="directory of .obj meshes to ingest as props "
                        "(wavefront renderer; reference: random model "
                        "placement, sbmc/scene_generator/generators.py)")
    parser.add_argument("--kpcn_data", action="store_true", default=False,
                        help="record with the PathKPCNIntegrator "
                        "conventions (unnormalized distances/probabilities;"
                        " wavefront renderer only).")
    parser.add_argument("assets", help="path to the assets to use.")
    parser.add_argument("output")
    parser.add_argument("--start_index", type=int, default=0)
    parser.add_argument("--worker_id", type=int, default=0)
    parser.add_argument("--num_workers", type=int, default=1)
    parser.add_argument("--threads", type=int,
                        default=max(cpu_count() // 2, 1))
    parser.add_argument("--count", type=int, default=-1,
                        help="scenes to generate per worker (-1: forever)")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--verbose", action="store_true", default=False)
    parser.add_argument("--generators", nargs="+",
                        default=["OutdoorSceneGenerator"])
    parser.add_argument("--suncg_root", type=str, default=None,
                        help="root of a SunCG distribution (only needed "
                        "for the legacy SunCGSceneGenerator).")
    parser.add_argument("--spp", type=int, default=32)
    parser.add_argument("--gt_spp", type=int, default=512)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--height", type=int, default=512)
    parser.add_argument("--path_depth", type=int, default=5)
    parser.add_argument("--tile_size", type=int, default=128)
    parser.add_argument("--no-clean", dest="clean", action="store_false",
                        default=True)
    main(parser.parse_args())

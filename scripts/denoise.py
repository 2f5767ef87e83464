#!/usr/bin/env python
"""Denoise rendered samples with a trained model (reference:
scripts/denoise.py).

Full frames are processed in overlapping tiles (bounding device memory and
enabling multi-device round-robin); model and dataset configuration are
reconstructed from the checkpoint meta so no model flags are needed. Wall
clock is reported with explicit ``block_until_ready`` fences, replicating
the reference's cuda-synchronized timing protocol
(scripts/denoise.py:152-165).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()



def main(args):
    if not args.output.endswith(".exr"):
        raise SystemExit("--output must be a .exr path, got %r"
                         % args.output)
    if (isinstance(args.tile_size, tuple) or isinstance(args.tile_pad,
                                                        tuple)) \
            and not args.uniform_tiles:
        raise SystemExit("rectangular HxW tiles require --uniform_tiles")
    import jax
    import imageio.v2 as imageio
    from sbmc_tpu.data import FullImagesDataset
    from sbmc_tpu.models.build import build_model
    from sbmc_tpu.parallel.tiles import merge_tiles, pad_back, split_tiles
    from sbmc_tpu.train import Checkpointer, DenoiserInterface
    from sbmc_tpu.utils import exr
    from sbmc_tpu.utils.logging import get_logger, set_logger

    set_logger(args.verbose)
    log = get_logger("sbmc_tpu.denoise")
    start = time.time()

    if not os.path.exists(args.input):
        raise ValueError("input {} does not exist".format(args.input))

    meta = Checkpointer.load_meta(args.checkpoint)
    data_params = dict(meta["data_params"])
    if args.spp:
        data_params["spp"] = args.spp

    data = FullImagesDataset(args.input, **data_params)
    kpcn_mode = meta.get("kpcn_mode", False)
    model = build_model(meta)
    log.info("Denoising input with %d spp (%s)", data.spp,
             "KPCN" if kpcn_mode else "SBMC")

    interface = DenoiserInterface(model)
    checkpointer = Checkpointer(args.checkpoint)

    apply_fn = jax.jit(model.apply)

    import jax.numpy as jnp

    def _upcast(b):
        return {k: (v.astype(jnp.float32) if v.dtype == jnp.float16 else v)
                for k, v in b.items()}

    # Built once so multi-scene inputs hit the compilation cache (a fresh
    # lambda per scene would recompile the full model for every scene).
    mapped_fn = jax.jit(lambda p, b: jax.lax.map(
        lambda t: model.apply(
            p, _upcast({k: v[None] for k, v in t.items()}))["radiance"], b))
    apply_cast_fn = jax.jit(lambda p, b: model.apply(p, _upcast(b)))

    def _maybe_f16(stacked):
        # Ship the dominant feature stacks as float16 (halves the
        # host->device bytes and HBM residency; the training path already
        # feeds f16-cached features, so precision is identical to the
        # trained regime). Radiance stays f32 (HDR range). Applied on both
        # the single- and multi-device branches so output numerics do not
        # depend on device count.
        if not args.f32_transfer:
            for k in stacked:
                if "features" in k or k.endswith("_in"):
                    stacked[k] = stacked[k].astype(np.float16)
        return stacked

    def denoise_uniform(params, batch, log):
        """Single-compile path over uniform tiles.

        Multi-device: tiles stacked on the batch axis, SPMD-sharded over
        the mesh. Single device: ``lax.map`` over the tile stack (one
        tile's working set in HBM at a time — the bench.py protocol, so
        real-data timings are directly comparable to the synthetic
        headline)."""
        from sbmc_tpu.parallel.mesh import data_sharding, make_mesh, replicate
        from sbmc_tpu.parallel.tiles import (merge_tiles_uniform,
                                             split_tiles_uniform)
        stacked, info = split_tiles_uniform(batch, tile=args.tile_size,
                                            pad=args.tile_pad)
        n_tiles = stacked["features" if "features" in stacked
                          else "kpcn_diffuse_in"].shape[0]
        ndev = args.num_devices or jax.local_device_count()
        ndev = min(ndev, n_tiles)
        stacked = _maybe_f16(stacked)
        if ndev == 1:
            dev_batch = jax.device_put(stacked)
            jax.block_until_ready(dev_batch)
            t0 = time.time()
            out = np.asarray(jax.block_until_ready(mapped_fn(params,
                                                             dev_batch)))
            elapsed = (time.time() - t0) * 1000
            log.info("    denoising time {:.1f} ms (lax.map over %d "
                     "uniform tiles, 1 device)".format(elapsed) % n_tiles)
            return merge_tiles_uniform(out[:, 0], info)
        pad_to = -(-n_tiles // ndev) * ndev
        if pad_to != n_tiles:
            for k, v in stacked.items():
                reps = np.concatenate(
                    [v, np.repeat(v[-1:], pad_to - n_tiles, 0)], 0)
                stacked[k] = reps
        mesh = make_mesh(ndev)
        shard = data_sharding(mesh)
        params_r = replicate(params, mesh)
        dev_batch = {k: jax.device_put(v, shard) for k, v in stacked.items()}
        jax.block_until_ready(params_r)
        t0 = time.time()
        out = apply_cast_fn(params_r, dev_batch)["radiance"]
        out = np.asarray(jax.block_until_ready(out))[:n_tiles]
        elapsed = (time.time() - t0) * 1000
        log.info("    denoising time {:.1f} ms (uniform tiles over {} "
                 "device(s))".format(elapsed, ndev))
        return merge_tiles_uniform(out, info)

    first = True
    for scene_id in range(len(data)):
        item = data[scene_id]
        batch = {k: v[None] if isinstance(v, np.ndarray) else v
                 for k, v in item.items()}
        scene = os.path.basename(data.get_scene_name(scene_id))
        log.info("  scene %s", scene)
        # With multiple scenes, suffix the output path per scene so results
        # are not overwritten (single-scene keeps the exact path).
        out_path = args.output if len(data) == 1 else             args.output.replace(".exr", "_%s.exr" % scene)
        if args.uniform_tiles:
            from sbmc_tpu.parallel.tiles import split_tiles_uniform
            stacked0, _ = split_tiles_uniform(batch, tile=args.tile_size,
                                              pad=args.tile_pad)
            init_batch = {k: v[:1] for k, v in stacked0.items()}
            tiles = [(init_batch, None, None, None, None, None)]
        else:
            tiles = split_tiles(batch, max_sz=args.tile_size,
                                pad=args.tile_pad)

        if first:
            # Initialize params with the first tile's shapes and restore.
            params = model.init(jax.random.PRNGKey(0), tiles[0][0])
            from sbmc_tpu.train.interface import TrainState
            state_t = TrainState(params=params,
                                 opt_state=interface.tx.init(params),
                                 step=np.zeros((), np.int32))
            state, step = checkpointer.load_latest(state_t)
            if step is None:
                state, step = checkpointer.load_tag(state_t, "final")
            log.info("Loading latest checkpoint %s",
                     "failed — using random init" if step is None
                     else "success")
            params = state.params
            log.info("setup time {:.1f} ms".format(
                (time.time() - start) * 1000))
            first = False

        if args.uniform_tiles:
            canvas = denoise_uniform(params, batch, log)
            out_radiance = np.asarray(canvas)[0].transpose(1, 2, 0)
            outdir = os.path.dirname(out_path)
            if outdir:
                os.makedirs(outdir, exist_ok=True)
            exr.write(out_path, out_radiance)
            png = out_path.replace(".exr", ".png")
            imageio.imwrite(
                png, (np.clip(out_radiance, 0, 1) * 255).astype(np.uint8))
            log.info("    wrote %s / %s", out_path, png)
            continue

        devices = jax.local_devices()[:args.num_devices] \
            if args.num_devices else jax.local_devices()
        if len(devices) > 1 and len(tiles) > 1:
            # Round-robin tiles over devices: tiled inference is
            # embarrassingly parallel (SURVEY.md §2.3 "spatial tiling").
            params_per_dev = [jax.device_put(params, d) for d in devices]
        else:
            devices = devices[:1]
            params_per_dev = [params]

        canvas = np.zeros_like(np.asarray(batch["low_spp"]))
        jax.block_until_ready(params_per_dev)
        trace_ctx = None
        if args.trace and scene_id == 0:
            jax.profiler.start_trace(args.trace)
            trace_ctx = True
        t0 = time.time()
        outs = []
        for i, (tb, y0, y1, x0, x1, tilepad) in enumerate(tiles):
            d = i % len(devices)
            tb_dev = {k: jax.device_put(v, devices[d])
                      for k, v in tb.items()}
            out = apply_fn(params_per_dev[d], tb_dev)["radiance"]
            outs.append((out, tb, y0, y1, x0, x1, tilepad))
        merged = []
        for out, tb, y0, y1, x0, x1, tilepad in outs:
            out = pad_back(tb, jax.block_until_ready(out))
            merged.append((out, y0, y1, x0, x1, tilepad))
        elapsed = (time.time() - t0) * 1000
        if trace_ctx:
            jax.profiler.stop_trace()
            log.info("    wrote profiler trace to %s", args.trace)
        log.info("    denoising time {:.1f} ms ({} device(s))".format(
            elapsed, len(devices)))
        merge_tiles(canvas, merged)

        out_radiance = canvas[0].transpose(1, 2, 0)
        outdir = os.path.dirname(out_path)
        if outdir:
            os.makedirs(outdir, exist_ok=True)
        exr.write(out_path, out_radiance)
        png = out_path.replace(".exr", ".png")
        imageio.imwrite(
            png, (np.clip(out_radiance, 0, 1) * 255).astype(np.uint8))
        log.info("    wrote %s / %s", out_path, png)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=str, required=True,
                        help="folder containing the sample .bin files.")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="folder containing the model checkpoint.")
    parser.add_argument("--output", type=str, required=True,
                        help="output .exr destination.")
    parser.add_argument("--spp", type=int,
                        help="number of samples to use as input.")
    def _tile(v):
        # "512" -> 512; "640x2048" -> (640, 2048) (rectangular strips,
        # the bench.py-winning geometry; uniform-tile path only).
        if "x" in v:
            a, b = v.split("x")
            return (int(a), int(b))
        return int(v)

    parser.add_argument("--tile_size", type=_tile, default=512,
                        help="tile size bounding device memory usage; "
                        "HxW (e.g. 640x2048) for rectangular strips "
                        "(uniform-tile path).")
    parser.add_argument("--tile_pad", type=_tile, default=128,
                        help="overlap padding around tiles (HxW allowed).")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="devices to spread tiles over (default: all).")
    parser.add_argument("--uniform_tiles", action="store_true",
                        help="uniform-size tiles stacked on the batch axis "
                        "and sharded over the device mesh (one compiled "
                        "apply for the whole frame; SPMD multi-chip).")
    parser.add_argument("--trace", type=str, default=None,
                        help="write a jax.profiler trace of the first scene"
                        " to this directory.")
    parser.add_argument("--f32_transfer", action="store_true",
                        help="upload feature stacks as float32 instead of "
                        "the default float16 (single-device uniform-tile "
                        "path; f16 halves host->device bytes and HBM "
                        "residency, matching the f16-cached training "
                        "feed).")
    parser.add_argument("--verbose", action="store_true")
    main(parser.parse_args())

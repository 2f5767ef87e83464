#!/usr/bin/env python
"""Train a denoiser (reference: scripts/train.py).

Flags mirror the reference CLI (scripts/train.py:118-150); training runs a
single compiled data-parallel step over all local devices, with variable-spp
batches padded + masked so one compiled graph serves every sample count.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()



def main(args):
    import jax
    from sbmc_tpu.data import (Loader, MultiSampleCountDataset, TilesDataset)
    from sbmc_tpu.models import KPCN, LBF, Multisteps
    from sbmc_tpu.models.build import model_meta
    from sbmc_tpu.parallel.mesh import make_mesh  # noqa: F401
    from sbmc_tpu.train import (Checkpointer, DenoiserInterface, Trainer,
                                callbacks)
    from sbmc_tpu.utils.logging import get_logger, set_logger

    set_logger(args.verbose)
    log = get_logger("sbmc_tpu.train")
    np.random.seed(0)

    from sbmc_tpu.parallel.mesh import maybe_init_distributed
    proc_id, n_procs = maybe_init_distributed()
    if n_procs > 1:
        log.info("Multi-host: process %d of %d", proc_id, n_procs)

    if args.profile_port:
        # Live profiler endpoint (connect with TensorBoard / xprof), the
        # observability analog of the reference's visdom port.
        jax.profiler.start_server(args.profile_port)
        log.info("jax.profiler server on port %d", args.profile_port)

    data_args = dict(
        spp=args.spp,
        mode=TilesDataset.KPCN_MODE if args.kpcn_mode
        else TilesDataset.SBMC_MODE,
        load_coords=not args.dont_use_coords,
        load_gbuffer=not args.dont_use_gbuffer,
        load_p=not args.dont_use_p,
        load_ld=not args.dont_use_ld,
        load_bt=not args.dont_use_bt,
    )

    pad_spp = None
    random_mask_spp = None
    if args.randomize_spp and not args.kpcn_mode:
        if args.cache_ram:
            # Cached mode: keep every tile at full spp (preprocessed once,
            # float16) and randomize the *valid* sample count per item via
            # the mask — numerically identical to training on fewer samples
            # (masked samples contribute exactly zero).
            data = TilesDataset(args.data, cache_preprocessed=True,
                                **data_args)
            random_mask_spp = (2, args.spp)
        else:
            data = MultiSampleCountDataset(args.data, **data_args)
            pad_spp = args.spp
        log.info("Training with randomized sample count (2..%d, padded "
                 "+ masked to a single compiled shape)", args.spp)
    else:
        data = TilesDataset(args.data, cache_preprocessed=args.cache_ram,
                            **data_args)
    log.info("Training dataset: %s", data)

    val_data = None
    if args.val_data:
        val_data = TilesDataset(args.val_data, **data_args)

    if args.kpcn_mode and args.lbf_mode:
        raise SystemExit("--kpcn_mode and --lbf_mode are mutually exclusive")

    # bf16 TRAINING is validated as of the round-5 attribution A/B
    # (results/ab_r5/bf16_host.verdict.json: 600-step fresh-init solo
    # run, tail loss 0.0078 vs input 0.0420, healthy/improving) on top
    # of the 2026-08-19 WNConv2D transpose fix that first made it
    # traceable. --trust_bf16 is kept as an accepted no-op for driver
    # compatibility; --bf16 now engages directly.
    if args.kpcn_mode:
        log.info("Model: KPCN (gather baseline, [Bako2017])")
        model_params = dict(n_in=data.num_features, ksize=args.ksize,
                            depth=args.kpcn_depth, width=args.kpcn_width,
                            conv_dtype="bfloat16" if args.bf16 else None)
        model = KPCN(**model_params)
    elif args.lbf_mode:
        log.info("Model: LBF (learned bilateral filter, [Kalantari2015])")
        model_params = dict(
            n_features=data.num_features,
            n_global_features=data.num_global_features,
            window_r=args.lbf_window_r,
            conv_dtype="bfloat16" if args.bf16 else None)
        model = LBF(**model_params)
    else:
        log.info("Model: Multisteps (SBMC), splat=%s", not args.gather)
        model_params = dict(
            n_features=data.num_features,
            n_global_features=data.num_global_features,
            ksize=args.ksize, splat=not args.gather, pixel=args.pixel,
            conv_dtype="bfloat16" if args.bf16 else None,
            remat=args.remat)
        model = Multisteps(**model_params)

    mesh = None
    if jax.device_count() > 1:
        mesh = make_mesh()
        log.info("Data-parallel over %d devices", jax.device_count())

    interface = DenoiserInterface(model, lr=args.lr, mesh=mesh)

    arch = "kpcn" if args.kpcn_mode else ("lbf" if args.lbf_mode else "sbmc")
    meta = model_meta(args.kpcn_mode, model_params, data_args, arch=arch)
    checkpointer = Checkpointer(args.checkpoint_dir, meta=meta)

    loader = Loader(data, batch_size=args.bs, shuffle=True, pad_spp=pad_spp,
                    num_threads=args.num_worker_threads,
                    shard_id=proc_id, num_shards=n_procs,
                    random_mask_spp=random_mask_spp)
    val_loader = None
    if val_data is not None:
        val_loader = Loader(val_data, batch_size=args.bs, shuffle=False,
                            num_threads=args.num_worker_threads)

    first = next(iter(loader))
    state = interface.init(jax.random.PRNGKey(0), first)
    state, step = checkpointer.load_latest(state)
    if step is not None:
        log.info("Resumed from checkpoint step %s", step)

    cbs = [
        callbacks.ProgressCallback(interval=args.log_interval),
        callbacks.CheckpointingCallback(
            checkpointer, lambda: trainer.state,
            interval_steps=args.checkpoint_interval),
        callbacks.ScalarLogCallback(
            os.path.join(args.checkpoint_dir, "train_log.csv"),
            interval=args.log_interval),
    ]
    if not args.kpcn_mode:
        cbs.append(callbacks.DenoisingDisplayCallback(
            interface, lambda: trainer.state, lambda: first,
            os.path.join(args.checkpoint_dir, "viz")))
    trainer = Trainer(interface, cbs)

    # The reservoir's on-chip learning curve is validated as of the
    # round-5 attribution A/B (results/ab_r5/f32_reservoir.verdict.json:
    # 600-step fresh-init solo run, tail loss 0.0057 vs input 0.0291,
    # ~3-5x the host-loader step rate). The 2026-08-19 9000-step
    # non-learning run that motivated the old --trust_reservoir guard is
    # attributed to its confounds (concurrent datagen on the chip;
    # f16-snapshot warm starts reset Adam moments), not the sampler —
    # the donated in-place update/gather path is also bit-exact on chip
    # up to 4.4 GiB (scripts/bigbuf_probe.py). --trust_reservoir is kept
    # as an accepted no-op for driver compatibility.
    use_reservoir = (args.device_reservoir > 0 and mesh is None
                     and not args.kpcn_mode)
    if args.device_reservoir > 0 and not use_reservoir and \
            (mesh is not None or args.kpcn_mode):
        log.info("--device_reservoir ignored (data-parallel mesh or kpcn "
                 "mode keeps the host loader)")
    if use_reservoir:
        from sbmc_tpu.train.reservoir import DeviceReservoir, ReservoirFeeder
        cap = min(args.device_reservoir, len(data))
        spp_range = (2, args.spp) if args.randomize_spp else None
        reservoir = DeviceReservoir(interface, capacity=cap,
                                    batch_size=args.bs,
                                    spp_mask_range=spp_range)
        log.info("Device reservoir: %d tiles in HBM, on-device batch "
                 "sampling (spp mask range %s)", cap, spp_range)
        reservoir.fill([data[i] for i in range(cap)])
        feeder = None
        if cap < len(data):
            feeder = ReservoirFeeder(data, depth=2).start()
        max_steps = args.max_steps
        if max_steps is None and args.num_epochs is not None:
            # The reservoir loop is step-based; honor --num_epochs by
            # converting it to the equivalent step budget so semantics
            # match the host-loader branch instead of looping forever.
            max_steps = max(1, args.num_epochs * len(data) // args.bs)
            log.info("Reservoir: --num_epochs %d -> max_steps %d",
                     args.num_epochs, max_steps)
        trainer.train_reservoir(state, reservoir, feeder=feeder,
                                max_steps=max_steps,
                                refresh_every=args.refresh_every,
                                val_dataloader=val_loader)
    else:
        trainer.train(state, loader, num_epochs=args.num_epochs,
                      val_dataloader=val_loader, max_steps=args.max_steps)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("data", help=".bin data folder or filelist .txt")
    parser.add_argument("checkpoint_dir", help="checkpoint output directory")
    parser.add_argument("--val_data", help="validation data folder")
    parser.add_argument("--num_epochs", type=int, default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--bs", type=int, default=1, help="batch size")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--spp", type=int, default=8,
                        help="max samples per pixel")
    parser.add_argument("--ksize", type=int, default=21,
                        help="kernel size for the predicted kernels")
    parser.add_argument("--lbf_mode", action="store_true",
                        help="train the LBF learned-bilateral-filter "
                        "baseline [Kalantari2015] instead of SBMC")
    parser.add_argument("--lbf_window_r", type=int, default=8,
                        help="LBF filter window radius")
    parser.add_argument("--kpcn_mode", action="store_true",
                        help="train the [Bako2017] KPCN baseline")
    parser.add_argument("--kpcn_depth", type=int, default=9,
                        help="KPCN conv depth (valid convs consume a "
                        "4*depth pixel border)")
    parser.add_argument("--kpcn_width", type=int, default=100)
    parser.add_argument("--gather", action="store_true",
                        help="ablation: use gather kernels instead of splat")
    parser.add_argument("--pixel", action="store_true",
                        help="ablation: collapse samples to a 1-spp image")
    parser.add_argument("--constant_spp", dest="randomize_spp",
                        action="store_false", default=True,
                        help="disable randomized sample count")
    parser.add_argument("--dont_use_coords", action="store_true")
    parser.add_argument("--dont_use_gbuffer", action="store_true")
    parser.add_argument("--dont_use_p", action="store_true")
    parser.add_argument("--dont_use_ld", action="store_true")
    parser.add_argument("--dont_use_bt", action="store_true")
    parser.add_argument("--num_worker_threads", type=int, default=4)
    parser.add_argument("--device_reservoir", type=int, default=0,
                        help="hold this many preprocessed tiles in HBM and "
                        "sample batches on device (kills the per-step host "
                        "stack+upload cost; single-device sbmc/lbf only). "
                        "0 disables.")
    parser.add_argument("--trust_reservoir", action="store_true",
                        help="accepted no-op: the reservoir is validated "
                        "on chip (round-5 A/B, results/ab_r5) and is "
                        "used whenever --device_reservoir is set.")
    parser.add_argument("--trust_bf16", action="store_true",
                        help="accepted no-op: bf16 training is validated "
                        "on chip (round-5 A/B, results/ab_r5).")
    parser.add_argument("--refresh_every", type=int, default=2,
                        help="refresh one reservoir slot every N steps. "
                        "Each refresh stages a ~26 MB h2d transfer whose "
                        "host staging memory the axon tunnel client does "
                        "not promptly return (~25 MB/s RSS growth at "
                        "refresh_every=1: the 2026-08-20 17:56 OOM kill "
                        "at 130 GB after ~90 min). N=2 halves the leak "
                        "rate; long runs should also be segmented with "
                        "checkpoint resume (scripts/run_round5.sh).")
    parser.add_argument("--no_cache_ram", dest="cache_ram",
                        action="store_false", default=True,
                        help="disable the RAM cache of preprocessed tiles "
                        "(the cache makes epochs 2+ host-side work a single "
                        "array stack; disable on small-memory hosts).")
    parser.add_argument("--log_interval", type=int, default=100)
    parser.add_argument("--checkpoint_interval", type=int, default=1000)
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize conv activations in the backward"
                        " pass (larger batches at the cost of recompute)")
    parser.add_argument("--bf16", action="store_true",
                        help="run the conv stacks in bfloat16 (MXU-native; "
                        "params and the splat path stay float32)")
    parser.add_argument("--profile_port", type=int, default=None,
                        help="start a jax.profiler server on this port")
    parser.add_argument("--verbose", action="store_true")
    main(parser.parse_args())

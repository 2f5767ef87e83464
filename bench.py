#!/usr/bin/env python
"""Headline benchmark: full-frame 1080p denoise throughput at 4 spp on one
chip (the BASELINE.json north-star metric), using the reference's tiled
inference protocol (scripts/denoise.py: overlap-tiled full frames).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Timing methodology (tunnel-proof): on the remote/tunneled TPU backends,
``jax.block_until_ready`` does not fence device execution and a host fetch
carries a large fixed round-trip latency. So one *frame* (all overlap
tiles, via ``lax.map``) is a single compiled dispatch, K frames are chained
inside one jit by a ``lax.scan`` whose carry feeds back into the frame
input (defeating loop-invariant code motion), and the per-frame time is the
wall-clock *difference* between a (1+K)-frame chain and a 1-frame chain —
the fixed dispatch/fetch overhead cancels.

The reference repo publishes no numbers (BASELINE.md), so ``vs_baseline``
is computed against a documented estimate of the reference CUDA/Halide
pipeline on a V100: the SBMC paper reports multi-second full-frame denoises
at 1080p-class resolutions; we use 0.5 frames/s as the V100 reference
point. This constant is an estimate, recorded here for transparency (and in
the emitted JSON as ``baseline_estimate``).
"""

import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
from sbmc_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


V100_BASELINE_FPS = 0.5  # documented estimate, see module docstring

# Benchmark configuration: flagship model, reference demo-scale inputs.
# (Env overrides exist so the harness logic can be smoke-tested on CPU.)
H = int(os.environ.get("SBMC_BENCH_H", 1080))
W = int(os.environ.get("SBMC_BENCH_W", 1920))
SPP = int(os.environ.get("SBMC_BENCH_SPP", 4))
N_FEATURES = 93         # all sample features enabled (sbmc mode)
N_GLOBAL = 3
def _parse_tile(v):
    # "768" -> 768, "1216x768" -> (1216, 768)
    if not v:
        return None
    if "x" in v:
        a, b = v.split("x")
        return (int(a), int(b))
    return int(v) or None


TILE_SIZE = _parse_tile(os.environ.get("SBMC_BENCH_TILE", ""))
TILE_PAD = _parse_tile(os.environ.get("SBMC_BENCH_PAD", ""))
ITERS = int(os.environ.get("SBMC_BENCH_ITERS", 4))
KSIZE = int(os.environ.get("SBMC_BENCH_KSIZE", 21))
# "sbmc" (flagship Multisteps) or "kpcn" (Bako2017 per-pixel baseline) —
# both headline configs from BASELINE.md.
MODEL = os.environ.get("SBMC_BENCH_MODEL", "sbmc")


def _fmt_tile(v):
    return f"{v[0]}x{v[1]}" if isinstance(v, tuple) else str(v)


def _pair2(v):
    return v if isinstance(v, tuple) else (v, v)


def _ladder_main(ladder):
    """Try each ladder rung in a FRESH subprocess.

    On the tunneled TPU backend one real failure (e.g. an OOM at a large
    tile) poisons the whole process: every subsequent device call — even a
    PRNGKey allocation — returns RESOURCE_EXHAUSTED (measured 2026-08-17).
    An in-process try/except fallback therefore can never salvage a
    number; each rung must start clean.
    """
    rung_timeout = int(os.environ.get("SBMC_BENCH_RUNG_TIMEOUT", 2700))
    # Pre-probe: with a wedged tunnel every rung hangs to its timeout
    # (hours before the fallback fires). A trivial jit probe in a fresh
    # subprocess settles device health in minutes.
    probe_timeout = int(os.environ.get("SBMC_BENCH_PROBE_TIMEOUT", 420))
    tunnel_ok = True
    if probe_timeout > 0:
        try:
            pr = subprocess.run(
                [sys.executable, "-c",
                 "from sbmc_tpu.utils.platform import honor_env_platform;"
                 "honor_env_platform();"
                 "import jax, jax.numpy as jnp;"
                 "x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)));"
                 "assert float(x) == 128.0 ** 3, float(x)"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                timeout=probe_timeout, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            tunnel_ok = pr.returncode == 0
        except subprocess.TimeoutExpired:
            tunnel_ok = False
    if not tunnel_ok:
        print("# device probe failed; skipping live rungs",
              file=sys.stderr)
    for i, (tile_size, tile_pad) in enumerate(
            ladder if tunnel_ok else []):
        if not isinstance(tile_size, tuple):
            tile_pad = min(tile_pad, tile_size // 4)
        env = dict(os.environ)
        env["SBMC_BENCH_TILE"] = _fmt_tile(tile_size)
        env["SBMC_BENCH_PAD"] = _fmt_tile(tile_pad)
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, timeout=rung_timeout)
        except subprocess.TimeoutExpired:
            # A wedged tunnel hangs device calls indefinitely; without
            # this the whole ladder would hang on rung 1 forever.
            print(f"# tile {tile_size} timed out after {rung_timeout}s "
                  "(tunnel wedged?)", file=sys.stderr)
            continue
        line = next((ln for ln in reversed(p.stdout.splitlines())
                     if ln.startswith("{")), None)
        if p.returncode == 0 and line:
            print(line)
            return
        tail = (p.stderr or "").strip().splitlines()[-3:]
        print(f"# tile {tile_size} failed (rc={p.returncode}): "
              + " | ".join(tail)[-300:], file=sys.stderr)
    # Every rung failed — almost always a dead/wedged tunnel, not a real
    # perf regression. Surface the last HEALTHY measurement, clearly
    # labeled as such, so the artifact is not just an empty rc=1.
    self_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_SELF.json")
    # The self-record holds the flagship (sbmc, 4 spp) number only.
    if MODEL == "sbmc" and SPP == 4 and os.path.exists(self_path):
        with open(self_path) as f:
            rec = json.load(f)
        print(json.dumps({
            "metric": rec["metric"], "value": rec["value"],
            "unit": rec["unit"], "vs_baseline": rec["vs_baseline"],
            "baseline_estimate": True, "live": False, "stale": True,
            "measured_at": rec.get("measured_at", rec.get("recorded", "?")),
            "note": "all live rungs failed (TPU tunnel down); value is "
                    "the last healthy on-chip run from BENCH_SELF.json",
        }))
        sys.exit(0)
    sys.exit(1)


def main():
    import jax
    import jax.numpy as jnp
    from sbmc_tpu.models import Multisteps
    from sbmc_tpu.parallel.tiles import merge_tiles_uniform, \
        split_tiles_uniform

    # bf16 inference is the default: conv activations and the kernel-logit
    # stream in bfloat16 with f32 accumulation everywhere (MXU-native, and
    # it halves the two dominant HBM streams). Validated against f32 on
    # chip at 512^2/k21: 84.5 dB PSNR, mean relative error 5e-5 — orders of
    # magnitude below the denoiser's own error. Set SBMC_BENCH_F32=1 for
    # the full-f32 run (0.765 vs 0.99 frames/s at 1080p, 2026-08-17).
    f32 = bool(os.environ.get("SBMC_BENCH_F32"))
    conv_dtype = None if f32 else "bfloat16"
    kernel_dtype = None if f32 else "bfloat16"
    if MODEL == "kpcn":
        from sbmc_tpu.models import KPCN
        model = KPCN(ksize=KSIZE, conv_dtype=conv_dtype)
    else:
        model = Multisteps(n_features=N_FEATURES, n_global_features=N_GLOBAL,
                           ksize=KSIZE, conv_dtype=conv_dtype,
                           kernel_dtype=kernel_dtype)

    def run(tile_size, tile_pad):
        th, tw = tile_size if isinstance(tile_size, tuple) else (
            tile_size, tile_size)
        # Geometry from the uniform-tile splitter (cheap dummy frame — the
        # benchmark content is random anyway, and generating tile inputs
        # *on device, inside the frame* avoids both a multi-GB host->device
        # upload (which a tunneled TPU link cannot sustain) and holding the
        # whole frame's tile stack in HBM. Generating a tile's input is one
        # HBM write pass, i.e. the same traffic the reference pays to read
        # its resident input, so the protocol stays comparable.
        dummy = {"features": np.zeros((1, 1, 1, H, W), np.float32)}
        _, info = split_tiles_uniform(dummy, tile=tile_size, pad=tile_pad)
        n_tiles = info["ny"] * info["nx"]

        def make_tile(key):
            ks = jax.random.split(key, 5)
            if MODEL == "kpcn":
                return {
                    "kpcn_diffuse_in": jax.random.uniform(
                        ks[0], (1, 27, th, tw)),
                    "kpcn_specular_in": jax.random.uniform(
                        ks[1], (1, 27, th, tw)),
                    "kpcn_diffuse_buffer": jax.random.uniform(
                        ks[2], (1, 3, th, tw)),
                    "kpcn_specular_buffer": jax.random.uniform(
                        ks[3], (1, 3, th, tw)),
                    "kpcn_albedo": jax.random.uniform(ks[4], (1, 3, th, tw)),
                }
            # The feature stream is generated in the conv compute dtype:
            # in bf16 mode the model reads features as bf16 anyway, so a
            # bf16-resident input halves the dominant synthetic-input HBM
            # write (mirroring a bf16-resident tile stack; the loader
            # already ships features half-precision, data/loader.py). The
            # splat radiance path stays float32.
            fdt = jnp.float32 if f32 else jnp.bfloat16
            return {
                "radiance": jax.random.uniform(
                    ks[0], (1, SPP, 3, th, tw)),
                "features": jax.random.uniform(
                    ks[1], (1, SPP, N_FEATURES, th, tw), dtype=fdt),
                "global_features": jax.random.uniform(
                    ks[2], (1, N_GLOBAL, 1, 1)),
            }

        shapes = jax.eval_shape(make_tile, jax.random.PRNGKey(1))

        # Params are spatial-size independent; init on a tiny tile — a
        # full-size init runs the whole model eagerly (unfused) and can
        # OOM the chip before the benchmark even starts. (64 px: KPCN's
        # nine valid 5x5 convs consume a 36-px border.)
        def _tiny(s):
            return s[:-2] + (min(s[-2], 64), min(s[-1], 64))
        params = model.init(jax.random.PRNGKey(0), {
            k: np.zeros(_tiny(v.shape), np.float32)
            for k, v in shapes.items()})

        def frame(params, key):
            # One frame = all overlap tiles, sequentially on-device (lax.map
            # bounds peak HBM to one tile's working set).
            def tile_fn(k):
                return model.apply(params, make_tile(k))["radiance"][0]
            return jax.lax.map(tile_fn, jax.random.split(key, n_tiles))

        @functools.partial(jax.jit, static_argnames="k")
        def chain(params, key, k):
            def body(carry, _):
                i, acc, _prev = carry
                # Per-frame key depends on the carry -> no loop hoisting.
                outs = frame(params, jax.random.fold_in(key, i))
                return (i + 1, acc + jnp.mean(outs), outs), None
            crop = 36 if MODEL == "kpcn" else KSIZE - 1  # KPCN: 9 valid 5x5s
            (_, acc, outs), _ = jax.lax.scan(
                body, (jnp.int32(0), jnp.float32(0),
                       jnp.zeros((n_tiles, 3, th - crop, tw - crop))),
                None, length=k)
            return acc, outs

        def timed(k):
            t0 = time.perf_counter()
            acc, _ = chain(params, jax.random.PRNGKey(2), k)
            float(acc)
            return time.perf_counter() - t0

        # Compile both chain lengths, then correctness-check the stitched
        # frame from the 1-chain before timing.
        timed(1)
        acc, outs = chain(params, jax.random.PRNGKey(2), 1)
        outs = np.asarray(outs)
        assert np.isfinite(outs).all()
        merged = merge_tiles_uniform(outs, info)
        assert merged.shape[-2:] == (H, W)
        timed(1 + ITERS)     # compile (1+K)-chain
        t1 = min(timed(1) for _ in range(2))
        t2 = timed(1 + ITERS)
        return max(t2 - t1, 1e-9) / ITERS, n_tiles

    # Single-rung mode: SBMC_BENCH_TILE is set (by a user, or by
    # _ladder_main's subprocess). Any failure propagates as a non-zero
    # exit for the parent ladder to see.
    if isinstance(TILE_SIZE, tuple):
        pad = TILE_PAD or (TILE_SIZE[0] // 4, TILE_SIZE[1] // 4)
    else:
        # Only the DERIVED default is clamped; an explicit SBMC_BENCH_PAD
        # is honored as-is (e.g. a 44-px receptive-field pad on a 160 tile).
        pad = TILE_PAD if TILE_PAD else TILE_SIZE // 4
    # Clamp oversized rungs to the padded frame (a 1216x768 strip on a
    # small smoke-test frame would otherwise compute a mostly-zero giant
    # tile); at 1080p the default strip is exactly 1080 + 2*68 so this is
    # the identity there.
    (th_, tw_), (py_, px_) = _pair2(TILE_SIZE), _pair2(pad)
    tile = (min(th_, H + 2 * py_), min(tw_, W + 2 * px_))
    dt, n_tiles = run(tile, pad)
    used_tile = (tile, pad)

    fps = 1.0 / dt
    print(json.dumps({
        "metric": f"1080p_{SPP}spp_denoise_frames_per_sec_per_chip" if
        MODEL == "sbmc" else
        "1080p_kpcn_denoise_frames_per_sec_per_chip",
        "model": MODEL,
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / V100_BASELINE_FPS, 3),
        # The reference publishes no numbers (BASELINE.md); 0.5 fps is a
        # documented estimate of the V100 CUDA/Halide pipeline, not a
        # measurement.
        "baseline_estimate": True,
        "baseline_fps": V100_BASELINE_FPS,
        "tile": used_tile,
        "n_tiles": n_tiles,
        "resolution": [H, W],
        "spp": SPP,
        "frame_seconds": round(dt, 4),
    }))


# Pad must exceed the model's receptive-field radius (~43 px: U-Net
# pyramid ~33 + splat halo 10); beyond that, smaller pads cut the
# overlap overhead (reprocessed area = (tile/(tile-2*pad))^2: 1.44x at
# 768/64 vs 4x at the reference's 1024/256).
# Full-height rectangular strips reprocess fewer pixels than the square
# grid (2 strips of 1184x1056/52x48 = 2.50M px, 3 strips of
# 1216x768/68x64 = 2.80M px, 6 tiles of 768^2 = 3.54M, for a 2.07M-px
# frame). Horizontal full-width strips 640x2048/50x64 are the measured
# best (1.3646 fps, 2026-08-17): 2048 is a multiple of the splat
# kernels' widest lane tile, so no padded-column waste, vs 1056 -> 1152
# (vertical 2-strip, 1.2537 fps) and the extra conv work of the
# 3-strip grid (1.2378 fps). Larger single tiles OOM at bf16
# (1216x2048) and can crash the tunnel's remote compile helper (memory:
# tpu-tunnel-behavior), so they are not laddered.
# Rung order = preference order (_ladder_main returns the first rung
# that runs). Geometry arithmetic (split_tiles_uniform: stride =
# tile - 2*pad, ny = ceil((H - 2*py)/stride_y)): at 1080p with pad
# (50, 64) the padded SINGLE tile (1080, 2048) covers the frame in one
# dispatch at 1.066x processed pixels -- vs 1.26x for the previous
# 2-strip (640, 2048) champion. Exact-cover rungs (stride dividing
# 980 x 1792) follow, then the round-2/3 measured geometries as
# fallbacks for OOM/regression.
_DEFAULT_LADDER = [((1080, 2048), (50, 64)), ((1080, 1088), (50, 64)),
                   ((640, 2048), (50, 64)), ((1184, 1056), (52, 48)),
                   ((1216, 768), (68, 64)), (768, 64), (512, 64), (256, 64)]

# Variable-spp inference rungs (BASELINE.md: 8/16/32 spp). The per-tile
# sample stream scales linearly with spp ([1, spp, 93, th, tw] f32), so
# tile areas shrink ~1/spp from the 4-spp geometry to keep the same HBM
# footprint; widths stay multiples of 256 so the splat kernels' lane
# tiling pads no columns.
_SPP_LADDERS = {
    8: [((1080, 2048), (50, 64)), ((640, 2048), (50, 64)),
        ((640, 1024), (50, 64)), ((320, 2048), (50, 64)), (512, 64),
        (256, 64)],
    16: [((590, 1024), (50, 64)), ((640, 1024), (50, 64)),
         ((320, 1024), (50, 64)), ((640, 512), (50, 64)), (384, 64),
         (256, 64)],
    # 32 spp: the f32 sample stream capped tiles at 320x512 (1.98x
    # processed px, the worst overlap of any rung -- round-4 VERDICT
    # weak #4); the bf16 feature stream doubles the area budget, and
    # exact-cover strides (490x896 | 980x1792) cut reprocessing to
    # 1.17-1.31x.
    32: [((590, 1024), (50, 64)), ((590, 576), (50, 64)),
         ((370, 768), (50, 64)), ((320, 512), (50, 64)), (256, 64),
         (192, 48)],
}

# KPCN's inputs are per-pixel (27ch, no per-sample stream), so a single
# full-frame tile fits: zero overlap waste. Receptive field = 18 px conv
# shrink + 10 px gather radius => 40-px pad is safe.
_KPCN_LADDER = [((1160, 2000), (40, 40)), ((640, 2048), (40, 64)),
                ((1184, 1056), (40, 48)), (768, 40), (512, 40), (256, 40)]


if __name__ == "__main__":
    if TILE_SIZE:
        main()          # single rung (set by a user or by _ladder_main)
    elif MODEL == "kpcn":
        _ladder_main(_KPCN_LADDER)
    else:
        _ladder_main(_SPP_LADDERS.get(SPP, _DEFAULT_LADDER))

#!/bin/bash
# Round-4 mid-window rebalance: cap the train corpus at CUT_SCENES and
# hand the reclaimed time to the long flagship training leg.
#
# Why: the fresh-VM session driver budgeted 11700s (until ~06:32) for
# phase-1 datagen; with the tail reserve (baselines/evals/frame/ladder/
# bench ~= 12900s) that left the long training leg -- VERDICT round-3
# item #1, "tens of thousands of steps, not 1.3k" -- only ~70 min of
# the 13:00 window. Scene seeds are deterministic by index, so a
# 200-scene corpus is a strict prefix of the 320-scene one and the
# committed step-504 weights warm-start as a true continuation. This
# script waits for the cut point (scene count or deadline), kills the
# phase-1 driver by PID parentage (never by command-line pattern), runs
# the session driver's remaining phases (test corpus, 1080p frame,
# warm-start), and execs the takeover driver with SCENES_EXT=0 so the
# corpus-growth phase no-ops.
#
# Usage: OLD_DRIVER_PID=2274 UNTIL=$(date -d 'today 13:00' +%s) \
#        nohup bash scripts/run_round4_cut.sh >> .hwlog/cut.log 2>&1 &
set -u
cd "${REPO:-$(dirname "$0")/..}"
LOG=${LOG:-.hwlog}
QDIR=${QDIR:-.qrun}
UNTIL=${UNTIL:?set UNTIL (epoch seconds)}
OLD_DRIVER_PID=${OLD_DRIVER_PID:?set OLD_DRIVER_PID (phase-1 session driver)}
CUT_SCENES=${CUT_SCENES:-200}
CUT_AT=${CUT_AT:?set CUT_AT (epoch seconds; cut even if scene count short)}
TEST_SCENES=${TEST_SCENES:-16}
TEST_GT_SPP=${TEST_GT_SPP:-512}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-120}
PROBE_SLEEP=${PROBE_SLEEP:-1200}
DG_FLAGS="--obj_dir assets/objs --tex_dir assets/textures --env_dir assets/envmaps"
mkdir -p "$LOG" "$QDIR" weights

logln() { echo "$(date +%T) cut: $*" >> "$LOG/driver.log"; }

probe() {
    timeout "$PROBE_TIMEOUT" python - <<'EOF'
from sbmc_tpu.utils.platform import honor_env_platform; honor_env_platform()
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))
assert float(x) == 256.0 ** 3, float(x)
print("probe ok")
EOF
}

wait_healthy() {
    until probe >> "$LOG/driver.log" 2>&1; do
        if [ "$(date +%s)" -ge "$UNTIL" ]; then
            logln "window closed while waiting for the tunnel"
            exit 0
        fi
        logln "tunnel wedged; sleeping ${PROBE_SLEEP}s"
        sleep "$PROBE_SLEEP"
    done
    logln "TPU healthy"
}

clean_partial() {
    local dir="$1" want="$2"
    [ -d "$dir" ] || return 0
    for d in "$dir"/scene_*; do
        [ -d "$d" ] || continue
        n=$(ls "$d"/*.bin 2>/dev/null | wc -l)
        [ "$n" -ne "$want" ] && { logln "rm partial $d ($n tiles)"; rm -rf "$d"; }
    done
}

logln "armed: cut at ${CUT_SCENES} scenes or $(date -d @$CUT_AT +%T)"

# --- 0. wait for the cut point ------------------------------------------------
while :; do
    have=$(ls -d "$QDIR/train"/scene_* 2>/dev/null | wc -l)
    now=$(date +%s)
    [ "$have" -ge "$CUT_SCENES" ] && { logln "cut: $have scenes"; break; }
    [ "$now" -ge "$CUT_AT" ] && { logln "cut: deadline ($have scenes)"; break; }
    # If the old driver already died/advanced on its own, cut immediately.
    kill -0 "$OLD_DRIVER_PID" 2>/dev/null || { logln "old driver gone"; break; }
    sleep 60
done

# --- 1. stop the phase-1 driver tree by PID parentage --------------------------
if kill -0 "$OLD_DRIVER_PID" 2>/dev/null; then
    tk=$(pgrep -P "$OLD_DRIVER_PID" || true)
    py=""
    for t in $tk; do py="$py $(pgrep -P "$t" || true)"; done
    logln "killing old driver $OLD_DRIVER_PID (children: $tk$py)"
    kill "$OLD_DRIVER_PID" 2>/dev/null
    sleep 2
    for p in $tk $py; do kill "$p" 2>/dev/null; done
    sleep 10
    for p in $OLD_DRIVER_PID $tk $py; do kill -9 "$p" 2>/dev/null; done
    sleep 5
fi
clean_partial "$QDIR/train" 4
logln "train corpus frozen at $(ls -d "$QDIR/train"/scene_* | wc -l) scenes"

# --- 2. held-out test corpus (gt 512, 32 spp recorded) -------------------------
TEST_DEADLINE=$(( $(date +%s) + 3600 ))
while :; do
    clean_partial "$QDIR/test" 4
    have=$(ls -d "$QDIR/test"/scene_* 2>/dev/null | wc -l)
    [ "$have" -ge "$TEST_SCENES" ] && break
    left=$(( TEST_DEADLINE - $(date +%s) ))
    [ "$left" -lt 120 ] && break
    wait_healthy
    logln "datagen test: $have/$TEST_SCENES scenes (${left}s left)"
    timeout "$left" python scripts/generate_training_data.py - - - \
        "$QDIR/test" --renderer wavefront --count $(( TEST_SCENES - have )) \
        --spp 32 --gt_spp "$TEST_GT_SPP" --width 256 --height 256 \
        --tile_size 128 --start_index $(( 100000 + have )) $DG_FLAGS \
        >> "$LOG/datagen.log" 2>&1
    rc=$?
    logln "datagen test rc=$rc"
    [ "$rc" -eq 124 ] && break
    [ "$rc" -ne 0 ] && { sleep 60; wait_healthy; }
done

# --- 3. one real 1920x1152 frame (135 tiles, 8 spp recorded) -------------------
for attempt in 1 2; do
    nf=$(ls "$QDIR/frame1080/scene_00000"/*.bin 2>/dev/null | wc -l)
    [ "$nf" -eq 135 ] && break
    [ "$(( UNTIL - $(date +%s) ))" -lt 14400 ] && break
    rm -rf "$QDIR/frame1080/scene_00000"
    wait_healthy
    timeout 2400 python scripts/generate_training_data.py - - - \
        "$QDIR/frame1080" --renderer wavefront --count 1 --spp 8 \
        --gt_spp 8 --width 1920 --height 1152 --tile_size 128 \
        $DG_FLAGS >> "$LOG/datagen.log" 2>&1
    logln "real-frame render rc=$? (attempt $attempt)"
done

# --- 4. warm-start the flagship ckpt from the committed snapshot ----------------
if [ ! -d "$QDIR/ckpt" ] && [ -f weights/flagship_f16/params_f16.msgpack ]
then
    python scripts/export_params.py import weights/flagship_f16 \
        "$QDIR/ckpt" >> "$LOG/driver.log" 2>&1
    cp -f weights/flagship_f16/train_log.csv "$QDIR/ckpt/train_log.csv" \
        2>/dev/null
    logln "warm-started ckpt from weights/flagship_f16"
fi

# --- 5. hand off with the corpus-growth phase disabled --------------------------
logln "handing off to takeover driver (SCENES_EXT=0)"
export SCENES_EXT=0
exec bash scripts/run_round4_takeover.sh

#!/bin/bash
# TPU tunnel health watcher: probes a real matmul every PROBE_SLEEP
# seconds and appends one status line per probe to $OUT. Run in the
# background; `tail -1 $OUT` answers "is the chip usable right now?".
set -u
OUT=${OUT:-.hwlog/tpu_health.log}
PROBE_SLEEP=${PROBE_SLEEP:-180}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-120}
cd "${REPO:-$(dirname "$0")/..}"
mkdir -p "$(dirname "$OUT")"
while true; do
    if timeout "$PROBE_TIMEOUT" python - <<'EOF' >/dev/null 2>&1
from sbmc_tpu.utils.platform import honor_env_platform; honor_env_platform()
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))
assert float(x) == 256.0 ** 3, float(x)
EOF
    then
        echo "$(date +%F' '%T) HEALTHY" >> "$OUT"
    else
        echo "$(date +%F' '%T) WEDGED" >> "$OUT"
    fi
    sleep "$PROBE_SLEEP"
done

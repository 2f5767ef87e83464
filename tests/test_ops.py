"""Tests for the splat/gather operators.

Ports the semantics of the reference op tests (reference:
tests/test_functions.py): exhaustive delta-function forward checks, manual
backward checks, finite-difference gradcheck, and the scatter2gather
transpose rule — plus Pallas-vs-oracle equivalence, which plays the role the
reference's dual CPU/CUDA Halide schedules play (one algorithm validating the
other backend).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbmc_tpu import ops
from sbmc_tpu.ops import reference

# Interpret-mode Pallas runs are orders of magnitude slower than the XLA
# oracle on this 1-core host; they carry the kernel-logic coverage, so they
# stay in the suite but behind the "slow" marker (make test-slow).
BACKENDS = ["xla",
            pytest.param("pallas_interpret", marks=pytest.mark.slow)]


def _impulse(bs, c, h, w, y, x, val=1.0):
    d = np.zeros((bs, c, h, w), np.float32)
    d[:, :, y, x] = val
    return d


# ---------------------------------------------------------------------------
# kernel_weighting forward
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("backend", BACKENDS)
def test_kernel_weighting_impulse_all_offsets(backend):
    """A single weight at tap (dy, dx) must fetch data from the offset pixel
    (reference: tests/test_functions.py:43-70)."""
    k, h, w, c = 5, 12, 13, 3
    o = (k - 1) // 2
    y0, x0 = 6, 6
    data = np.random.RandomState(0).randn(1, c, h, w).astype(np.float32)
    for dy in range(k):
        for dx in range(k):
            wts = np.zeros((1, k * k, h, w), np.float32)
            wts[0, dy * k + dx, y0, x0] = 1.0
            out, sum_w = ops.kernel_weighting(
                jnp.array(data), jnp.array(wts), backend=backend)
            out = np.array(out)
            sum_w = np.array(sum_w)
            expected = data[0, :, y0 + dy - o, x0 + dx - o]
            assert np.allclose(out[0, :, y0, x0], expected, atol=1e-5), \
                (dy, dx)
            # Output is zero everywhere else.
            out[0, :, y0, x0] = 0.0
            assert np.abs(out).max() == 0.0
            assert np.isclose(sum_w[0, y0, x0], 1.0)


@pytest.mark.parametrize("backend", BACKENDS)
def test_kernel_weighting_boundary_zero(backend):
    """Out-of-bounds taps read zeros, but sum_w still counts the weight
    (the homogeneous channel is not zero-padded in the reference)."""
    k, h, w = 5, 8, 8
    data = np.ones((1, 3, h, w), np.float32)
    wts = np.zeros((1, k * k, h, w), np.float32)
    wts[0, 0, 0, 0] = 2.0  # tap (dy=0, dx=0) at pixel (0,0) reads (-2,-2)
    out, sum_w = ops.kernel_weighting(
        jnp.array(data), jnp.array(wts), backend=backend)
    assert np.abs(np.array(out)).max() == 0.0
    assert np.isclose(np.array(sum_w)[0, 0, 0], 2.0)


@pytest.mark.parametrize("backend", BACKENDS)
def test_kernel_weighting_sum_w(backend, rng):
    k, h, w = 3, 16, 16
    wts = rng.randn(2, k * k, h, w).astype(np.float32)
    data = rng.randn(2, 3, h, w).astype(np.float32)
    _, sum_w = ops.kernel_weighting(
        jnp.array(data), jnp.array(wts), backend=backend)
    assert np.allclose(np.array(sum_w), wts.sum(1), atol=1e-5)


# ---------------------------------------------------------------------------
# scatter2gather
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("k", [3, 5, 7, 9])
def test_scatter2gather_transpose_rule(backend, k):
    """Exhaustive tap/pixel check of the transpose rule (reference:
    tests/test_functions.py:164-185): weight at (y, x, dy, dx) moves to
    (y+dy-o, x+dx-o, k-1-dy, k-1-dx)."""
    o = (k - 1) // 2
    h = w = 2 * k + 3
    y0 = x0 = k + 1
    for dy in range(k):
        for dx in range(k):
            wts = np.zeros((1, k * k, h, w), np.float32)
            wts[0, dy * k + dx, y0, x0] = 1.0
            out = np.array(ops.scatter2gather(jnp.array(wts),
                                              backend=backend))
            yy, xx = y0 + dy - o, x0 + dx - o
            tap = (k - 1 - dy) * k + (k - 1 - dx)
            assert out[0, tap, yy, xx] == 1.0, (dy, dx)
            out[0, tap, yy, xx] = 0.0
            assert np.abs(out).max() == 0.0


@pytest.mark.parametrize("backend", BACKENDS)
def test_scatter2gather_involution(backend, rng):
    """Applying scatter2gather twice restores the original kernels for taps
    whose displaced location stays in-bounds (interior pixels)."""
    k, h, w = 5, 16, 16
    o = (k - 1) // 2
    wts = rng.randn(1, k * k, h, w).astype(np.float32)
    twice = np.array(ops.scatter2gather(
        ops.scatter2gather(jnp.array(wts), backend=backend),
        backend=backend))
    interior = (slice(None), slice(None), slice(2 * o, h - 2 * o),
                slice(2 * o, w - 2 * o))
    assert np.allclose(twice[interior], wts[interior], atol=1e-6)


@pytest.mark.parametrize("backend", BACKENDS)
def test_scatter2gather_preserves_splat_semantics(backend, rng):
    """kernel_weighting(data, s2g(w)) realizes true splatting: each source
    pixel scatters data through its own kernel (reference: the model applies
    splat kernels via this exact pre-transposition, sbmc/modules.py:425)."""
    k, h, w = 3, 10, 10
    o = (k - 1) // 2
    # A single source pixel splats its value over its neighborhood.
    data = _impulse(1, 3, h, w, 5, 5, val=2.0)
    wts = np.zeros((1, k * k, h, w), np.float32)
    wts[0, :, 5, 5] = np.arange(k * k) + 1.0
    gathered = ops.scatter2gather(jnp.array(wts), backend=backend)
    out, _ = ops.kernel_weighting(jnp.array(data), gathered, backend=backend)
    out = np.array(out)
    for dy in range(k):
        for dx in range(k):
            val = 2.0 * (dy * k + dx + 1.0)
            assert np.isclose(out[0, 0, 5 + dy - o, 5 + dx - o], val)


# ---------------------------------------------------------------------------
# gradients
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("backend", BACKENDS)
def test_kernel_weighting_manual_backward(backend):
    """An impulse in d_output distributes d_data over the kernel footprint
    and d_weights = data * grad (reference: tests/test_functions.py:72-103).
    """
    k, h, w, c = 3, 8, 8, 3
    o = (k - 1) // 2
    rng = np.random.RandomState(1)
    data = rng.randn(1, c, h, w).astype(np.float32)
    wts = rng.randn(1, k * k, h, w).astype(np.float32)

    def f(d, wt):
        out, sw = ops.kernel_weighting(d, wt, backend=backend)
        return out, sw

    (out, sw), vjp = jax.vjp(f, jnp.array(data), jnp.array(wts))
    d_out = np.zeros_like(np.array(out))
    y0, x0 = 4, 4
    d_out[0, :, y0, x0] = 1.0
    d_sw = np.zeros_like(np.array(sw))
    d_data, d_weights = vjp((jnp.array(d_out), jnp.array(d_sw)))
    d_data, d_weights = np.array(d_data), np.array(d_weights)

    # d_data: weight w[i, y0, x0] lands at the source pixel of tap i.
    for dy in range(k):
        for dx in range(k):
            yy, xx = y0 + dy - o, x0 + dx - o
            expected = wts[0, dy * k + dx, y0, x0] * c  # same for all c chans
            assert np.isclose(d_data[0, :, yy, xx].sum(), expected,
                              atol=1e-4), (dy, dx)
    # d_weights at (y0, x0): sum_c data at the tap's source pixel.
    for dy in range(k):
        for dx in range(k):
            yy, xx = y0 + dy - o, x0 + dx - o
            expected = data[0, :, yy, xx].sum()
            assert np.isclose(d_weights[0, dy * k + dx, y0, x0], expected,
                              atol=1e-4)


@pytest.mark.parametrize("backend", BACKENDS)
def test_kernel_weighting_gradcheck(backend, rng):
    """Finite-difference gradcheck (reference: tests/test_functions.py:105-144,
    eps=1e-4, atol=5e-2). Checks VJPs for data and weights, including the
    sum_w output path."""
    k, h, w, c = 3, 6, 7, 2
    data = rng.randn(1, c, h, w).astype(np.float64).astype(np.float32)
    wts = rng.randn(1, k * k, h, w).astype(np.float32)
    ct_out = rng.randn(1, c, h, w).astype(np.float32)
    ct_sw = rng.randn(1, h, w).astype(np.float32)

    def scalar_fn(d, wt):
        out, sw = ops.kernel_weighting(d, wt, backend=backend)
        return jnp.sum(out * ct_out) + jnp.sum(sw * ct_sw)

    g_data, g_wts = jax.grad(scalar_fn, argnums=(0, 1))(
        jnp.array(data), jnp.array(wts))
    g_data, g_wts = np.array(g_data), np.array(g_wts)

    eps = 1e-3
    # Spot-check a random subset of coordinates with central differences.
    idx = [(0, rng.randint(c), rng.randint(h), rng.randint(w))
           for _ in range(20)]
    for i in idx:
        dp = data.copy(); dp[i] += eps
        dm = data.copy(); dm[i] -= eps
        fd = (scalar_fn(jnp.array(dp), jnp.array(wts)) -
              scalar_fn(jnp.array(dm), jnp.array(wts))) / (2 * eps)
        assert np.isclose(g_data[i], float(fd), atol=5e-2), i

    idx = [(0, rng.randint(k * k), rng.randint(h), rng.randint(w))
           for _ in range(20)]
    for i in idx:
        wp = wts.copy(); wp[i] += eps
        wm = wts.copy(); wm[i] -= eps
        fd = (scalar_fn(jnp.array(data), jnp.array(wp)) -
              scalar_fn(jnp.array(data), jnp.array(wm))) / (2 * eps)
        assert np.isclose(g_wts[i], float(fd), atol=5e-2), i


@pytest.mark.parametrize("backend", BACKENDS)
def test_scatter2gather_gradcheck(backend, rng):
    """s2g VJP is s2g itself (reference: tests/test_functions.py:187-208)."""
    k, h, w = 3, 6, 6
    wts = rng.randn(1, k * k, h, w).astype(np.float32)
    ct = rng.randn(1, k * k, h, w).astype(np.float32)

    def scalar_fn(wt):
        return jnp.sum(ops.scatter2gather(wt, backend=backend) * ct)

    g = np.array(jax.grad(scalar_fn)(jnp.array(wts)))
    expected = np.array(ops.scatter2gather(jnp.array(ct), backend="xla"))
    assert np.allclose(g, expected, atol=1e-5)


# ---------------------------------------------------------------------------
# Pallas vs oracle equivalence (the CPU-Halide-validates-CUDA role)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "k", [3, 5, pytest.param(21, marks=pytest.mark.slow)])
def test_pallas_matches_oracle_fwd(k, rng):
    bs, c, h, w = 2, 3, 24, 33
    data = rng.randn(bs, c, h, w).astype(np.float32)
    wts = rng.randn(bs, k * k, h, w).astype(np.float32)
    out_x, sw_x = ops.kernel_weighting(jnp.array(data), jnp.array(wts),
                                       backend="xla")
    out_p, sw_p = ops.kernel_weighting(jnp.array(data), jnp.array(wts),
                                       backend="pallas_interpret")
    assert np.allclose(np.array(out_x), np.array(out_p), atol=1e-4)
    assert np.allclose(np.array(sw_x), np.array(sw_p), atol=1e-4)


@pytest.mark.slow
def test_pallas_bf16_weights_fwd(rng):
    """bf16 weights with f32 data: the KPCN-inference path (conv chains emit
    bf16 softmax kernels, buffers stay f32). The Pallas kernel accumulates
    in f32; both outputs are f32."""
    k, bs, c, h, w = 5, 1, 3, 20, 28
    data = rng.randn(bs, c, h, w).astype(np.float32)
    wts16 = jnp.array(rng.rand(bs, k * k, h, w).astype(np.float32)
                      ).astype(jnp.bfloat16)
    out_p, sw_p = ops.kernel_weighting(jnp.array(data), wts16,
                                       backend="pallas_interpret")
    out_x, sw_x = ops.kernel_weighting(jnp.array(data),
                                       wts16.astype(jnp.float32),
                                       backend="xla")
    assert out_p.dtype == jnp.float32 and sw_p.dtype == jnp.float32
    assert np.allclose(np.array(out_x), np.array(out_p), atol=1e-4)
    assert np.allclose(np.array(sw_x), np.array(sw_p), atol=1e-4)
    g_p = ops.scatter2gather(wts16, backend="pallas_interpret")
    assert g_p.dtype == jnp.bfloat16
    g_x = ops.scatter2gather(wts16.astype(jnp.float32), backend="xla")
    assert np.allclose(np.array(g_p.astype(jnp.float32)), np.array(g_x))


@pytest.mark.parametrize(
    "k", [3, pytest.param(21, marks=pytest.mark.slow)])
def test_pallas_matches_oracle_s2g(k, rng):
    bs, h, w = 1, 17, 40
    wts = rng.randn(bs, k * k, h, w).astype(np.float32)
    out_x = ops.scatter2gather(jnp.array(wts), backend="xla")
    out_p = ops.scatter2gather(jnp.array(wts), backend="pallas_interpret")
    assert np.allclose(np.array(out_x), np.array(out_p), atol=1e-6)


def test_pallas_matches_oracle_bwd(rng):
    k, bs, c, h, w = 5, 1, 3, 16, 20
    data = rng.randn(bs, c, h, w).astype(np.float32)
    wts = rng.randn(bs, k * k, h, w).astype(np.float32)
    d_out = rng.randn(bs, c, h, w).astype(np.float32)
    d_sw = rng.randn(bs, h, w).astype(np.float32)

    grads = {}
    for backend in ["xla", "pallas_interpret"]:
        def f(d, wt):
            return ops.kernel_weighting(d, wt, backend=backend)
        _, vjp = jax.vjp(f, jnp.array(data), jnp.array(wts))
        grads[backend] = vjp((jnp.array(d_out), jnp.array(d_sw)))
    for a, b in zip(grads["xla"], grads["pallas_interpret"]):
        assert np.allclose(np.array(a), np.array(b), atol=1e-4)


def test_oracle_grad_matches_custom_vjp(rng):
    """The custom VJP must agree with the hand-derived reference math."""
    k, bs, c, h, w = 3, 2, 3, 9, 11
    data = rng.randn(bs, c, h, w).astype(np.float32)
    wts = rng.randn(bs, k * k, h, w).astype(np.float32)
    d_out = rng.randn(bs, c, h, w).astype(np.float32)
    d_sw = rng.randn(bs, h, w).astype(np.float32)

    _, vjp = jax.vjp(lambda d, wt: ops.kernel_weighting(d, wt, backend="xla"),
                     jnp.array(data), jnp.array(wts))
    d_data, d_weights = vjp((jnp.array(d_out), jnp.array(d_sw)))
    dd_ref, dw_ref = reference.kernel_weighting_grad_ref(
        jnp.array(data), jnp.array(wts), jnp.array(d_out), jnp.array(d_sw))
    assert np.allclose(np.array(d_data), np.array(dd_ref), atol=1e-5)
    assert np.allclose(np.array(d_weights), np.array(dw_ref), atol=1e-5)


@pytest.mark.parametrize("shape", [(5, 7), (3, 200), (130, 3), (8, 128)])
def test_pallas_small_and_odd_shapes(shape, rng):
    """Shapes below/straddling one tile exercise the halo padding math."""
    h, w = shape
    k = 3
    data = rng.randn(1, 2, h, w).astype(np.float32)
    wts = rng.randn(1, k * k, h, w).astype(np.float32)
    out_x, sw_x = ops.kernel_weighting(jnp.array(data), jnp.array(wts),
                                       backend="xla")
    out_p, sw_p = ops.kernel_weighting(jnp.array(data), jnp.array(wts),
                                       backend="pallas_interpret")
    assert np.allclose(np.array(out_x), np.array(out_p), atol=1e-5)
    s_x = ops.scatter2gather(jnp.array(wts), backend="xla")
    s_p = ops.scatter2gather(jnp.array(wts), backend="pallas_interpret")
    assert np.allclose(np.array(s_x), np.array(s_p), atol=1e-6)


def test_fused_update_interpret_small(rng):
    h, w, k = 6, 9, 3
    data = rng.randn(1, 3, h, w).astype(np.float32)
    wts = rng.randn(1, k * k, h, w).astype(np.float32)
    st = (jnp.zeros((1, 3, h, w)), jnp.zeros((1, 1, h, w)),
          jnp.full((1, 1, h, w), -1e30))
    a = ops.progressive_splat_update(jnp.array(data), jnp.array(wts), *st,
                                     backend="xla")
    b = ops.progressive_splat_update(jnp.array(data), jnp.array(wts), *st,
                                     backend="pallas_interpret")
    for x, y in zip(a, b):
        assert np.allclose(np.array(x), np.array(y), atol=1e-5)


@pytest.mark.parametrize("shape,k", [((10, 140), 3), ((33, 70), 5)])
def test_fused_full_update_matches_oracle(shape, k, rng):
    """The fully-fused progressive splat kernel (single HBM crossing,
    in-register online softmax) must match the composed oracle from any
    starting state, including across tile boundaries."""
    h, w = shape
    data = rng.randn(2, 3, h, w).astype(np.float32)
    wts = rng.randn(2, k * k, h, w).astype(np.float32)
    st = (jnp.array(rng.randn(2, 3, h, w), jnp.float32),
          jnp.array(np.abs(rng.randn(2, 1, h, w)), jnp.float32),
          jnp.array(rng.randn(2, 1, h, w), jnp.float32))
    a = ops.progressive_splat_update(jnp.array(data), jnp.array(wts), *st,
                                     backend="xla")
    b = ops.progressive_splat_update(jnp.array(data), jnp.array(wts), *st,
                                     backend="pallas_interpret")
    for x, y in zip(a, b):
        assert np.allclose(np.array(x), np.array(y), atol=2e-4), \
            np.abs(np.array(x) - np.array(y)).max()


@pytest.mark.parametrize("shape,k", [((10, 140), 3), ((18, 40), 5)])
def test_fused_backward_matches_oracle(shape, k, rng):
    """The fused progressive-splat backward (blocked-logits kernels) must
    match jax.grad through the composed XLA path, including boundary taps
    and tile crossings."""
    h, w = shape
    data = jnp.array(rng.randn(2, 3, h, w), jnp.float32)
    wts = jnp.array(rng.randn(2, k * k, h, w), jnp.float32)
    st = (jnp.array(rng.randn(2, 3, h, w), jnp.float32),
          jnp.array(np.abs(rng.randn(2, 1, h, w)), jnp.float32),
          jnp.array(rng.randn(2, 1, h, w), jnp.float32))
    ct = (jnp.array(rng.randn(2, 3, h, w), jnp.float32),
          jnp.array(rng.randn(2, 1, h, w), jnp.float32),
          jnp.array(rng.randn(2, 1, h, w), jnp.float32))

    def scalar(backend):
        def f(d, wt, s0, s1, s2):
            out = ops.progressive_splat_update(d, wt, s0, s1, s2,
                                               backend=backend)
            return sum(jnp.vdot(o, c) for o, c in zip(out, ct))
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(data, wts, *st)

    ga = scalar("xla")
    gb = scalar("pallas_interpret")
    for name, a, b in zip("data wts sum_r sum_w max_w".split(), ga, gb):
        assert np.allclose(np.array(a), np.array(b), atol=3e-4), \
            (name, float(jnp.abs(a - b).max()))


def test_psb_pick_tw_respects_vmem_budget():
    """The backward tile-width picker must keep the double-buffered
    blocked logits input + d_klogits output under the scoped-VMEM budget
    for every (width, k2, dtype) the flagship and bench configs use, and
    still prefer the TW that minimizes padded columns when several fit."""
    from sbmc_tpu.ops.pallas_kernels import _VMEM_LIMIT, _psb_pick_tw, \
        _round_up

    for w in (40, 160, 512, 1056, 1080, 2048):
        for k2 in (25, 441):
            for itemsize in (2, 4):
                tw = _psb_pick_tw(w, k2, itemsize)
                blocked = 2 * k2 * 32 * tw * (itemsize + 4)
                assert blocked <= int(0.85 * _VMEM_LIMIT), \
                    (w, k2, itemsize, tw, blocked)
    # Small k2 leaves headroom: the picker must then minimize padding
    # (w=1056 pads to 1152 at TW=128 but 1536 at TW=512).
    assert _round_up(1056, _psb_pick_tw(1056, 25, 4)) == 1152


def test_fused_update_exp2_variant_matches(rng, monkeypatch):
    """The SBMC_PALLAS_EXP2 lowering (exp(x) as exp2(x*log2 e), the
    on-chip A/B knob in scripts/tpu_session.py) must be numerically
    equivalent to the exp lowering — guard so flipping the default after
    a hardware win cannot change results."""
    from sbmc_tpu.ops import pallas_kernels

    h, w, k = 12, 40, 3
    data = jnp.array(rng.randn(1, 3, h, w), jnp.float32)
    wts = jnp.array(rng.randn(1, k * k, h, w), jnp.float32)
    st = (jnp.array(rng.randn(1, 3, h, w), jnp.float32),
          jnp.array(np.abs(rng.randn(1, 1, h, w)), jnp.float32),
          jnp.array(rng.randn(1, 1, h, w), jnp.float32))

    def run():
        # Fresh traces each call: the flag is read at trace time.
        return jax.jit(
            lambda d, wt, a, b, c: pallas_kernels
            .progressive_splat_fused_pallas(d, wt, a, b, c,
                                            interpret=True))(data, wts, *st)

    base = run()
    monkeypatch.setattr(pallas_kernels, "_USE_EXP2", True)
    alt = run()
    for x, y in zip(base, alt):
        assert np.allclose(np.array(x), np.array(y), atol=2e-5), \
            np.abs(np.array(x) - np.array(y)).max()


def test_fused_update_staged_variant_matches(rng):
    """The SBMC_PSF_STAGED tap-staging variant (lane-shifted logit slices
    written to an aligned VMEM scratch by the max pass and re-read
    aligned by the exp pass — the relayout A/B knob measured by
    scripts/tpu_session.py) must be bit-identical to the two-read
    baseline: it reorders no arithmetic, only the reads."""
    from sbmc_tpu.ops import pallas_kernels

    h, w, k = 12, 40, 5
    data = jnp.array(rng.randn(1, 3, h, w), jnp.float32)
    wts = jnp.array(rng.randn(1, k * k, h, w), jnp.float32)
    st = (jnp.array(rng.randn(1, 3, h, w), jnp.float32),
          jnp.array(np.abs(rng.randn(1, 1, h, w)), jnp.float32),
          jnp.array(rng.randn(1, 1, h, w), jnp.float32))

    def run(staged):
        return jax.jit(
            lambda d, wt, a, b, c: pallas_kernels
            .progressive_splat_fused_pallas(d, wt, a, b, c, staged=staged,
                                            interpret=True))(data, wts, *st)

    base = run(False)
    alt = run(True)
    for x, y in zip(base, alt):
        np.testing.assert_array_equal(np.array(x), np.array(y))
    # bf16 logits (the bench default dtype) through the staged path too.
    wts16 = wts.astype(jnp.bfloat16)

    def run16(staged):
        return jax.jit(
            lambda d, wt, a, b, c: pallas_kernels
            .progressive_splat_fused_pallas(d, wt, a, b, c, staged=staged,
                                            interpret=True))(data, wts16,
                                                             *st)

    for x, y in zip(run16(False), run16(True)):
        np.testing.assert_array_equal(np.array(x), np.array(y))

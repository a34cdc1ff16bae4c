#!/usr/bin/env python
"""Extended benchmark suite over the BASELINE.md config groups.

Prints one JSON line per case. Shape-preserving ops are timed with the
slope method (iterated inside one jitted ``lax.fori_loop`` at two trip
counts; the slope removes relay/sync overhead — the same quantity the
reference's CUDA-event ``repeat`` measures). Non-shape-preserving ops are
timed warm with ``block_until_ready`` minus the measured relay sync floor.

The driver-facing headline stays in ``bench.py``; this file is the
breadth evidence (separable, morphology/rank, interpolation, FFT/signal,
registration groups).
"""

import functools
import json
import os
import re
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _perturbed(x, count):
    """`count` value-distinct copies of ``x``, device-ready.

    The dev relay can serve a repeated (program, identical-input)
    execution from cache, which makes warm re-timings of the SAME call
    meaningless (measured: a 256^3 copy chain's 40-iteration delta
    swinging -27..+239 ms with one shared input vs a stable 6-8 ms with
    distinct inputs).  Every timed invocation therefore gets its own
    slightly-perturbed input; the perturbation never changes shapes,
    dtypes, or value ranges enough to alter dispatch."""
    if jnp.issubdtype(x.dtype, jnp.floating) or jnp.issubdtype(
        x.dtype, jnp.complexfloating
    ):
        out = [x * (1 + jnp.asarray(1e-7, x.real.dtype) * k)
               for k in range(count)]
    else:
        out = [jnp.roll(x, k, axis=0) for k in range(count)]
    jax.block_until_ready(out)
    return out


def _slope_ms(fn, x, n1=4, n2=24, reps=5):
    @functools.partial(jax.jit, static_argnums=1)
    def many(v, n):
        # the barrier stops XLA fusing across iterations: a chain of
        # pure-jnp stencils otherwise collapses into one fused pass
        # whose marginal per-iteration cost is far below the standalone
        # op (binary_opening "measured" 4.9 TB/s), which is not the
        # standalone per-call number this suite claims
        return lax.fori_loop(
            0, n,
            lambda i, acc: lax.optimization_barrier(fn(acc)),
            v,
        )

    def estimate(m1, m2):
        variants = iter(_perturbed(x, 2 * reps + 2))

        def timed(n):
            v = next(variants)
            t0 = time.perf_counter()
            # scalar readback: block_until_ready returns early through
            # the dev relay (see bench.py), a host transfer does not
            float(many(v, n).ravel()[0])
            return (time.perf_counter() - t0) * 1e3

        timed(m1)
        timed(m2)
        # median each trip count separately, then difference: relay /
        # compile-service hiccups inflate individual samples by tens of
        # ms, and a median of PAIRWISE slopes is poisoned whenever one
        # half of a pair glitches.  Per-trip medians tolerate glitches
        # in up to half the samples of each side.
        t1s = []
        t2s = []
        for _ in range(reps):
            t1s.append(timed(m1))
            t2s.append(timed(m2))
        s = (float(np.median(t2s)) - float(np.median(t1s))) / (m2 - m1)
        if s <= 0:
            pairs = [
                (b - a) / (m2 - m1) for a, b in zip(t1s, t2s) if b > a
            ]
            s = float(np.median(pairs)) if pairs else abs(s)
        return s

    s = estimate(n1, n2)
    # fast ops need a bigger trip-count spread: the relay jitter is a
    # few ms, so a sub-10 ms signal (slope * spread) is noise — rescale
    # the spread toward a ~25 ms signal and re-estimate (iterate: a
    # jitter-inflated first estimate undershoots the needed spread)
    span = n2 - n1
    for _ in range(3):
        if s * span >= 10.0 or span >= 2000:
            break
        span = min(2000, max(span + 1, int(25.0 / max(s, 0.02))))
        s = estimate(n1, n1 + span)
    return s


_SYNC_FLOOR = None


def _sync_floor_ms():
    global _SYNC_FLOOR
    if _SYNC_FLOOR is None:
        ts = []
        for i in range(5):
            z = jnp.zeros(8) + float(i)  # distinct values: no replay
            z.block_until_ready()
            t0 = time.perf_counter()
            float(jnp.sum(z))
            ts.append((time.perf_counter() - t0) * 1e3)
        _SYNC_FLOOR = float(np.median(ts))
    return _SYNC_FLOOR


def _readback(out):
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        float(jnp.real(jnp.asarray(leaf)).ravel()[0])


def _warm_ms(make_call, reps=3, n1=2, n2=8):
    """Eager two-point slope: time n1 and n2 back-to-back calls with one
    readback each; the difference cancels the relay sync floor, which
    drifts too much to subtract as a separately measured constant.
    ``make_call(k)`` must issue call ``k`` on a value-distinct input
    (see _perturbed): the relay can replay identical calls from cache,
    so repeats of one closed-over input time nothing."""
    _readback(make_call(0))  # compile
    k = [1]

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = make_call(k[0])
            k[0] += 1
        _readback(out)
        return (time.perf_counter() - t0) * 1e3

    run(n1)
    run(n2)
    t1s = []
    t2s = []
    for _ in range(reps):
        t1s.append(run(n1))
        t2s.append(run(n2))
    s = (float(np.median(t2s)) - float(np.median(t1s))) / (n2 - n1)
    return max(0.0, s)


_PEAK_GBPS = None


def _peak_gbps():
    """Measured peak HBM bandwidth: slope-timed whole-array copy chain.

    The copy is a Pallas kernel, NOT a jnp elementwise op: XLA unrolls
    the timing loop and fuses / strength-reduces an elementwise body
    (measured 4 TB/s for ``v + 1.0`` — fiction), while a pallas_call is
    an opaque custom call that must stream the full array HBM->VMEM->HBM
    every iteration.  2 HBM touches per element, the same accounting
    every GBps column in this suite uses.  Denominator for the
    pct_roofline column (VERDICT r1 #10)."""
    global _PEAK_GBPS
    if _PEAK_GBPS is None:
        from jax.experimental import pallas as pl

        def _copy_kernel(src_ref, dst_ref):
            dst_ref[...] = src_ref[...] + 1.0

        def _copy(v):
            return pl.pallas_call(
                _copy_kernel,
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                grid=(v.shape[0] // 8,),
                in_specs=[
                    pl.BlockSpec(
                        (8,) + v.shape[1:], lambda i: (i, 0, 0)
                    )
                ],
                out_specs=pl.BlockSpec(
                    (8,) + v.shape[1:], lambda i: (i, 0, 0)
                ),
            )(v)

        x = jnp.asarray(
            np.random.RandomState(7).randn(256, 256, 256).astype(np.float32)
        )
        ms = _slope_ms(_copy, x, n1=8, n2=48)
        _PEAK_GBPS = x.size * 4 * 2 / 1e9 / (ms / 1e3)
    return _PEAK_GBPS


_GATHER_PEAK = None


def _gather_peak_rows_per_s():
    """Measured peak dynamic-gather throughput, in 128-lane rows/s.

    Interp resampling kernels (GTG affine, warp gathers) are bound not
    by HBM bandwidth but by the VPU's within-vreg lane-gather unit:
    every ``take_along_axis(src, idx, axis=1)`` (tpu.dynamic_gather)
    moves one sublane row of 128 lanes per unit step, and a general
    affine needs ~10-20 such row moves per output point grid.  This
    measures a dependent chain of 64 gathers per (128, 128) block — the
    denominator for the interp group's pct_lightspeed (bound: gather).
    """
    global _GATHER_PEAK
    if _GATHER_PEAK is None:
        if jax.default_backend() != "tpu":
            _GATHER_PEAK = 1e12
            return _GATHER_PEAK
        from jax.experimental import pallas as pl

        K = 64

        def _gather_kernel(src_ref, dst_ref):
            v = src_ref[...]
            idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            idx = (idx * 7 + 3) % 128  # full-lane permutation
            for _ in range(K):
                v = jnp.take_along_axis(v, idx, axis=1)
            dst_ref[...] = v

        G = 256

        def _chain(v):
            return pl.pallas_call(
                _gather_kernel,
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                grid=(G,),
                in_specs=[pl.BlockSpec((128, 128), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((128, 128), lambda i: (i, 0)),
            )(v)

        x = jnp.asarray(
            np.random.RandomState(9).randn(G * 128, 128).astype(np.float32)
        )
        ms = _slope_ms(_chain, x, n1=4, n2=24)
        _GATHER_PEAK = G * 128 * K / (ms / 1e3)
    return _GATHER_PEAK


def _gtg_shuffle_rows(matrix, order, out_shape, planes=1):
    """Planned shuffle-row count (gathers + transposes, in 128-lane row
    units) for one GTG resample — the numerator for gather-bound
    lightspeed.  Mirrors ops/gtg_interp._make_kernel's op structure."""
    from cupyimg_tpu.ops import gtg_interp as _G

    plan = _G.gtg_plan(matrix, order, out_shape)
    if plan is None:
        return None
    _, (a00, a01, a10, a11), TI, NP, NW, oshape, S0, NR = plan
    ntaps = order + 1 if order > 0 else 1
    merge2 = NP == 2 and ntaps >= 2 and abs(a10) < 1.0
    ncol = (ntaps + 1) if merge2 else NP * ntaps
    per_tile = (
        ntaps * ncol * NW * S0            # col gathers
        + ntaps * NP * max(S0, 128)       # transposes (row-equivalent)
        + ntaps * NP * NR * 128           # row gathers
    )
    tiles = -(-oshape[0] // TI) * -(-oshape[1] // 128)
    return per_tile * tiles * planes


_VPU_PEAK = None


def _vpu_peak_gflops():
    """Measured VPU f32 FMA peak (GFLOP/s): a long in-VMEM multiply-add
    chain in a Pallas kernel, slope-timed.

    Compute roofline for the ops whose cost is per-tap arithmetic, not
    HBM traffic — a dense k*k correlate does 2*k^2 flops/element, so at
    e.g. k=15 the VPU, not HBM, is the wall (the reference's dense CUDA
    stencil is equally compute-bound there, just against SM FLOPs:
    cupyimg/scipy/ndimage/_filters_core.py:190-348)."""
    global _VPU_PEAK
    if _VPU_PEAK is None:
        from jax.experimental import pallas as pl

        U = 64   # FMAs per accumulator per pass
        NACC = 8  # independent chains: a single dependent chain is
                  # latency-bound and understates peak ~2x (measured:
                  # the dense k15 stencil beat the 1-chain "peak")

        def _fma_kernel(src_ref, dst_ref):
            x = src_ref[...] * 0.5 + 0.25
            accs = [x + float(i) for i in range(NACC)]
            for _ in range(U):
                accs = [a * x + x for a in accs]
            out = accs[0]
            for a in accs[1:]:
                out = out + a
            dst_ref[...] = out

        def _chain(v):
            return pl.pallas_call(
                _fma_kernel,
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                grid=(v.shape[0] // 256,),
                in_specs=[pl.BlockSpec((256, 512), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((256, 512), lambda i: (i, 0)),
            )(v)

        x = jnp.asarray(
            np.random.RandomState(9).randn(4096, 512).astype(np.float32)
        )
        ms = _slope_ms(_chain, x, n1=8, n2=48)
        _VPU_PEAK = x.size * U * NACC * 2 / 1e6 / ms  # GFLOP/s
    return _VPU_PEAK


_MXU_PEAK = None


def _mxu_peak_gflops():
    """Measured MXU bf16 matmul peak (GFLOP/s, f32 accumulation): one
    big square XLA matmul, slope-timed.

    Compute roofline for ops whose cost is MXU matmul passes, not HBM
    traffic or VPU FMAs — the fused Pallas FFT pipeline is 3-pass-bf16
    dense stage matmuls end to end (~6*(5a+6b) bf16 FLOPs/point for an
    n = a*b axis), so at 4224^2 the MXU, not HBM, is its wall."""
    global _MXU_PEAK
    if _MXU_PEAK is None:
        M = 4096
        x = jnp.asarray(
            np.random.RandomState(11).randn(M, M).astype(jnp.bfloat16)
        )

        def _mm(v):
            return jax.lax.dot(
                v, x, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)

        ms = _slope_ms(_mm, x, n1=2, n2=10)
        _MXU_PEAK = 2 * M**3 / 1e6 / ms  # GFLOP/s
    return _MXU_PEAK


_COMPLEX_OK = None


def _complex_supported():
    """Probe complex-dtype device support in a SUBPROCESS.

    On the axon dev relay, any complex-dtype device op silently poisons
    the process: every subsequent op (even float) fails with
    UNIMPLEMENTED. Probing in-process would take the whole suite down,
    so fork a child and require a float op to still work after the
    complex one.
    """
    global _COMPLEX_OK
    if _COMPLEX_OK is None:
        import subprocess
        import sys

        code = (
            "import jax, jax.numpy as jnp;"
            "c = (jnp.ones((8, 8)) + 1j * jnp.ones((8, 8)))"
            ".astype(jnp.complex64);"
            "jax.block_until_ready(c);"
            "print(float(jnp.real(c).ravel()[0]));"
            "print('POST', float(jnp.sum(jnp.ones(4))))"
        )
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=600,
            )
            _COMPLEX_OK = r.returncode == 0 and "POST 4.0" in r.stdout
        except Exception:
            _COMPLEX_OK = False
    return _COMPLEX_OK



def _rank2d_flops(w0, w1, rank, npix):
    """Exact per-element flops of the shared-presort 2-D rank kernel:
    2 ops (min+max) per compare-exchange; lane presort shared across
    row taps + per-point pruned merge (ops/pallas_stencil.py
    _make_rank_kernel_2d)."""
    from cupyimg_tpu.ops.sorting_networks import (
        batcher_network, presorted_rank_network,
    )

    shared = len(batcher_network(w1))
    per_point = len(presorted_rank_network(w1, w0, rank)[0])
    return 2 * (shared + per_point) * npix


def emit(name, ms, nbytes=None, needs_complex=False, flops=None,
         shuffle_rows=None, model_bytes=None, mxu_flops=None):
    only = os.environ.get("BENCH_SUITE_ONLY")
    if only is not None and not re.search(only, name):
        return
    if needs_complex and not _complex_supported():
        print(
            json.dumps(
                {
                    "metric": name,
                    "skipped": "complex dtypes unsupported on this backend",
                }
            ),
            flush=True,
        )
        return
    if callable(ms):
        # run the timing thunk guarded: a platform gap (e.g. the axon
        # dev relay rejects every complex-dtype op with UNIMPLEMENTED)
        # must skip the one case, not abort the suite
        try:
            ms = ms()
        except Exception as e:  # pragma: no cover - platform dependent
            print(
                json.dumps(
                    {
                        "metric": name,
                        "skipped": f"{type(e).__name__}: {str(e)[:120]}",
                    }
                ),
                flush=True,
            )
            return
    rec = {"metric": name, "value": round(ms, 4), "unit": "ms"}
    if nbytes:
        gbps = nbytes / 1e9 / (ms / 1e3)
        rec["GBps"] = round(gbps, 1)
        rec["pct_roofline"] = round(100.0 * gbps / _peak_gbps(), 1)
    if flops is not None and nbytes:
        # light-speed time = whichever wall binds: streaming the bytes
        # at measured peak HBM bandwidth, or doing the arithmetic at
        # measured peak VPU FMA rate.  pct_lightspeed is the honest
        # roofline figure for compute-bound ops (dense stencils, rank
        # networks), where pct_roofline's bandwidth framing understates.
        t_bw_ms = nbytes / 1e9 / _peak_gbps() * 1e3
        t_fl_ms = flops / 1e6 / _vpu_peak_gflops()
        # values > 100 are real: the bound is VPU-only FMA throughput,
        # and kernels that offload their lane axis to the MXU (dense
        # Toeplitz correlate, rank lane passes) legitimately beat it
        rec["pct_lightspeed"] = round(
            100.0 * max(t_bw_ms, t_fl_ms) / ms, 1
        )
        rec["bound"] = "compute" if t_fl_ms > t_bw_ms else "bandwidth"
    if model_bytes is not None and nbytes:
        # bandwidth-bound ops whose minimal traffic exceeds in+out
        # (tap-gather samplers): lightspeed = streaming model_bytes at
        # measured peak
        t_m_ms = model_bytes / 1e9 / _peak_gbps() * 1e3
        rec["pct_lightspeed"] = round(100.0 * t_m_ms / ms, 1)
        rec["bound"] = "bandwidth"
    if mxu_flops is not None and nbytes:
        # MXU-matmul-bound ops (fused Pallas FFT): the wall is bf16
        # matmul throughput, not HBM or the VPU
        t_bw_ms = nbytes / 1e9 / _peak_gbps() * 1e3
        t_mx_ms = mxu_flops / 1e6 / _mxu_peak_gflops()
        rec["pct_lightspeed"] = round(
            100.0 * max(t_bw_ms, t_mx_ms) / ms, 1
        )
        rec["bound"] = "mxu" if t_mx_ms > t_bw_ms else "bandwidth"
    if shuffle_rows is not None and nbytes:
        # gather-bound ops (interp resampling): the wall is the VPU's
        # dynamic-gather unit, not HBM or FMA throughput
        t_bw_ms = nbytes / 1e9 / _peak_gbps() * 1e3
        t_g_ms = shuffle_rows / _gather_peak_rows_per_s() * 1e3
        rec["pct_lightspeed"] = round(
            100.0 * max(t_bw_ms, t_g_ms) / ms, 1
        )
        rec["bound"] = "gather" if t_g_ms > t_bw_ms else "bandwidth"
    print(json.dumps(rec), flush=True)


def main():
    import cupyimg_tpu.scipy.ndimage as ndi
    import cupyimg_tpu.scipy.signal as signal
    import cupyimg_tpu.skimage.registration as registration
    import cupyimg_tpu.skimage.restoration as restoration

    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(256, 256, 256).astype(np.float32))
    img = jnp.asarray(rng.randn(4096, 4096).astype(np.float32))
    nb3 = vol.size * 4 * 2
    nb2 = img.size * 4 * 2

    # --- separable suite -------------------------------------------------
    emit("uniform_3d_256c_s5",
         lambda: _slope_ms(lambda v: ndi.uniform_filter(v, 5), vol), nb3)
    emit("gaussian_3d_256c_sig2",
         lambda: _slope_ms(lambda v: ndi.gaussian_filter(v, 2.0), vol), nb3)
    emit("sobel_3d_256c",
         lambda: _slope_ms(lambda v: ndi.sobel(v, axis=0), vol), nb3)
    emit("uniform_2d_4096_s7",
         lambda: _slope_ms(lambda v: ndi.uniform_filter(v, 7), img), nb2)
    emit("gaussian_2d_4096_sig3",
         lambda: _slope_ms(lambda v: ndi.gaussian_filter(v, 3.0), img), nb2)
    emit("prewitt_2d_4096",
         lambda: _slope_ms(lambda v: ndi.prewitt(v, axis=0), img), nb2)
    emit("laplace_2d_4096",
         lambda: _slope_ms(lambda v: ndi.laplace(v), img), nb2)

    # --- dense (non-separable) stencils -----------------------------------
    for k in (7, 15):
        kd = jnp.asarray(rng.randn(k, k).astype(np.float32))
        emit(
            f"correlate_dense_2d_4096_k{k}",
            lambda: _slope_ms(
                lambda v, kd=kd: ndi.correlate(
                    v, kd, mode="reflect", dtype_mode="float"
                ),
                img,
            ),
            nb2,
            flops=2 * k * k * img.size,
        )

    # sparse footprint: the reference documents a masked-kernel crossover
    # win for sparse weights (reference filters.py:95-99); here zero taps
    # are skipped at TRACE time so cost tracks nnz, subsuming that path —
    # this case proves it (9x9 with 8 nonzero taps vs the dense 9x9)
    k9s = np.zeros((9, 9), np.float32)
    k9s[np.random.RandomState(7).randint(0, 9, 8),
        np.random.RandomState(8).randint(0, 9, 8)] = 1.0
    k9d = rng.randn(9, 9).astype(np.float32)
    emit("correlate_sparse_9x9_nnz8_2d_4096",
         lambda: _slope_ms(
             lambda v: ndi.correlate(v, np.asarray(k9s), mode="reflect",
                                     dtype_mode="float"), img), nb2,
         flops=2 * 8 * img.size)
    emit("correlate_dense_9x9_2d_4096",
         lambda: _slope_ms(
             lambda v: ndi.correlate(v, np.asarray(k9d), mode="reflect",
                                     dtype_mode="float"), img), nb2,
         flops=2 * 81 * img.size)

    # --- morphology + rank suite -----------------------------------------
    emit("minimum_3d_256c_s5",
         lambda: _slope_ms(lambda v: ndi.minimum_filter(v, 5), vol), nb3)
    emit("maximum_2d_4096_s9",
         lambda: _slope_ms(lambda v: ndi.maximum_filter(v, 9), img), nb2)
    emit("median_2d_4096_s3",
         lambda: _slope_ms(lambda v: ndi.median_filter(v, 3), img), nb2,
         flops=_rank2d_flops(3, 3, 4, img.size))
    emit("median_2d_4096_s5",
         lambda: _slope_ms(lambda v: ndi.median_filter(v, 5), img), nb2,
         flops=_rank2d_flops(5, 5, 12, img.size))
    bin_img = img > 0
    emit("binary_erosion_2d_4096",
         lambda: _slope_ms(lambda v: ndi.binary_erosion(v), bin_img), nb2 // 4)
    emit("grey_erosion_2d_4096_s5",
         lambda: _slope_ms(lambda v: ndi.grey_erosion(v, size=5), img), nb2)
    emit("binary_opening_2d_4096",
         lambda: _slope_ms(lambda v: ndi.binary_opening(v), bin_img), nb2 // 4)
    emit("grey_opening_2d_4096_s5",
         lambda: _slope_ms(lambda v: ndi.grey_opening(v, size=5), img), nb2)
    emit("morph_gradient_2d_4096_s5",
         lambda: _slope_ms(
             lambda v: ndi.morphological_gradient(v, size=5), img), nb2)
    emit("percentile_filter_2d_4096_p30_s5",
         lambda: _slope_ms(lambda v: ndi.percentile_filter(v, 30, size=5), img),
         nb2, flops=_rank2d_flops(5, 5, 7, img.size))
    # 3-D 3x3x3 median: 21 shared + 55 per-point compare-exchanges
    # (ops/pallas_stencil.py _make_rank_kernel_3d docstring)
    emit("median_3d_256c_s3",
         lambda: _slope_ms(lambda v: ndi.median_filter(v, 3), vol), nb3,
         flops=2 * (21 + 55) * vol.size)

    # --- interpolation / warping suite ------------------------------------
    mat = np.array([[0.9, 0.1], [-0.1, 0.9]], np.float32)
    for order in (0, 1, 3):
        # Pallas one-hot sampler: cheap enough to slope-time now
        emit(
            f"affine_2d_4096_order{order}",
            lambda: _slope_ms(
                lambda v, o=order: ndi.affine_transform(
                    v, mat, order=o, mode="nearest", prefilter=False
                ),
                img, n1=2, n2=26,
            ),
            nb2,
            shuffle_rows=_gtg_shuffle_rows(mat, order, (4096, 4096)),
        )
    # large-angle rotation: the (TI, S0) planner keeps full-height
    # output tiles via a 192-row slab + dual B-stage row windows (the
    # old fixed-slab ladder fit only TI=40 here, 3.2x redundant work)
    _r40 = np.deg2rad(40.0)
    rot40 = np.array(
        [[np.cos(_r40), np.sin(_r40)], [-np.sin(_r40), np.cos(_r40)]],
        np.float32,
    )
    emit(
        "affine_2d_4096_rot40_order1",
        lambda: _slope_ms(
            lambda v: ndi.affine_transform(
                v, rot40, order=1, mode="nearest", prefilter=False
            ),
            img, n1=2, n2=26,
        ),
        nb2,
        shuffle_rows=_gtg_shuffle_rows(rot40, 1, (4096, 4096)),
    )
    # diagonal affine hits the separable fast path
    dmat = np.array([[1.1, 0.0], [0.0, 0.9]], np.float32)
    emit(
        "affine_diag_2d_4096_order1",
        lambda: _slope_ms(
            lambda v: ndi.affine_transform(
                v, dmat, order=1, mode="nearest", prefilter=False
            ),
            img, n1=2, n2=26,
        ),
        nb2,
    )
    emit("zoom_keep_2d_4096_order1",
         lambda: _slope_ms(lambda v: ndi.zoom(v, 1.0, order=1), img,
                   n1=2, n2=26))
    emit("spline_filter_2d_4096_ord3",
         lambda: _slope_ms(lambda v: ndi.spline_filter(v, order=3), img), nb2)
    # boundary-mode sweep (BASELINE config group 2: "all modes")
    for bmode in ("mirror", "nearest", "constant", "wrap"):
        emit(
            f"gaussian_2d_4096_sig3_{bmode}",
            lambda: _slope_ms(
                lambda v, m=bmode: ndi.gaussian_filter(v, 3.0, mode=m),
                img,
            ),
            nb2,
        )
    # order-5 spline + complex interpolation (config group 4)
    emit(
        "shift_2d_4096_order5",
        lambda: _slope_ms(
            lambda v: ndi.shift(v, (2.3, -1.7), order=5, mode="reflect"),
            img, n1=2, n2=26,
        ),
        nb2,
    )
    def _cimg():
        # complex construction is itself a device op; build it inside
        # the guarded thunk (the axon dev relay has no complex support)
        c = (img[:2048, :2048]
             + 1j * img[2048:, 2048:]).astype(jnp.complex64)
        jax.block_until_ready(c)
        return c

    emit(
        "shift_complex_2d_2048_order3",
        lambda: _slope_ms(
            lambda v: ndi.shift(v, (1.3, -0.7), order=3, mode="reflect"),
            _cimg(), n1=2, n2=26,
        ),
        2048 * 2048 * 8 * 2,
        needs_complex=True,
    )
    emit(
        "zoom_complex_2d_2048_order1",
        lambda: _slope_ms(
            lambda v: ndi.zoom(v, 1.0, order=1), _cimg(), n1=2, n2=26,
        ),
        2048 * 2048 * 8 * 2,
        needs_complex=True,
    )
    _r17 = np.deg2rad(17.0)
    _rot17 = np.array(
        [[np.cos(_r17), np.sin(_r17)], [-np.sin(_r17), np.cos(_r17)]]
    )
    emit(
        "rotate_3d_256c_order1",
        lambda: _slope_ms(
            lambda v: ndi.rotate(
                v, 17.0, axes=(1, 2), reshape=False, order=1,
                mode="nearest", prefilter=False,
            ),
            vol, n1=1, n2=13,
        ),
        nb3,
        # row-gather sampler (ops/interp.gather_plane_rows): the wall is
        # HBM tap traffic, not the lane-gather unit — 4 tap reads + 1
        # write of the volume is the per-call floor
        model_bytes=5 * vol.size * 4,
    )
    # host-side grid build: jnp.mgrid is a device op chain and an
    # earlier poisoned relay stream would crash the suite here
    coords3 = jnp.asarray(
        np.mgrid[0:128, 0:128, 0:128].astype(np.float32) + 0.37
    )
    emit("map_coords_3d_128c_order1",
         lambda: _slope_ms(lambda v: ndi.map_coordinates(v, coords3, order=1),
                   vol[:128, :128, :128], n1=2, n2=26))
    # smooth 2-D dense warp -> locality-adaptive one-hot gather
    _rr, _cc = np.mgrid[0:2048, 0:2048].astype(np.float32)
    warp_coords = jnp.asarray(np.stack([
        _rr + 11.0 * np.sin(_cc / 97.0) + 5.0 * np.cos(_rr / 53.0),
        _cc + 9.0 * np.cos(_rr / 71.0) - 4.0 * np.sin(_cc / 89.0),
    ]))
    for order in (1, 3):
        # the routing-based warp kernel (ops/warp_gather.py) is
        # sync-free and jittable, so the warp cases slope-time now
        emit(
            f"map_coords_2d_2048_warp_order{order}",
            lambda: _slope_ms(
                lambda v, o=order: ndi.map_coordinates(
                    v, warp_coords, order=o, mode="reflect",
                ),
                img[:2048, :2048], n1=2, n2=26,
            ),
        )

    # --- FFT / signal suite ------------------------------------------------
    k2 = jnp.asarray(rng.randn(31, 31).astype(np.float32))

    def _fftconv_mxu_flops(n_img, n_ker):
        """bf16 MXU FLOPs of the fused-FFT conv pipeline (small-kernel
        path): real-in forward (2a+3b, 3a+3b per point), product-fused
        real-out inverse (3a+3b, 2a+3b), each f32 dot = 3 bf16 passes
        (ops/pallas_fft.py) -> 6*(5a+6b) bf16 FLOPs/point/axis."""
        from cupyimg_tpu.ops.permfft import _split
        from cupyimg_tpu.scipy.signal.signaltools import next_fast_len

        n = next_fast_len(n_img + n_ker - 1)
        a, b = _split(n)
        return 6 * 2 * (5 * a + 6 * b) * n * n

    _fftc_fl = _fftconv_mxu_flops(4096, 31)
    emit("fftconvolve_2d_4096_k31",
         lambda: _slope_ms(lambda v: signal.fftconvolve(v, k2, mode="same"),
                   img, n1=2, n2=14), nb2, mxu_flops=_fftc_fl)
    emit("oaconvolve_2d_4096_k31",
         lambda: _slope_ms(lambda v: signal.oaconvolve(v, k2, mode="same"),
                   img, n1=2, n2=14), nb2, mxu_flops=_fftc_fl)
    sig = jnp.asarray(rng.randn(1 << 20).astype(np.float32))
    h = jnp.asarray(rng.randn(101).astype(np.float32))
    long1d = jnp.asarray(rng.randn(1 << 22).astype(np.float32))
    h257 = jnp.asarray(rng.randn(257).astype(np.float32))
    NV = 1 + 4 * 10  # calls one _warm_ms run makes
    long_v = _perturbed(long1d, NV)
    sig_v = _perturbed(sig, NV)
    # jit the thunks: eager dispatch pushes each op's full Python front
    # end through the relay per call, which swamps ms-scale kernels
    _oa1 = jax.jit(lambda v: signal.oaconvolve(v, h257, mode="same"))
    _uf = jax.jit(lambda v: signal.upfirdn(h, v, up=2, down=3))
    _rp = jax.jit(lambda v: signal.resample_poly(v, 2, 3))
    emit("oaconvolve_1d_4M_k257",
         lambda: _warm_ms(lambda k: _oa1(long_v[k % NV]), reps=3))
    emit("upfirdn_1M_h101_up2_down3",
         lambda: _warm_ms(lambda k: _uf(sig_v[k % NV])))
    emit("resample_poly_1M_2_3",
         lambda: _warm_ms(lambda k: _rp(sig_v[k % NV])))

    # --- registration / restoration suite ---------------------------------
    a = jnp.asarray(rng.randn(1024, 1024).astype(np.float32))
    b = jnp.roll(a, (5, -3), axis=(0, 1))
    # the registration/restoration pipelines are device-side and
    # jittable: slope-time by chaining a scalar of the result back
    # into the input (otherwise the relay's ~30 ms sync floor swamps
    # the measurement)
    def _pcc_step(v):
        sh, err, _ = registration.phase_cross_correlation(
            v, b, upsample_factor=10)
        return v + (sh[0] + err).astype(v.dtype) * np.float32(1e-20)

    emit("phase_cross_corr_1024_up10", lambda: _slope_ms(_pcc_step, a,
                                                 n1=2, n2=26))
    psf = jnp.ones((5, 5), jnp.float32) / 25
    small = jnp.clip(a[:512, :512] * 0.1 + 0.5, 0, 1)
    emit("richardson_lucy_512_it10",
         lambda: _slope_ms(lambda v: restoration.richardson_lucy(
             v, psf, iterations=10, clip=False) * np.float32(0.99)
             + np.float32(0.005),
             small, n1=2, n2=26))
    emit("wiener_hunt_1024",
         lambda: _slope_ms(lambda v: restoration.wiener(
             v, psf, 0.1, clip=False) * np.float32(1e-3),
             a, n1=2, n2=26))

    print(json.dumps({
        "sync_floor_ms": round(_sync_floor_ms(), 3),
        "peak_copy_GBps": round(_peak_gbps(), 1),
        "vpu_peak_GFLOPs": round(_vpu_peak_gflops(), 0),
    }))


if __name__ == "__main__":
    main()

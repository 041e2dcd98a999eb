"""Real-chip parity sweep: every pallas kernel family x weighted/unweighted
on representative shapes, bit/allclose-compared against numpy ON THE REAL
TPU (the CPU interpreter enforces TPU grid rules but not Mosaic's actual
lowering — e.g. lax.dynamic_slice only failed on real hardware).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_parity_sweep.py
"""

import sys

import numpy as np

from xhistogram_tpu.core import histogram
from xhistogram_tpu.ops import pallas_hist as ph


def oracle_rows(arrays, edges, weights=None):
    m = arrays[0].shape[0]
    outs = []
    for r in range(m):
        h, _ = np.histogramdd(
            np.stack([np.asarray(a[r], "f8") for a in arrays], -1),
            bins=edges,
            weights=np.asarray(weights[r], "f8") if weights is not None
            else None,
        )
        outs.append(h)
    return np.stack(outs)


def check(name, arrays, edges, axis, weights=None, atol=2e-4,
          method="pallas"):
    from xhistogram_tpu import bins as bins_mod

    try:  # display-only: mirror core's uniform certification for plan()
        uni = tuple(
            bins_mod.uniform_form(
                np.asarray(
                    bins_mod.compare_form(np.asarray(e_), np.float32).edges
                ),
                np.asarray(e_),
            )
            for e_ in edges
        )
    except Exception:
        uni = None
    kernel = ph.plan(
        len(arrays),
        tuple(len(e) - 1 for e in edges),
        1 if axis is None else arrays[0].shape[0],
        c=None if axis is None else arrays[0].shape[1],
        weighted=weights is not None,
        uniform=uni,
    )
    try:
        h, _ = histogram(*arrays, bins=edges, axis=axis, weights=weights,
                         method=method)
    except Exception as e:
        print(f"FAIL {name} [{kernel}]: {type(e).__name__}: {str(e)[:120]}")
        return False
    got = np.asarray(h)
    if axis is None:
        exp = oracle_rows([a.reshape(1, -1) for a in arrays], edges,
                          weights.reshape(1, -1) if weights is not None
                          else None)[0]
    else:
        exp = oracle_rows(arrays, edges, weights)
    if weights is None:
        ok = np.array_equal(got, exp)
    else:
        ok = np.allclose(got, exp, rtol=2e-4, atol=atol, equal_nan=True)
        # NaN/inf placement must also agree exactly
        ok = ok and np.array_equal(np.isnan(got), np.isnan(exp))
    print(f"{'OK  ' if ok else 'FAIL'} {name:46s} [{kernel}]")
    return ok


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    e = lambda n, lo=-4, hi=4: np.linspace(lo, hi, n)
    d = lambda *s: rng.randn(*s).astype("f4")
    w = lambda *s: rng.rand(*s).astype("f4")

    ok = True
    # one_input: cumulative (unweighted) + membership (weighted)
    ok &= check("one_input 64b reduce-all", [d(3, 1000)], [e(65)], None)
    ok &= check("one_input 64b kept rows", [d(16, 500)], [e(65)], (1,))
    ok &= check("one_input weighted", [d(16, 500)], [e(65)], (1,),
                w(16, 500))
    # joint2: cumulative + inclusion-exclusion / weighted membership
    ok &= check("joint2 280x340", [d(2, 5000), d(2, 5000)],
                [e(281), e(341)], None)
    ok &= check("joint2 weighted", [d(2, 5000), d(2, 5000)],
                [e(281), e(341)], None, w(2, 5000))
    # factored reduce-all (incl. > joint2 grid)
    ok &= check("factored 900x900", [d(2, 4000), d(2, 4000)],
                [e(901), e(901)], None)
    ok &= check("factored weighted 900x900", [d(2, 4000), d(2, 4000)],
                [e(901), e(901)], None, w(2, 4000))
    ok &= check("factored 3-input", [d(1, 3000)] * 3,
                [e(11), e(12), e(13)], None)
    # per-row factored
    ok &= check("per-row 150x90", [d(5, 2000), d(5, 2000)],
                [e(151), e(91)], (1,))
    ok &= check("per-row weighted", [d(5, 2000), d(5, 2000)],
                [e(151), e(91)], (1,), w(5, 2000))
    # packed (narrow c, big slots) — REAL-CHIP first parity check
    ok &= check("packed 120x90 c=64", [d(16, 64), d(16, 64)],
                [e(121), e(91)], (1,))
    ok &= check("packed weighted + NaN w", [d(9, 100)], [e(10001)], (1,),
                np.where(rng.rand(9, 100) < 0.01, np.nan,
                         w(9, 100)).astype("f4"))
    ok &= check("packed fold m=3 c=45", [d(3, 45)], [e(9001)], (1,))
    # direct (narrow c, small slots)
    ok &= check("direct 40x40 c=64", [d(16, 64), d(16, 64)],
                [e(41), e(41)], (1,))
    # fori digitize (edges past the unroll threshold)
    ok &= check(f"fori digitize {ph._DIG_UNROLL_MAX + 513} edges",
                [d(4, 2000)], [e(ph._DIG_UNROLL_MAX + 513)], (1,))
    ok &= check("fori digitize reduce-all 4097 edges", [d(2, 50000)],
                [e(4097)], None)
    # huge slots (n1-chunked HBM grid past 2^23; explicit-pallas keeps the
    # fused kernel above the auto full cap)
    ok &= check("huge slots 4096x4095", [d(1, 20000), d(1, 20000)],
                [e(4097), e(4096)], None)
    # above the full-reduction caps, auto routes to the XLA scatter
    # fallback (+ compare-sum digitize) — r3 revision, doc/perf_model.md
    ok &= check("auto scatter 2049x2048 u", [d(1, 20000), d(1, 20000)],
                [e(2050), e(2049)], None, method="auto")
    ok &= check("auto scatter 724x724 w", [d(1, 20000), d(1, 20000)],
                [e(725), e(725)], None, weights=w(1, 20000),
                method="auto")
    # >8192-edge certified grid above the weighted cap: the XLA route must
    # consume the certificate (O(1) jnp digitize) instead of searchsorted
    # (2^19 bins over a pow-2 width -> arith tier always certifies)
    ok &= check("auto scatter 2^19 uniform bins w", [d(1, 20000)],
                [e((1 << 19) + 1)], None, weights=w(1, 20000),
                method="auto")
    # NaN/inf data routing
    data = d(2, 5000)
    data[0, :5] = [np.nan, np.inf, -np.inf, np.nan, np.inf]
    ok &= check("joint2 nan/inf data", [data, d(2, 5000)],
                [e(281), e(341)], None)
    # int32 data
    ints = rng.randint(-50, 50, (4, 600)).astype("i4")
    ok &= check("one_input int32 data", [ints], [e(65, -50, 50)], (1,))

    # narrow DATA dtypes (r5): Mosaic cannot lower sub-32-bit tile
    # compares, so every kernel family widens tiles in-register
    # (pallas_hist._widen) — these prove the lowering per family on the
    # chip (the CPU interpreter does not exercise Mosaic). f16 is the
    # exception: no VPU f16 extf, so _dispatch pre-casts to f32.
    import jax.numpy as _jnp

    bf = lambda *s: _jnp.asarray(rng.randn(*s), _jnp.bfloat16)
    f16 = lambda *s: _jnp.asarray(rng.randn(*s), _jnp.float16)
    i8d = lambda *s: rng.randint(-50, 50, s).astype("i1")
    i16d = lambda *s: rng.randint(-50, 50, s).astype("i2")
    u8d = lambda *s: rng.randint(0, 100, s).astype("u1")
    ok &= check("bf16 one_input kept rows", [bf(16, 500)], [e(65)], (1,))
    ok &= check("f16 one_input (pre-cast)", [f16(16, 500)], [e(65)], (1,))
    ok &= check("i8 data joint2", [i8d(2, 5000), i8d(2, 5000)],
                [e(61, -60, 60), e(41, -60, 60)], None)
    ok &= check("bf16 factored 900x900", [bf(2, 4000), bf(2, 4000)],
                [e(901), e(901)], None)
    ok &= check("i16 per-row 150x90", [i16d(5, 2000), i16d(5, 2000)],
                [e(151, -60, 60), e(91, -60, 60)], (1,))
    ok &= check("u8 packed 120x90 c=64", [u8d(16, 64), u8d(16, 64)],
                [e(121, 0, 110), e(91, 0, 110)], (1,))
    ok &= check("bf16 direct weighted c=64", [bf(16, 64), bf(16, 64)],
                [e(41), e(41)], (1,), w(16, 64))
    ok &= check(f"bf16 fori digitize {ph._DIG_UNROLL_MAX + 513} edges",
                [bf(4, 2000)], [e(ph._DIG_UNROLL_MAX + 513)], (1,))
    # i8 weighted mode (Mosaic-sensitive int8 lhs wiring) across kernels
    jax.clear_caches()
    ph._WEIGHTED_MODE = "i8"
    try:
        wna = w(2, 5000).copy()
        wna[0, 3] = np.nan
        ok &= check("i8 joint2 weighted + NaN", [d(2, 5000), d(2, 5000)],
                    [e(281), e(341)], None, wna, atol=2e-3)
        ok &= check("i8 per-row weighted", [d(5, 2000), d(5, 2000)],
                    [e(151), e(91)], (1,), w(5, 2000), atol=2e-3)
        ok &= check("i8 one_input weighted", [d(16, 500)], [e(65)], (1,),
                    w(16, 500), atol=2e-3)
        ok &= check("i8 direct weighted", [d(16, 64), d(16, 64)],
                    [e(41), e(41)], (1,), w(16, 64), atol=2e-3)
    finally:
        ph._WEIGHTED_MODE = "split"  # the real default ("auto" is not a
        # mode: it would fall through _weighted_dot to the highest branch)
        jax.clear_caches()

    # highest weighted mode (three-limb bf16 split, per-weight exact):
    # the stacked 3-section concat + limb arithmetic is a distinct Mosaic
    # op mix — prove its lowering here, and its exactness on a
    # one-element-per-bin layout (each slot = one weight, bit-equal)
    jax.clear_caches()
    ph._WEIGHTED_MODE = "highest"
    try:
        ok &= check("highest joint2 weighted", [d(2, 5000), d(2, 5000)],
                    [e(281), e(341)], None, w(2, 5000), atol=1e-5)
        ok &= check("highest one_input weighted", [d(16, 500)], [e(65)],
                    (1,), w(16, 500), atol=1e-5)
        eds_1 = e(1025)
        cents = (0.5 * (eds_1[:-1] + eds_1[1:])).astype("f4").reshape(1, -1)
        wex = w(1, 1024)
        # huge-but-finite weights: the clamped hi limb + hi+(mid+lo) order
        # must keep them exact instead of inf-poisoning the tile
        wex[0, 7] = np.float32(np.finfo(np.float32).max)
        wex[0, 11] = np.float32(3.4e38)
        try:
            h, _ = histogram(cents, bins=[eds_1], weights=wex,
                             method="pallas")
            good = np.array_equal(np.asarray(h), wex.ravel())
            print(f"{'OK  ' if good else 'FAIL'} highest bit-exact "
                  f"single-weight-per-bin (incl. f32_max)")
            ok &= good
        except Exception as exc:
            print(f"FAIL highest bit-exact: {type(exc).__name__}: "
                  f"{str(exc)[:120]}")
            ok = False
    finally:
        ph._WEIGHTED_MODE = "split"
        jax.clear_caches()

    # double-single uniform digitize (generic linspace grids) ON THE CHIP:
    # exact products + Fast2Sum chains are FMA/reassociation-proof by
    # construction, but Mosaic lowering of the op mix is only provable here
    ok &= check("ds uniform 1000b reduce-all", [d(2, 40000)],
                [np.linspace(-4.2, 4.2, 1001)], None)
    ok &= check("ds uniform exc-list 400b",
                [(rng.randn(1, 20000) * 2 + 3.5).astype("f4")],
                [np.linspace(0, 7, 401)], None)
    ok &= check("ds far-offset 500b",
                [(rng.rand(2, 20000) * 0.001 + 5000).astype("f4")],
                [np.linspace(5000.0, 5000.001, 501)], None)
    ok &= check("ds uniform weighted kept rows", [d(5, 3000)],
                [np.linspace(-4, 4, 601)], (1,), w(5, 3000))

    # weighted uniform-routing thresholds (arith >24 / DS >80, measured
    # scripts/ds_weighted_probe.py): the bands newly routed to factored
    # for weighted shapes run the weighted factored kernel with the O(1)
    # digitize — only the chip proves the Mosaic lowering of that op mix
    ok &= check("w arith 32b reduce-all (new route)", [d(3, 9000)],
                [e(33)], None, w(3, 9000))
    ok &= check("w ds 96b reduce-all (new route)", [d(3, 9000)],
                [np.linspace(-4.2, 4.2, 97)], None, w(3, 9000))
    ok &= check("w ds 96b kept rows (new route)", [d(5, 3000)],
                [np.linspace(-4.2, 4.2, 97)], (1,), w(5, 3000))

    # shard_map + pallas ON THE CHIP (VERDICT r2 #3): a 1-device mesh runs
    # the REAL shard_map→Mosaic lowering path (the CPU interpreter missed
    # two lowering-only failures in r2); psum over a singleton axis is a
    # real collective in the lowered program.
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from xhistogram_tpu.parallel import histogram_sharded

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("dp",))
    ww_ = w(8, 4096)
    eds = [e(281), e(341)]
    a1, a2 = d(6, 3000), d(6, 3000)
    try:
        h, _ = histogram_sharded(
            a1, a2, mesh=mesh, in_spec=P("dp", None), bins=eds,
            axis=(1,), method="pallas",
        )
        exp = oracle_rows([a1, a2], eds)
        good = np.array_equal(np.asarray(h), exp)
        print(f"{'OK  ' if good else 'FAIL'} shard_map pallas kept rows "
              f"parity")
        ok &= good
    except Exception as exc:
        print(f"FAIL shard_map pallas kept rows: {type(exc).__name__}: "
              f"{str(exc)[:120]}")
        ok = False
    try:
        h, _ = histogram_sharded(
            a1, a2, mesh=mesh, in_spec=P("dp", None), bins=eds,
            weights=ww_[:6, :3000], method="pallas",
        )
        expw = oracle_rows(
            [a1.reshape(1, -1), a2.reshape(1, -1)], eds,
            ww_[:6, :3000].reshape(1, -1),
        )[0]
        good = np.allclose(np.asarray(h), expw, rtol=2e-4, atol=2e-4)
        print(f"{'OK  ' if good else 'FAIL'} shard_map pallas weighted "
              f"parity")
        ok &= good
    except Exception as exc:
        print(f"FAIL shard_map pallas weighted: {type(exc).__name__}: "
              f"{str(exc)[:120]}")
        ok = False
    # sharded wide-count contract ON THE CHIP: the uint32-pair halves psum
    # (psum over a real singleton mesh axis must lower for u32 operands)
    import xhistogram_tpu.core as core_mod

    orig_limit = core_mod._WIDE_LIMIT
    core_mod._WIDE_LIMIT = 1 << 12
    try:
        aw = d(4, 2048)
        hw, _ = histogram_sharded(
            aw, mesh=mesh, in_spec=P("dp", None), bins=[e(281)], axis=None
        )
        good = (
            isinstance(hw, np.ndarray)
            and hw.dtype == np.int64
            and np.array_equal(
                hw, np.histogram(aw.astype("f8"), bins=e(281))[0]
            )
        )
        print(f"{'OK  ' if good else 'FAIL'} shard_map wide int64 parity")
        ok &= good
    except Exception as exc:
        print(f"FAIL shard_map wide int64: {type(exc).__name__}: "
              f"{str(exc)[:120]}")
        ok = False
    finally:
        core_mod._WIDE_LIMIT = orig_limit

    # GSPMD implicit path: jit over device_put-committed data, auto method
    try:
        sharded = jax.device_put(a1, NamedSharding(mesh, P("dp", None)))
        h, _ = histogram(sharded, bins=[eds[0]])
        good = np.array_equal(
            np.asarray(h), np.histogram(a1.astype("f8"), bins=eds[0])[0]
        )
        print(f"{'OK  ' if good else 'FAIL'} gspmd committed-input parity")
        ok &= good
    except Exception as exc:
        print(f"FAIL gspmd committed-input: {type(exc).__name__}: "
              f"{str(exc)[:120]}")
        ok = False

    print("SWEEP", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

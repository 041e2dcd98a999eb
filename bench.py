"""Headline benchmark: 1e9-element joint T-S histogram, GB/s per chip.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N, ...}

The baseline is the reference algorithm (xgcm/xhistogram's numpy path:
searchsorted + ravel_multi_index + bincount, reference core.py:73-186) on
this host's CPU on a subsample, scaled linearly (the algorithm is O(n));
see BASELINE.md. "vs_baseline" compares against PINNED_BASELINE — a
median-of-9 measurement taken once on a quiet host (scripts/pin_baseline.py;
VERDICT r4: the previously re-measured-per-run ratio swung 90x-1242x with a
constant TPU numerator because the driver's bench runs share the host with
other load). "vs_baseline_live" is the same ratio against a fresh best-of-3
re-measurement for drift detection. "value" is the TPU throughput in GB of
input consumed per second (two float32 arrays => 8 bytes per element-pair).
"""

import json
import sys
import time

import numpy as np

#: reference-numpy-path throughput pinned on a quiet host
#: (scripts/pin_baseline.py — re-measure only on demand, never per-run)
PINNED_BASELINE = {
    "gbps": 0.0649,
    "median_ms": 1233.4,
    "reps": 9,
    "elems": 10_000_000,
    "date": "2026-08-19",
    "host": "Intel(R) Xeon(R) Processor @ 2.10GHz x1",
}


def wait_for_backend(
    budget_s=1500.0,
    probe_timeout_s=110.0,
    probe=None,
    sleep=None,
    clock=None,
    log=None,
):
    """Block until the JAX backend answers a cheap ``jax.devices()`` probe,
    retrying with backoff through transient TPU-runtime outages.

    The r3 driver bench run died on a single transient
    ``UNAVAILABLE: TPU backend setup/compile error`` at first backend
    contact, costing the round its only driver-verified perf artifact
    (VERDICT r3). The remote TPU runtime here recovers on its own within
    minutes (CLAUDE.md), so the fix is the prescribed probe-retry loop:
    a SUBPROCESS probe under a hard timeout (first contact can hang >40
    min during outages — an in-process attempt would wedge this process),
    retried with backoff until ``budget_s`` is spent. Returns the backend
    platform string on success, None when the budget ran out (the caller
    proceeds and lets the real run surface the error).

    ``probe``/``sleep``/``clock``/``log`` are injectable for tests.
    """
    import subprocess

    if probe is None:

        def probe(timeout_s):
            try:
                res = subprocess.run(
                    [
                        sys.executable,
                        "-c",
                        "import jax; print(jax.devices()[0].platform)",
                    ],
                    timeout=timeout_s,
                    capture_output=True,
                    text=True,
                )
            except subprocess.TimeoutExpired:
                return None
            if res.returncode == 0 and res.stdout.strip():
                return res.stdout.strip().splitlines()[-1]
            return None

    sleep = sleep or time.sleep
    clock = clock or time.monotonic
    log = log or (lambda msg: print(msg, file=sys.stderr))

    deadline = clock() + budget_s
    attempt = 0
    while True:
        attempt += 1
        t0 = clock()
        platform = probe(probe_timeout_s)
        if platform is not None:
            if attempt > 1:
                log(f"# backend up after {attempt} probes")
            return platform
        remaining = deadline - clock()
        if remaining <= 0:
            log(
                f"# backend probe budget exhausted after {attempt} attempts; "
                f"proceeding anyway"
            )
            return None
        backoff = min(60.0, 5.0 * attempt, max(remaining, 0.0))
        log(
            f"# backend probe {attempt} failed ({clock() - t0:.0f}s); "
            f"retrying in {backoff:.0f}s ({remaining:.0f}s budget left)"
        )
        sleep(backoff)


def reference_numpy_ts(t, s, t_edges, s_edges):
    """The reference's exact numpy hot path (cited: reference core.py:73-83,
    163-186): searchsorted-right with inclusive last edge, ravel to joint
    bins, one flat bincount, trim the out-of-range slots."""
    hist_shapes = [len(t_edges) + 1, len(s_edges) + 1]

    def ss_inclusive(a, b):
        idx = np.searchsorted(b, a, side="right")
        idx[a == b[-1]] -= 1
        return idx

    it = ss_inclusive(t.ravel(), t_edges)
    is_ = ss_inclusive(s.ravel(), s_edges)
    flat = np.ravel_multi_index([it, is_], hist_shapes)
    bc = np.bincount(flat, minlength=hist_shapes[0] * hist_shapes[1])
    return bc.reshape(hist_shapes)[1:-1, 1:-1]


def main():
    # Outage-proofing: don't touch the backend in-process until a cheap
    # subprocess probe confirms it answers (transient TPU outages recover
    # within minutes; an unprotected first contact can hang or die).
    wait_for_backend()

    import jax
    import jax.numpy as jnp

    from xhistogram_tpu.core import histogram

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    # --- problem: watermass T-S diagram (BASELINE.md config 3) -------------
    # 2**30 ≈ 1.07e9 elements: 4096-aligned so the kernel's element-stream
    # reshape is copy-free (no 4GB pad transient on a 16GB chip).
    n_total = 1 << 30 if on_tpu else 10_000_000
    nrows = 1024 if on_tpu else 1000
    ncols = n_total // nrows
    t_edges = np.linspace(-2.0, 30.0, 281).astype(np.float32)   # 280 T bins
    s_edges = np.linspace(30.0, 40.0, 341).astype(np.float32)   # 340 S bins

    bytes_per_run = nrows * ncols * 4 * 2
    best = "pallas" if on_tpu else "scatter"

    # Input generation is fused into the timed program: the runtime stages
    # device buffers for custom-call operands, so two externally-held 4.3 GB
    # inputs plus their staging would exceed HBM; generated-in-program data
    # keeps peak memory at ~1x. The reported GB/s therefore *includes* the
    # RNG+transform cost (conservative for the histogram kernel itself).
    @jax.jit
    def gen_and_hist(key):
        kt, ks = jax.random.split(key)
        T = 14.0 + 8.0 * jax.random.normal(kt, (nrows, ncols), jnp.float32)
        S = 35.0 + 1.5 * jax.random.normal(ks, (nrows, ncols), jnp.float32)
        return histogram(T, S, bins=[t_edges, s_edges], method=best)[0]

    key = jax.random.PRNGKey(0)
    # NOTE: timing forces a host transfer of the (small) result —
    # block_until_ready does not reliably wait under the axon remote backend.
    np.asarray(gen_and_hist(key))  # compile + settle
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(gen_and_hist(key))
        times.append(time.perf_counter() - t0)
    print(f"# per-rep ms: {[round(t*1e3, 1) for t in times]}", file=sys.stderr)
    dt = float(np.median(times))
    gbps = bytes_per_run / dt / 1e9
    print(f"# full run method={best}: {dt*1e3:.1f} ms, {gbps:.1f} GB/s "
          f"(incl. on-device data generation)", file=sys.stderr)

    # --- correctness vs numpy oracle on a slice ----------------------------
    slice_cols = max(1, min(ncols, 16384))
    kt, ks = jax.random.split(key)
    Ts = 14.0 + 8.0 * jax.random.normal(kt, (nrows, slice_cols), jnp.float32)
    Ss = 35.0 + 1.5 * jax.random.normal(ks, (nrows, slice_cols), jnp.float32)
    t_np = np.asarray(Ts, dtype=np.float32)
    s_np = np.asarray(Ss, dtype=np.float32)
    expected = reference_numpy_ts(t_np, s_np, t_edges, s_edges)
    got = np.asarray(
        histogram(Ts, Ss, bins=[t_edges, s_edges], method=best)[0]
    )
    parity = bool(np.array_equal(got, expected))
    print(f"# count parity vs reference numpy path: {parity}", file=sys.stderr)

    # --- baseline: reference numpy path on CPU, subsample × linear scale ---
    # live re-measurement (drift detection only; the headline ratio uses
    # the pinned constant — see module docstring)
    nb = 10_000_000
    tb, sb = t_np.ravel()[:nb], s_np.ravel()[:nb]
    base_dt = float("inf")
    for _ in range(3):  # best-of-3: conservative (fastest) baseline
        t0 = time.perf_counter()
        reference_numpy_ts(tb, sb, t_edges, s_edges)
        base_dt = min(base_dt, time.perf_counter() - t0)
    base_gbps = nb * 8 / base_dt / 1e9
    print(f"# live baseline (reference numpy path, {nb:.0e} elems): "
          f"{base_dt*1e3:.0f} ms → {base_gbps:.2f} GB/s "
          f"(pinned: {PINNED_BASELINE['gbps']} GB/s, "
          f"{PINNED_BASELINE['date']}, {PINNED_BASELINE['host']})",
          file=sys.stderr)

    pinned_gbps = PINNED_BASELINE["gbps"] or base_gbps
    result = {
        "metric": "joint_TS_histogram_1e9_elem_280x340_bins",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / pinned_gbps, 2),
        "baseline_pinned_gbps": PINNED_BASELINE["gbps"],
        "vs_baseline_live": round(gbps / base_gbps, 2),
        "method": best,
        "count_parity": parity,
        "backend": backend,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

"""Huge-slot fallback probe: scatter vs sort beyond the fused caps.

The r3 cap measurements (scripts/r3_caps.py) showed the sort fallback
crashing the TPU worker on weighted 16.8M-slot grids (its bucket-boundary
positions array is (chunk_rows, n_slots + 1) — the memory-bounded scan in
ops/bincount.py now fixes that). This probe measures which XLA strategy
should own the beyond-the-cap regime: sort pays O(n_slots log c) boundary
queries, scatter pays O(c) scatter-adds + O(n_slots) output init, so
scatter should win once n_slots is large.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/hugeslot_fallback_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

C = 1 << 26  # 67M element pairs (~0.5 GB of f32 inputs, generated on device)


def timed(fn, reps=3):
    out = fn()  # compile + warm
    np.asarray(out)  # tunnel-safe sync (block_until_ready unreliable here)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def run_case(n_side, weighted, method, c=C):
    n_slots = n_side * n_side + 1  # + trash slot, as core lays it out

    @jax.jit
    def prog():
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        # joint-bin indices in [0, n_slots): synthetic digitize output
        g = jax.random.randint(k1, (1, c), 0, n_slots, jnp.int32)
        w = jax.random.uniform(k2, (1, c), jnp.float32) if weighted else None
        from xhistogram_tpu.ops.bincount import bincount2d

        out = bincount2d(g, w, n_slots, method=method)
        # reduce the output to a scalar so the tunnel transfer is free
        return out.sum()

    try:
        dt = timed(prog)
        gbs = c * (8 if weighted else 4) / dt / 1e9
        return f"{gbs:8.4f} GB/s ({dt*1e3:8.1f} ms)"
    except Exception as e:  # noqa: BLE001 - probe records failures
        return f"FAIL: {type(e).__name__}: {str(e)[:80]}"


def main():
    print("backend:", jax.default_backend())
    if len(sys.argv) > 1:
        # explicit-case mode: each arg is "n_side,u|w,method[,c]". Run
        # crash-prone (sort) cases one per process: a crashed TPU worker
        # wedges every subsequent case in the same process.
        for spec in sys.argv[1:]:
            parts = spec.split(",")
            n_side = int(parts[0])
            weighted = parts[1] == "w"
            method = parts[2]
            c = int(parts[3]) if len(parts) > 3 else C
            tag = (f"{n_side}x{n_side} ({n_side*n_side/1e6:.1f}M) "
                   f"{'w' if weighted else 'u'} {method:7s} c={c}")
            print(f"{tag}: {run_case(n_side, weighted, method, c)}",
                  flush=True)
        return
    print(f"C = {C} elements per call")
    for n_side in (2048, 2896, 4096, 5793, 8192):
        for weighted in (False, True):
            for method in ("sort", "scatter"):
                tag = f"{n_side}x{n_side} ({n_side*n_side/1e6:.1f}M) " \
                      f"{'w' if weighted else 'u'} {method:7s}"
                print(f"{tag}: {run_case(n_side, weighted, method)}",
                      flush=True)


if __name__ == "__main__":
    main()

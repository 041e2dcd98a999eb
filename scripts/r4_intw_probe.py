"""Chip probe: the integer-digit weighted kernels lower through Mosaic and
match the exact oracle on the real TPU (interpret mode can't prove either).

Covers: int32 VMEM weight operands, in-kernel digit extraction (shifts /
compares / int32 mul on (1,E)), digit staging (int32-select by default,
f32 product under XHIST_INTW_SELECT=0), int32 output accumulation — per
kernel family and digit count.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_intw_probe.py
"""

import time

import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), f"({time.time()-t0:.0f}s)", flush=True)

from xhistogram_tpu.core import histogram


def wrapped_int32(exp_obj):
    return (
        np.vectorize(lambda v: (int(v) + 2**31) % 2**32 - 2**31,
                     otypes=[np.int64])(exp_obj)
    ).astype(np.int32)


def oracle(datas, edges_list, w, axis=None):
    datas64 = [np.asarray(d, np.float64) for d in datas]
    if axis is None:
        flat = [d.ravel() for d in datas64]
        wf = np.broadcast_to(w, datas64[0].shape).ravel()
        nb = [len(e) - 1 for e in edges_list]
        out = np.zeros(nb, object)
        for i in range(flat[0].size):
            g = []
            ok = True
            for d, e in zip(flat, edges_list):
                x = d[i]
                k = np.searchsorted(e, x, side="right") - 1
                if x == e[-1]:
                    k = len(e) - 2
                if k < 0 or k > len(e) - 2:
                    ok = False
                    break
                g.append(k)
            if ok:
                out[tuple(g)] += int(wf[i])
        return out
    m = datas64[0].shape[0]
    return np.stack(
        [oracle([d[i] for d in datas64], edges_list,
                np.broadcast_to(w, datas64[0].shape)[i]) for i in range(m)]
    )


CASES = [
    # (name, n_inputs, shape, axis, nbins, wspan)
    ("one_input 1digit", 1, (4096,), None, (16,), (0, 100)),
    ("one_input 4digit", 1, (4096,), None, (16,), (-(2**30), 2**30)),
    ("one_input kept rows 2digit", 1, (16, 512), (1,), (16,), (-9000, 9000)),
    ("joint2 2digit", 2, (8192,), None, (24, 21), (-9000, 9000)),
    ("joint2 4digit", 2, (8192,), None, (24, 21), (-(2**30), 2**30)),
    ("factored 3digit", 2, (8192,), None, (60, 55), (-(2**20), 2**20)),
    ("factored_per_row 4digit", 1, (16, 1024), (1,), (700,),
     (-(2**30), 2**30)),
    ("direct 2digit", 2, (12, 64), (1,), (6, 5), (-9000, 9000)),
]

fails = 0
for name, n_inputs, shape, axis, nbins, wspan in CASES:
    rng = np.random.RandomState(abs(hash(name)) % 2**31)
    datas = [rng.randn(*shape).astype(np.float32) for _ in range(n_inputs)]
    edges_list = [np.linspace(-2.5, 2.5, nb + 1) for nb in nbins]
    w = rng.randint(wspan[0], wspan[1] + 1, shape).astype(np.int32)
    exp = wrapped_int32(oracle(datas, edges_list, w, axis=axis))
    t1 = time.time()
    try:
        h, _ = histogram(*datas, bins=edges_list, weights=w, axis=axis,
                         method="pallas")
        got = np.asarray(h)
        ok = got.dtype == np.int32 and np.array_equal(got, exp)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        fails += 1
        continue
    print(f"{name}: {'OK' if ok else 'MISMATCH'} ({time.time()-t1:.0f}s)",
          flush=True)
    if not ok:
        fails += 1
        bad = np.argwhere(got != exp)[:5]
        print("  first diffs:", [(tuple(b), got[tuple(b)], exp[tuple(b)])
                                 for b in bad], flush=True)

print("RESULT:", "ALL OK" if fails == 0 else f"{fails} FAILURES", flush=True)

"""Config-4 RTT decomposition (VERDICT r2 #10): prove that repeated cached
labeled calls are tunnel-RTT-bound, not device/host-work bound, by
separating per-call device+host work from the transfer round trip.

Three measurements on the BASELINE config-4 problem (~405k elems):
  1. per-call WITH a host transfer each time (what run_baselines times);
  2. per-call WITHOUT transfers (async dispatch; one final transfer) —
     per-call host prep + device work, RTT amortized to 1/N;
  3. the cached jitted pipeline called directly on device-resident data —
     pure dispatch+device time.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/labeled_rtt.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xhistogram_tpu.labeled import NamedArray, histogram
import xhistogram_tpu.labeled.api as api

N = 20

nt, nlat, nlon = 100, 45, 90
sst = NamedArray(
    20
    + 5
    * np.asarray(
        jax.random.normal(jax.random.PRNGKey(4), (nt, nlat, nlon), jnp.float32)
    ),
    ("time", "lat", "lon"),
    coords={"lat": np.linspace(-88, 88, nlat), "lon": np.linspace(2, 358, nlon)},
    name="sst",
)
e4 = np.linspace(0, 40, 81)

print("backend:", jax.default_backend(), flush=True)

# compile + warm cache
np.asarray(histogram(sst, bins=[e4], dim=["time"]).data)

# 1. transfer per call
t0 = time.perf_counter()
for _ in range(N):
    np.asarray(histogram(sst, bins=[e4], dim=["time"]).data)
per_call_xfer = (time.perf_counter() - t0) / N

# 2. async dispatch, one final transfer
t0 = time.perf_counter()
for _ in range(N):
    r = histogram(sst, bins=[e4], dim=["time"]).data
np.asarray(r)
per_call_async = (time.perf_counter() - t0) / N

# 3. cached pipeline fn directly on device-resident data
assert len(api._PIPELINE_CACHE) >= 1
run = next(iter(api._PIPELINE_CACHE.values()))
dev = jnp.asarray(sst.data)
np.asarray(run(dev))
t0 = time.perf_counter()
for _ in range(N):
    r = run(dev)
np.asarray(r)
per_call_dev = (time.perf_counter() - t0) / N

print(f"per-call with transfer : {per_call_xfer*1e3:8.2f} ms", flush=True)
print(f"per-call async (1 xfer): {per_call_async*1e3:8.2f} ms", flush=True)
print(f"cached fn, device data : {per_call_dev*1e3:8.2f} ms", flush=True)
print(
    f"=> RTT share of a timed call: "
    f"{100*(per_call_xfer-per_call_async)/per_call_xfer:.0f}%  "
    f"(host prep per call ≈ {1e3*(per_call_async-per_call_dev):.2f} ms)",
    flush=True,
)

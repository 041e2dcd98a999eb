"""FTZ exactness fix shared by the Pallas kernels and the XLA digitize.

One definition so the kernel and XLA semantics cannot desynchronize (the
r2 FTZ regression came from exactly this kind of hand-synced copy; see
core.device_view's history note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fix_neg_subnormals"]


def fix_neg_subnormals(x):
    """FTZ exactness fix (f32 only): the device flushes subnormal operands
    to ±0 in comparisons (probed on the real chip AND in the TPU-semantics
    interpreter), so a negative-subnormal data value would land on the
    wrong side of a t == 0.0 threshold — the one representable threshold
    between it and its flushed value (thresholds strictly inside
    (-tiny, 0) are subnormal themselves and already take the exact host
    path, core.ftz_exact_fallback). Rewrite negative subnormals to
    -tiny_normal via BITWISE detection (integer ops don't flush): every
    comparison against every representable non-subnormal threshold is
    unchanged. NaN/±inf/-0.0 untouched. ~5 VPU ops per element — applied
    unconditionally on float32 data rows (0.3-3% of kernel VPU work);
    harmless no-op semantics on CPU."""
    if x.dtype != jnp.float32:
        return x
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    mag = xi & jnp.int32(0x7FFFFFFF)
    neg_subn = (xi < 0) & (mag != 0) & (mag < jnp.int32(0x00800000))
    return jnp.where(neg_subn, jnp.float32(-1.1754943508222875e-38), x)

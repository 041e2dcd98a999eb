"""Pallas TPU histogram kernels: fused digitize → joint index → MXU counting.

This is the framework's native layer — the TPU equivalent of the numpy C
kernels the reference reaches through ``searchsorted`` / ``ravel_multi_index``
/ ``bincount`` (reference core.py:10-17, hot loop core.py:73-83,163-186).
Each kernel fuses the whole inner pipeline over VMEM-resident tiles so every
input element is read from HBM exactly once. TPUs have no fast scatter, so
counting is reformulated as MXU matmuls over one-hot / cumulative compare
matrices (every building-block op is empirically verified against Mosaic on
this chip; see scripts/mosaic_probe.py).

Three specializations, auto-dispatched by ``pallas_histogram2d``:

``one_input`` (1 input, any number of kept rows)
    Per-bin membership-row matrix ``A[k, e] = (lo_k <= a_e < hi_k)`` (last
    bin right-closed via an equality term, matching reference
    core.py:163-174); one matmul against the row/weight one-hot gives the
    per-row counts directly. Work: O(n_bins) VPU ops/element, the MXU does
    the reduction, no cumulative-difference cancellation in weighted mode.
    NaN fails every compare → contributes nowhere (== reference's
    NaN→overflow→trim).

``joint2`` (2 inputs, full reduction)
    Factored one-hot matmul: ``counts(Na, Nb) = A(Na, E) ·ᵉ B(Nb, E)`` where
    ``A``/``B`` are per-bin membership rows built from lo/hi edge compares.
    One-hot construction is O(n_edges_a + n_edges_b) per element on the VPU;
    the O(Na·Nb) joint work runs on the MXU at full utilization — no joint
    slot-count cap.

``factored`` (any input count; joint grids to ~8M slots, n1-chunked in HBM)
    Digitize to the flat joint slot id, split it into two integer
    sub-indices, equality one-hots on each, one matmul over the factorized
    (n1, n2) slot space — O(Σ n_edges + √slots) VPU work per element. Runs
    reduce-all or per kept row (rows force-folded so each tile holds one
    real row); grids whose (n1, n2) output exceeds the VMEM budget stream
    n1-row chunks against an HBM-resident grid.

``direct`` (kept rows with narrow reduce axes; slots ≤ 8192)
    Flat joint slot one-hot ``G(slot_chunk, E)`` against the row one-hot
    ``R(tm, E)``; slot-chunked grid bounds VMEM (the Pallas analog of the
    reference's ``block_size`` memory bound, core.py:86-134).

Kept-row handling: when the canonical layout has fewer than 8 rows, rows are
*split* into synthetic sub-rows (elements are exchangeable within a row's
reduction) instead of padding to the f32 sublane minimum — no padded-row
compute. The wrapper re-merges synthetic rows with one cheap sum.

All accumulation is deterministic: the TPU grid is sequential, and the
output block for a row/slot tile is revisited across column steps
(SURVEY.md §5 determinism note). Unweighted counts use int8 one-hots with
int32 MXU accumulation (2x the bf16 rate on v5e, purely integral — r2;
XHIST_INT8_ONEHOT=0 restores bf16 operands + f32 accumulation, exact for
per-tile partials ≤ E < 2²⁴); weighted counts keep f32 weights split into
bf16 parts and accumulate f32.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_histogram2d", "supports", "plan"]

_LANE = 128
_SUB = 8  # f32 sublane tile

# VMEM working-set budget (bytes) for the per-tile one-hot matrices; larger
# tiles amortize grid-step overhead, smaller ones fit more kernels. Tuned
# on-chip (scripts/tile_sweep.py); env-overridable for sweeps.
import os as _os

_VMEM_BUDGET = int(_os.environ.get("XHIST_VMEM_BUDGET", 24 << 20))
_MAX_TC = int(_os.environ.get("XHIST_MAX_TC", 8192))
# Mosaic's scoped-vmem default (16 MB on v5e) is far below the 128 MB of
# physical VMEM; raise it so the tile budgets above are the real constraint
# (the budget sizing keeps double-buffering headroom).
_VMEM_LIMIT = int(_os.environ.get("XHIST_VMEM_LIMIT", 64 << 20))
# Edge-chunk width of the unrolled digitize loop (factored/direct kernels):
# wider chunks mean fewer unrolled compare+sum steps (compile time scales
# with the step count for many-edge bins) at a slightly larger rank-3 temp.
_DIG_CHUNK = int(_os.environ.get("XHIST_DIG_CHUNK", 32))
if _DIG_CHUNK <= 0 or _DIG_CHUNK % _SUB:
    # the fori digitize's pl.ds loads need sublane-aligned starts, and
    # _edges_col pads edge columns to this value — a non-multiple-of-8
    # override would fail deep inside Mosaic lowering instead of here
    raise ValueError(
        f"XHIST_DIG_CHUNK={_DIG_CHUNK}: must be a positive multiple of "
        f"{_SUB} (sublane-tile alignment of the digitize pl.ds chunks)"
    )
# Edge count beyond which the digitize loop switches from a python unroll
# (best Mosaic pipelining) to a fori_loop over aligned dynamic chunks
# (compile time stays O(1) in the edge count; runtime stays linear).
_DIG_UNROLL_MAX = int(_os.environ.get("XHIST_DIG_UNROLL_MAX", 1024))
# Total-edge cap of the fused kernels (the per-element digitize is O(edges)
# VPU work; beyond this the XLA strategies win). The fori digitize keeps
# compile time flat, so the cap is a runtime crossover, not a compile bound.
_MAX_EDGES = int(_os.environ.get("XHIST_MAX_EDGES", 32768))


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


# Unweighted one-hot matmuls run int8·int8→int32 on the MXU: v5e does int8
# at 2x the bf16 rate AND the accumulation becomes purely integral (no f32
# round trip). Probed on this chip r2 (scripts/int8_reprobe.py — the r1
# toolchain could not lower int8 matmuls; this one can). Env escape hatch
# in case a future toolchain regresses.
_INT8_ONEHOT = _os.environ.get("XHIST_INT8_ONEHOT", "1") == "1"


def _onehot_dtypes():
    """(one-hot operand dtype, matmul accumulator dtype) for unweighted
    counting matmuls."""
    if _INT8_ONEHOT:
        return jnp.int8, jnp.int32
    return jnp.bfloat16, jnp.float32


# Weighted-matmul mode:
#   "split" (default): two bf16 parts hi+lo per weight (~17 mantissa bits,
#       RELATIVE ~3.8e-6 error per weight); two bf16 matmuls ≈ 2x
#       unweighted cost. Measured r3: 83% of its own 2-section MXU roof.
#   "i8x3": three per-tile-scaled int8 limbs w ≈ s(q1 + q2/128 + q3/2^14);
#       all three matmuls at the int8 MXU rate (2x bf16) with exact int32
#       accumulation ⇒ 1.5 bf16-section-equivalents. Error is ABSOLUTE:
#       <= s/2^15 ≈ 2.4e-7 x the tile's max |weight| per weight — TIGHTER
#       than split whenever nonzero weights span <= ~15x. Measured r3 on
#       the weighted T-S bench: speed-NEUTRAL vs split (the third
#       quantize-lhs VPU build eats the 25% MXU saving), so it is a
#       precision option, not a speed one.
#   "i8": two int8 limbs (fastest, ~+20%; ~3e-5 x max|tile weight| —
#       opt-in lossy).
#   "highest": three-limb bf16 split (per-weight EXACT: 3x8 mantissa bits
#       cover f32's 24; every residual subtraction error-free) + Kahan
#       cross-tile accumulation ⇒ 3 bf16 sections, ~1.5x split's cost.
#       Replaced r3's-end f32-HIGHEST matmul (~6 bf16 passes, measured
#       ~5x split) with identical error model: exact products, f32
#       per-tile accumulation, O(1)-ulp cross-tile totals.
# The resolved mode is threaded through the kernel stack as a static
# argument (one jit trace per mode — module globals are NOT part of the
# jit key, so per-call selection must not mutate them).
_WEIGHTED_MODE = _os.environ.get("XHIST_WEIGHTED_PRECISION", "split")
_WEIGHTED_MODES = ("split", "highest", "i8", "i8x3")
if _WEIGHTED_MODE not in _WEIGHTED_MODES:
    raise ValueError(
        f"XHIST_WEIGHTED_PRECISION={_WEIGHTED_MODE!r}: valid values are "
        f"{_WEIGHTED_MODES}"
    )


def _int_wmode(wmode):
    """Digit count of an internal integer-weight mode ("int1".."int4",
    derived upstream from the weights' dtype/range — never user-typed), or
    None for the float precision modes."""
    if isinstance(wmode, str) and wmode.startswith("int") and wmode[3:].isdigit():
        return int(wmode[3:])
    return None


def _dig_wmode(wmode):
    """Digit count of an internal PER-DIGIT-OUTPUT integer mode ("dig1"..
    "dig5", core's exact wide-weight/f64 engine — never user-typed), or
    None. Like "intN" the kernel extracts N signed base-256 digits from
    int32 weights and runs one int8 MXU section per digit, but it SKIPS
    the shift-combine and writes each digit's per-slot int32 sums to its
    own output — the caller recombines in 64-bit host arithmetic, so one
    digitize is shared across all N digits of a weight word
    (doc/perf_model.md headroom 5; the r4 engine paid one full pass per
    digit). N == 5 covers any int32 word exactly (the 5th digit is the
    signed extraction's {-1,0,1} remainder — intweights.WORD_MAX_DIGITS)."""
    if isinstance(wmode, str) and wmode.startswith("dig") and wmode[3:].isdigit():
        return int(wmode[3:])
    return None


def _resolve_wmode(wmode):
    """Resolve a per-call mode request against the env default (``None``
    = no caller preference; any other value — including "" — must be a
    real mode). Internal integer-weight modes ("intN", derived from the
    weights dtype by core, not user input) pass through."""
    mode = _WEIGHTED_MODE if wmode is None else wmode
    if _int_wmode(mode) is not None or _dig_wmode(mode) is not None:
        return mode
    if mode not in _WEIGHTED_MODES:
        raise ValueError(
            f"weighted precision mode {mode!r}: valid values are "
            f"{_WEIGHTED_MODES}"
        )
    return mode


def validate_public_precision(precision):
    """Validate a user-supplied ``precision=`` value (all public entry
    points call this). The internal integer modes ("intN" / "digN") are
    derived from the weights dtype by core and REJECTED here: selecting
    them directly on float weights would silently truncate the weights to
    int32 (r5 — previously "intN" slipped through ``_resolve_wmode``)."""
    if _int_wmode(precision) is not None or _dig_wmode(precision) is not None:
        raise ValueError(
            f"weighted precision mode {precision!r} is internal (derived "
            f"from integer weights); valid values are {_WEIGHTED_MODES} "
            "and 'f64'"
        )
    _resolve_wmode(precision)


def _weight_rhs_dtype(wmode):
    """dtype the weighted kernels build their one-hot rhs in."""
    if wmode in ("i8", "i8x3") or _int_wmode(wmode) is not None \
            or _dig_wmode(wmode) is not None:
        return jnp.int8
    return jnp.bfloat16


def _weight_operand_dtype(wmode):
    """dtype the wrappers stage the weights operand in: integer modes keep
    weights integral end-to-end (int32 VMEM tiles), float modes take f32."""
    integral = _int_wmode(wmode) is not None or _dig_wmode(wmode) is not None
    return jnp.int32 if integral else jnp.float32


def _weighted_out_dtype(wmode):
    """Per-slot accumulator/output dtype of the weighted kernels."""
    integral = _int_wmode(wmode) is not None or _dig_wmode(wmode) is not None
    return jnp.int32 if integral else jnp.float32


def _as_int32_weights(w2d):
    """Weights tile as int32 for the integer modes: uint32 is BITCAST (the
    digit algebra is mod 2**32 — XLA's u32→s32 convert semantics must not
    enter); narrower ints convert exactly."""
    if w2d.dtype == jnp.uint32:
        return jax.lax.bitcast_convert_type(w2d, jnp.int32)
    return w2d.astype(jnp.int32)


def _stage_weights(w2d, wmode):
    """Weights operand in the mode's staging dtype (see
    _weight_operand_dtype): int32 for the integer digit modes (uint32
    bitcast — mod-2**32 algebra), f32 for the float precision modes."""
    if _int_wmode(wmode) is not None or _dig_wmode(wmode) is not None:
        return _as_int32_weights(w2d)
    return w2d.astype(jnp.float32)
# Split-mode matmul form: two plain dots vs one concat-stacked dot
# (measured equal-throughput on v5e; two dots avoid the sublane concat copy)
_SPLIT_TWO_DOTS = _os.environ.get("XHIST_SPLIT_TWO_DOTS", "0") == "1"
# joint2 unweighted E-axis sub-chunking: issuing the one-hot build and the
# dot per sub-chunk lets Mosaic overlap the VPU (next chunk's compare+cast)
# with the MXU (current chunk's matmul). Measured on the 1e9-element T-S
# bench: k=1 10.14 GB/s, k=2 10.53, k=4 10.97, k=8 11.12, k=16 11.20.
_JOINT2_ESPLIT = int(_os.environ.get("XHIST_JOINT2_ESPLIT", "16"))
# intN digit staging: 1 (default) = pure-integer select (jnp.where of the
# (1,E) int32 digit row into the one-hot positions, then narrow to int8);
# 0 = f32 product + cast (the i8-mode lowering the intN branch first
# borrowed). The modes are staging-bound at 1-2 digits, and the select
# build skips the bool→f32 cast + f32 multiply per digit: measured on chip
# (scripts/r4_intw_perf.py under XHIST_INTW_SELECT=0/1, weighted T-S,
# 2^28 elems) int1 10.66 → 16.00 GB/s kern, int2 6.62 → 8.51,
# int4 4.04 → 4.66; parity re-proven by scripts/r4_intw_probe.py.
_INTW_SELECT = _os.environ.get("XHIST_INTW_SELECT", "1") == "1"
# The float-mode analogs of the intN staging A/B, measured on chip
# (scripts/r4_floatw_stage.py, weighted T-S 2^28 elems):
#  - i8/i8x3 limbs are integer-valued f32: select-then-narrow exactly as
#    intN (int32 select avoids the int8-mask relayout hazard) — i8
#    6.01 → 7.49 GB/s kern (+25%), i8x3 4.68 → 5.53 (+18%); DEFAULT ON.
#  - split/highest bf16 limb staging: a DIRECT bf16 select fails to lower
#    (Mosaic "invalid relayout", (8,128) i1 mask vs (16,128) bf16 tiling —
#    the int8 hazard's bf16 twin); the f32-select+narrow route lowers but
#    measures FLAT (split 4.87→4.86, highest 3.30→3.30 — one f32 select +
#    f32→bf16 cast per limb costs the same as the shared bool→bf16 cast +
#    bf16 multiply). Negative result; default stays off.
_I8_SELECT = _os.environ.get("XHIST_I8_SELECT", "1") == "1"
_BF16_SELECT = _os.environ.get("XHIST_BF16_SELECT", "0") == "1"
# Nonfinite-weight faithfulness (see ops/nonfinite.py): matmul counting
# computes w·onehot products, so a NaN/±inf weight times a *zero* one-hot
# entry would poison every slot of its row-block (NaN·0 = NaN), where the
# reference's scatter-add semantics poison only the element's own bin
# (reference core.py:81 — np.bincount). Faithful mode sanitizes the weights
# and accumulates three indicator channels (nan/+inf/-inf per-slot counts)
# via a stacked matmul gated per tile on any(nonfinite) — free on clean
# data; XHIST_ASSUME_FINITE_WEIGHTS=1 skips it entirely.
from . import nonfinite as _nonfinite
from .. import bins as _bins

_ASSUME_FINITE = _nonfinite.ASSUME_FINITE
_resolve_nonfinite = _nonfinite.resolve


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _weighted_full_cap(wmode):
    """Weighted full-reduction slot cap per precision mode.

    The r3 crossover measurement (scripts/fused_midslot_probe.py) that set
    the 2^18 cap ran the DEFAULT split mode (2 bf16 MXU sections per
    element·slot). The other modes pay proportionally different MXU costs —
    int1 0.25x split, int2/i8 0.5x, i8x3 0.75x, int3 0.75x, int4 1.0x,
    highest 1.5x — so their fused rates cross the ~flat scatter fallback at
    different slot counts. Measured per mode at c=1e7
    (scripts/r4_wmode_caps.py, r4): the cheap integer modes keep beating
    scatter 2-4x past 2^18 and their caps move to the measured crossovers;
    'highest' keeps the split cap even though scatter is marginally faster
    near it — an explicit precision='highest' request is an exactness
    request, and the f32 scatter-add fallback has a different error model
    (per-element rounding instead of exact products + Kahan), so speed must
    not silently trade it away.
    """
    mode = _resolve_wmode(wmode)
    n = _int_wmode(mode)
    nd = _dig_wmode(mode)
    if nd is not None:
        n = min(nd, 4)  # same MXU cost model as intN (one i8 section/digit)
    if n is not None:
        # int1 wins to ~2^20, int2/int3 to ~2^19 (measured); int4 carries
        # the split-cost cap (2 sections-equivalent)
        return 1 << max(18, min(20, 21 - n))
    return {"split": 1 << 18, "i8": 1 << 19, "i8x3": 1 << 19,
            "highest": 1 << 18}[_resolve_wmode(wmode)]


def plan(n_inputs, nbins, m, c=None, weighted=False, n_outs=None,
         uniform=None, wmode=None):
    """Single source of truth for kernel selection: the kernel name this
    problem shape runs on efficiently, or ``None`` when the XLA strategies
    are the better/safer choice. BOTH ``supports()`` ('auto' upstream
    gating) and ``_dispatch`` (actual kernel choice) consume this table, so
    the boundaries cannot drift apart.

    ``m == 1`` means a full reduction (the canonical layout of reduce-all).
    ``n_outs`` is the number of per-slot output accumulators the weighted
    kernels carry (1 + Kahan/faithful channels); None = the conservative
    worst case (5) used by upstream gating before the weights dtype is
    known. Weighted faithful-nonfinite mode carries 3 extra per-slot channel
    accumulators (see _weighted_dot), so its VMEM-resident joint-grid cap is
    lower. Kept-row (m > 1) problems ride ``one_input``/``direct`` for small
    grids and the per-row factored kernel for large ones — the latter needs
    a reasonably wide reduce axis (c) to fill its per-row tiles.
    """
    n_real = math.prod(int(b) for b in nbins)
    n_slots = n_real + 1
    # Full-reduction factored cap: the kernel's O(slots)/element MXU work
    # hits a wall the XLA scatter fallback (O(1)/element serial updates,
    # ~flat 0.2-0.6 GB/s once the compare-sum digitize removed the
    # searchsorted tax) does not. Measured pipeline-vs-pipeline at c=1e7
    # (scripts/fused_midslot_probe.py, r3): unweighted fused 0.38 GB/s at
    # 1.05M slots vs scatter ~0.2-0.4 (tie band 1-4M; fused 0.109 vs
    # scatter 0.117 at 4.2M) — cap 2^21; weighted fused 0.66 at 2^18 vs
    # scatter ~0.5, 0.52 vs 0.59 at 330k, 0.033 vs 0.255 at 4.2M — cap
    # 2^18. (The r2-era sort fallback measured 0.003-0.006 GB/s and
    # crashed the worker at 16.8M weighted; scatter replaced it in the
    # auto rule, ops/bincount.py.) Kept-row regimes keep the old caps:
    # their fused kernels run 10-100x the XLA fallback (packed ~1000x)
    # and the 2^28-element output bound limits them anyway.
    # The weighted cap is per-precision-mode (_weighted_full_cap): the
    # integer digit modes run 2-4x split's MXU rate, so their crossovers
    # vs scatter sit 2-4x higher (measured, scripts/r4_wmode_caps.py).
    full_cap = _weighted_full_cap(wmode) if weighted else (1 << 21)
    kept_cap = (1 << 24) if weighted else (1 << 25)
    # The edge cap bounds the O(Σ n_edges) VPU digitize (fori-loop body,
    # flat compile time; measured 40x sort at 4k edges, 4.7x at 32k).
    # per-input digitize cost: ~25 VPU ops with a uniform-spacing
    # certificate (arithmetic digitize, r3 — measured 13-25x on 4k-16k
    # edge configs) vs 2 ops/edge for the compare chain — certified
    # inputs don't count against the edge cap
    eff_edges = sum(
        0
        if (uniform is not None and i < len(uniform) and
            uniform[i] is not None)
        else nb + 1
        for i, nb in enumerate(nbins)
    )
    edges_ok = eff_edges <= _MAX_EDGES

    uni0 = (
        uniform is not None and len(uniform) > 0 and uniform[0] is not None
    )
    # the exact arithmetic form (~25 ops/element) beats one_input's 2/bin
    # compare chain beyond 64 bins (measured tie at 64); the double-single
    # form (~190 ops, generic linspace grids) beyond ~118 (measured
    # crossover, scripts/ds_perf_probe.py: one_input 28.2 vs DS 29.8 GB/s
    # at 128 bins, 44.1 vs 31.1 at 64). WEIGHTED crossovers sit lower —
    # the weighted one_input pays the split-bf16 matmul on top of the
    # compare chain, the factored route amortizes it over fewer one-hot
    # rows (scripts/ds_weighted_probe.py, 2^28 elems: arith ties one_input
    # at 24 bins, 25.7 vs 24.4 GB/s at 32; DS ties at 80, 19.5 vs 18.0 at
    # 96) — arith routes >24, DS >80.
    uni0_min_bins = (
        ((80 if weighted else 120)
         if isinstance(uniform[0][0], str)
         else (24 if weighted else 64)) if uni0 else 0
    )
    if m == 1:
        # full reduction: one_input / joint2 / factored cover everything up
        # to the slot cap, as long as the per-element digitize cost
        # (Σ n_edges compares on the VPU) stays sane. Uniform-certified
        # single inputs beyond 64 bins run the factored kernel with the
        # arithmetic digitize instead — its VPU cost is ~25 + (n1+n2)·2.5
        # ops/element vs one_input's 2·nbins (measured: 40.5 vs 27.7 GB/s
        # at 128 bins, 32.4 vs 5.3 at 1024 — r3_uniform_oneinput.py; tie
        # at 64).
        if n_inputs == 1 and nbins[0] <= 1024 and not (
            uni0 and nbins[0] > uni0_min_bins
        ):
            return "one_input"
        if not edges_ok:
            return None
        # joint2's per-element cost is O(nb_a + nb_b) (one compare chain per
        # axis, not per slot), so the factored full_cap does NOT apply to it
        # — its own gate bounds it at ~590k slots, all of which it wins
        # (13.5 GB/s at 95k slots vs scatter's ~0.5).
        if (
            n_inputs == 2
            and _round_up(nbins[0], _SUB) + _round_up(nbins[1], _SUB) <= 1536
        ):
            return "joint2"
        if n_slots > full_cap:
            return None
        return "factored"

    # Kept rows: every pallas branch materializes (m, PADDED slots) output
    # blocks, times n_outs for weighted (Kahan compensation + 3 faithful
    # channels). Bound the total at 2^28 f32 elements (1 GB) — beyond that
    # the XLA strategies (single unpadded output) are the safer choice.
    if n_outs is None:
        n_outs = 5 if weighted else 1
    n1, log2_n2 = _pick_factorization(n_slots)
    padded_slots = max(n1 << log2_n2, _round_up(n_slots, 1024))
    if m * padded_slots * n_outs > (1 << 28):
        return None
    # kept rows: the uniform carve-out only pays when the fallback is the
    # per-row factored kernel (wide reduce axis) — narrow-c shapes would
    # land on the slower packed kernel, where one_input still wins
    if n_inputs == 1 and nbins[0] <= 1024 and not (
        uni0 and nbins[0] > uni0_min_bins and (c is None or c >= 256)
    ):
        return "one_input"
    # per-row factored beats direct at every measured grid size (direct's G
    # build costs O(n_slots) VPU ops/element and its matmul O(tm·n_slots)
    # MACs, factored O(√slots) VPU + O(slots) MACs; measured 7.3 vs 6.3 GB/s
    # at 256 slots, 7x at 7200 — scripts/perrow_perf.py) as long as the
    # reduce axis is wide enough to fill its per-row tiles
    if (
        n_slots <= kept_cap // 2
        and edges_ok
        and (c is None or c >= 256)
        and m > 1
    ):
        return "factored_per_row"
    if n_slots <= 8192:
        return "direct"
    # narrow reduce axes (c < 256) with big grids: pack rpt kept rows' slot
    # spaces into one factored space so tiles stay full (per-row tiles would
    # be mostly padding below c ~ 256 = 2·_LANE columns per sub-row).
    # rpt must match _run_factored's (same tile height + fold helper), or
    # the gate and the dispatcher drift apart under the XHIST_PACKED_TM knob.
    tm = _packed_tm()
    rpt = tm // _fold_factor(m, c if c is not None else 1)
    if rpt * n_slots <= kept_cap and edges_ok and m > 1:
        return "factored_packed"
    return None


def supports(
    n_inputs, nbins, m, weighted=False, c=None, weights_dtype=None,
    uniform=None, wmode=None,
) -> bool:
    """Whether a Pallas kernel handles this problem shape *efficiently*
    (the dispatcher itself accepts anything; 'auto' uses this to decide
    pallas vs the XLA strategies). Thin view over ``plan``.

    ``weights_dtype`` (when the caller knows it) sizes the weighted gate
    with the ACTUAL per-slot output count — integer-free/finite-assumed
    configs carry fewer channel accumulators than the conservative
    worst case, so shapes that fit them are not pushed to XLA. ``wmode``
    is the per-call weighted-precision mode (None = the env default),
    which sizes the Kahan channel highest mode adds."""
    n_outs = None
    if weighted and weights_dtype is not None:
        faithful = not _ASSUME_FINITE and jnp.issubdtype(
            weights_dtype, jnp.floating
        )
        n_outs = 1 + _weighted_extra_outputs(faithful, _resolve_wmode(wmode))
    return (
        plan(n_inputs, nbins, m, c=c, weighted=weighted, n_outs=n_outs,
             uniform=uniform, wmode=wmode)
        is not None
    )


#: kernels whose digitize reads the uniform-certificate VALUES (the rest —
#: one_input / joint2 / the XLA strategies — consult only presence + tier
#: through plan(); see core._uniform_static_key)
UNIFORM_CONSUMERS = frozenset(
    {"factored", "factored_per_row", "factored_packed", "direct"}
)


def auto_gate(n_hi_clip):
    """``method='auto'`` pallas eligibility pre-gate (backend + exactness
    constraints that hold regardless of shape): shared by core's dispatch
    (``_count_once``) and its jit-cache-key mirror
    (``core._uniform_static_key``) so the two cannot drift — a desynced
    mirror would substitute tier placeholders that a consuming kernel then
    fails to unpack. Integer weights are no longer excluded (r4): the
    integer digit modes keep them bit-exact on the fused int8 MXU path."""
    return jax.default_backend() == "tpu" and not any(n_hi_clip)


def planned_kernel(n_inputs, nbins, m, c=None, weighted=False,
                   weights_dtype=None, uniform=None, forced=False,
                   wmode=None):
    """The kernel ``_dispatch`` would run for this shape (None = XLA
    strategies): ``plan()`` plus the explicit-``method='pallas'`` fallback
    (``forced``). Single source of truth for callers that need the routing
    decision host-side (core's jit-cache-key reduction) — computed with the
    same actual-channel-count sizing as ``supports``."""
    n_outs = None
    if weighted and weights_dtype is not None:
        faithful = not _ASSUME_FINITE and jnp.issubdtype(
            weights_dtype, jnp.floating
        )
        n_outs = 1 + _weighted_extra_outputs(faithful, _resolve_wmode(wmode))
    kernel = plan(n_inputs, nbins, m, c=c, weighted=weighted, n_outs=n_outs,
                  uniform=uniform, wmode=wmode)
    if kernel is None and forced:
        kernel = "factored" if m == 1 else "direct"
    return kernel


def _max_fill(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return np.asarray(np.inf, dtype)
    return np.asarray(jnp.iinfo(dtype).max, dtype)


def _edges_col(e, pad_to=_SUB):
    """Edges as a (ne_pad, 1) VMEM column, padded with +max (no element ever
    reaches the pad rows' bins)."""
    e = jnp.asarray(e)
    ne = e.shape[0]
    ne_pad = _round_up(ne, pad_to)
    e = jnp.pad(e, (0, ne_pad - ne), constant_values=_max_fill(e.dtype))
    return e.reshape(ne_pad, 1), ne


def _edge_cols_or_dummies(edges, uniform):
    """VMEM edge columns for the digitize — except uniform-certified inputs,
    whose kernels never read the edge ref (the O(1) arithmetic/DS digitize
    recomputes thresholds in-register). Staging the real column for them
    would be a dead multi-MB VMEM operand, and certified inputs are exempt
    from the edge cap (plan()'s eff_edges) precisely because the column is
    not needed — a >2^22-edge certified grid's column alone would blow the
    VMEM limit."""
    return [
        _edges_col(
            jnp.zeros((1,), jnp.asarray(e).dtype)
            if (uniform is not None and uniform[k] is not None)
            else e,
            pad_to=_DIG_CHUNK,
        )[0]
        for k, e in enumerate(edges)
    ]


def _lo_hi_cols(e):
    """(lo, hi) edge columns for per-bin membership rows: row k is bin k,
    [lo_k, hi_k) — except the last bin, closed on the right (handled in the
    kernel with an equality term against hi[nb-1]). Rows ≥ nbins compare
    against +max → all zero. Traceable (edges may be jit tracers)."""
    e = jnp.asarray(e)
    nb = e.shape[0] - 1
    nb_pad = _round_up(nb, _SUB)
    fill = _max_fill(e.dtype)
    lo = jnp.pad(e[:-1], (0, nb_pad - nb), constant_values=fill)
    hi = jnp.pad(e[1:], (0, nb_pad - nb), constant_values=fill)
    return lo.reshape(nb_pad, 1), hi.reshape(nb_pad, 1), nb, nb_pad


def _pad2d(x, rows, cols):
    """jnp.pad only when needed — a zero-width pad can still materialize a
    copy of a multi-GB pallas operand."""
    if rows == 0 and cols == 0:
        return x
    return jnp.pad(x, ((0, rows), (0, cols)))


# Ragged input blocks: Pallas TPU tolerates input array dims that are NOT
# multiples of the block shape (boundary blocks read padding garbage, which
# every kernel here already excludes via its in-bounds masks / trash-slot
# routing). Skipping the tail pad avoids a FULL-ARRAY jnp.pad copy on every
# non-tile-aligned operand — the r2 roofline's (8, 125e6) one_input config
# lost ~40% to exactly that hidden 4 GB copy. Chip-validated
# (scripts/ragged_probe.py); XHIST_RAGGED_INPUTS=0 restores eager padding.
_RAGGED_INPUTS = _os.environ.get("XHIST_RAGGED_INPUTS", "1") == "1"


def _pad_operand(x, rows, cols):
    """Pad a DATA operand up to tile multiples — or don't (ragged mode):
    the grid/index maps already cover the padded extent and the kernels
    route boundary garbage to masked/trash positions. WEIGHTS are always
    zero-padded instead (``_pad2d``): ragged garbage weights would poison
    real slots via NaN x one-hot products in assume-finite mode and would
    inflate the per-tile int8 quantization scale in the i8/i8x3 modes."""
    if _RAGGED_INPUTS:
        return x
    return _pad2d(x, rows, cols)


def _fold_factor(m, c, force_full=False):
    """Synthetic-sub-row fold factor: how many sub-rows each real row splits
    into. ONE definition shared by ``_fold_rows`` (the dispatcher's actual
    fold) and ``plan()``'s packed-kernel gate (rpt = tm // f), so the gate's
    slot-cap arithmetic cannot drift from the fold the kernel runs with."""
    if force_full and m > 0 and c > 0:
        return _SUB
    if m >= _SUB or m == 0 or c == 0:
        return 1
    return _SUB // m


def _fold_rows(arrays, weights, m, c, force_full=False):
    """Split each real row into f synthetic sub-rows so the sublane dim is
    filled with real work (no padded-row compute for small M).

    With ``force_full`` every real row is split into ``_SUB`` sub-rows
    regardless of M, so a (_SUB, tc) tile holds elements of exactly ONE real
    row — the layout the per-row factored kernel needs.

    Returns (arrays', weights', m_syn, c_syn, f). Caller merges counts with
    ``counts.reshape(m, f, -1).sum(1)``.
    """
    f = _fold_factor(m, c, force_full)
    if f == 1:
        return arrays, weights, m, c, 1
    c_syn = -(-c // f)
    pad = f * c_syn - c

    def tr(a):
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        return a.reshape(m * f, c_syn)

    arrays = [tr(a) for a in arrays]
    if weights is not None:
        weights = tr(weights)
    return arrays, weights, m * f, c_syn, f


def _cum_col(e, out_rows):
    """Full transformed-edge column (ne_pad→out_rows, 1) for cumulative
    compare rows, padded with +max."""
    e = jnp.asarray(e)
    ne = e.shape[0]
    col = jnp.pad(e, (0, out_rows - ne), constant_values=_max_fill(e.dtype))
    return col.reshape(out_rows, 1), ne


#: bf16's max normal (≈3.3895e38). Finite f32 weights ABOVE it would round
#: to ±inf in a plain bf16 cast, turning the residual chain into -inf/NaN
#: and poisoning every slot in the tile. Clamping the hi limb keeps it
#: finite; the residual w - hi then has ≤ 16 significant bits exactly as in
#: the in-range case, so the limb decompositions stay exact/accurate.
#: (±inf weights themselves never reach these helpers in faithful mode —
#: they are sanitized to 0 and routed to indicator channels; assume-finite
#: mode documents nonfinite weights as unsupported.)
_BF16_MAX = float(jnp.finfo(jnp.bfloat16).max)


def _bf16_hi(w_row):
    """RN-to-bf16 with overflow clamping (see _BF16_MAX)."""
    return jnp.clip(
        w_row, jnp.float32(-_BF16_MAX), jnp.float32(_BF16_MAX)
    ).astype(jnp.bfloat16)


#: Largest bf16 lo limb that keeps bf16_max + lo finite in f32: with
#: hi = bf16_max (mantissa 16711680·2^104) the residual of f32_max is
#: 65535·2^104, whose bf16 ROUNDING is 65536·2^104 — and
#: bf16_max + 65536·2^104 = 2^128 = inf. 255·2^112 = 65280·2^104 is the
#: largest bf16 value below that cliff; clamping costs ≤ 255·2^104
#: (~1.5e-5 relative at f32_max), inside split's error model, and never
#: binds for weights below bf16_max (their residuals are ≤ 2^118).
_SPLIT_LO_CAP = float(255 * (2 ** 112))


def _split_bf16(w_row):
    """f32 (1, E) → (hi, lo) bf16 rows with hi + lo ≈ w to ~17 mantissa bits
    (products against 0/1 one-hots are exact, so only the representation of
    the weights is approximated)."""
    hi = _bf16_hi(w_row)
    r1 = w_row - hi.astype(jnp.float32)
    lo = jnp.clip(
        r1, jnp.float32(-_SPLIT_LO_CAP), jnp.float32(_SPLIT_LO_CAP)
    ).astype(jnp.bfloat16)
    return hi, lo


def _weighted_dot(oh_lhs_bool, w_row, rhs_w, faithful, wmode):
    """counts = (onehot ⊙ w) ·ᵉ rhs with f32 weights, in the given
    (already-resolved) precision mode.

    Returns ``(counts, flags)`` where ``flags`` is ``None`` unless
    ``faithful``, else the ``(isnan, isposinf, isneginf)`` (1, E) masks of
    the tile's weights (the weights themselves are sanitized to 0 at those
    positions before the matmul). The caller feeds the flags to
    ``_accum_channels_when_bad`` for the conditional indicator matmul.

    In split mode: bf16 matmuls against the hi/lo weight parts stacked along
    the lhs row axis (one MXU dot_general); i8/i8x3: 2/3 per-tile-scaled
    int8 limb matmuls at the int8 MXU rate; highest: a per-weight-exact
    THREE-limb bf16 split (see the branch comment — 3 sections replace the
    former f32 HIGHEST matmul's ~6 bf16 passes with the same error model).
    """
    dn = (((1,), (1,)), ((), ()))
    nrows = oh_lhs_bool.shape[0]
    n_digits = _int_wmode(wmode)
    per_digit = False
    if n_digits is None:
        nd = _dig_wmode(wmode)
        if nd is not None:
            # per-digit-output mode: same extraction + int8 sections as
            # intN below, but each digit's (rows, slots) int32 dot is
            # returned SEPARATELY (a tuple) instead of shift-combined —
            # the caller accumulates each into its own output ref and the
            # host recombines in 64-bit arithmetic (exact beyond the
            # mod-2**32 contract; one digitize shared across all digits)
            n_digits, per_digit = nd, True
    if n_digits is not None:
        # Exact integer weights (VERDICT r3 #3): in-kernel signed base-256
        # digit decomposition — one int8·int8→int32 MXU dot per digit,
        # shift-combined in int32. Every step is integral: digit extraction
        # is int VPU arithmetic, digits |d| ≤ 128 are exact through the f32
        # staging product (same known-good bool→int8 lowering as the i8
        # modes), and int32 adds wrap mod 2**32 — exactly the int32/uint32
        # output contract (numpy's reference path, core.py:81, loses
        # integer exactness at 2**53 through float64). ``faithful`` is
        # never set for integer weights (no NaN/inf to route).
        lhs_f = (
            None if _INTW_SELECT else oh_lhs_bool.astype(jnp.float32)
        )
        rem = w_row  # (1, E) int32
        counts = None
        digit_counts = []
        for j in range(n_digits):
            # overflow-safe extraction (the naive (rem+128)&255 - 128 wraps
            # at int32 top): digit ≡ rem (mod 256), digit ∈ [-128, 127] —
            # ALWAYS extract, never emit a raw top remainder (for values
            # near int32 max the remainder hits +128, which the f32→int8
            # cast would mangle). The final discarded remainder is worth
            # rem·2**(8·n_digits) — with the host's digit-count choice it
            # is zero, and at the device cap (4) it is a multiple of 2**32,
            # i.e. ≡ 0 in the mod-2**32 output contract either way.
            hi = rem >> 8
            low = rem - (hi << 8)
            adj = (low >= 128).astype(jnp.int32)
            digit = low - adj * 256
            rem = hi + adj
            if _INTW_SELECT:
                # pure-integer staging: select the (1, E) digit row into the
                # one-hot positions and narrow — skips the f32 product (the
                # direct int8 `where` relayout hazard is int8-mask-specific;
                # int32 select lowers fine, +15-50% measured — see the
                # _INTW_SELECT knob comment).
                lhs_k = jnp.where(
                    oh_lhs_bool, digit, jnp.int32(0)
                ).astype(jnp.int8)
            else:
                lhs_k = (lhs_f * digit.astype(jnp.float32)).astype(jnp.int8)
            dk = jax.lax.dot_general(
                lhs_k, rhs_w, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            if per_digit:
                digit_counts.append(dk)
                continue
            if j:
                dk = dk * jnp.int32(1 << (8 * j))
            counts = dk if counts is None else counts + dk
        if per_digit:
            return tuple(digit_counts), None
        return counts, None
    if not faithful:
        wf = w_row
        flags = None
    else:
        isnan = w_row != w_row
        ispos = w_row == jnp.float32(jnp.inf)
        isneg = w_row == jnp.float32(-jnp.inf)
        wf = jnp.where(isnan | ispos | isneg, jnp.float32(0), w_row)
        flags = (isnan, ispos, isneg)
    if wmode in ("i8", "i8x3"):
        # per-tile-scaled int8 limbs: w ≈ s·(q1 + q2/128 [+ q3/2^14]),
        # |q1| ≤ 127, |q2|,|q3| ≤ 64; every limb matmul runs at the int8
        # MXU rate (2x bf16) with int32 accumulation (exact given integer
        # operands), rescaled in f32. Representation error: s/2^8 (i8,
        # ~3e-5·max|w|) / s/2^15 (i8x3, ~2.4e-7·max|w|).
        n_limbs = 3 if wmode == "i8x3" else 2
        amax = jnp.max(jnp.abs(wf))
        s = jnp.maximum(amax, jnp.float32(1e-30)) * jnp.float32(1.0 / 127.0)
        q = wf * (jnp.float32(1.0) / s)
        # staging per limb: default is the f32 product-then-cast (a direct
        # int8 `where` against the (rows, E) bool mask hits an unsupported
        # Mosaic relayout — (8,128) mask vs (32,128) int8 tiling); the
        # _I8_SELECT build selects the integer-valued limb in int32 and
        # narrows, as the intN modes do (see _INTW_SELECT)
        lhs_f = None if _I8_SELECT else oh_lhs_bool.astype(jnp.float32)
        counts = None
        scale = jnp.float32(1.0)
        rem = q
        for _ in range(n_limbs):
            qk = jnp.floor(rem + jnp.float32(0.5))  # round-half-up
            if _I8_SELECT:
                lhs_k = jnp.where(
                    oh_lhs_bool, qk.astype(jnp.int32), jnp.int32(0)
                ).astype(jnp.int8)
            else:
                lhs_k = (lhs_f * qk).astype(jnp.int8)
            d = jax.lax.dot_general(
                lhs_k, rhs_w, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * scale
            counts = d if counts is None else counts + d
            rem = (rem - qk) * jnp.float32(128.0)
            scale = scale * jnp.float32(1.0 / 128.0)
        counts = counts * s
    elif wmode == "split":
        hi, lo = _split_bf16(wf)
        if _BF16_SELECT:
            # a DIRECT bf16 select hits the int8-style Mosaic relayout wall
            # ((8,128) mask vs (16,128) bf16 tiling — probed, r4): select in
            # f32 (same tiling as the mask) and narrow
            stage = lambda limb: jnp.where(  # noqa: E731
                oh_lhs_bool, limb.astype(jnp.float32), jnp.float32(0)
            ).astype(jnp.bfloat16)
        else:
            lhs_b = oh_lhs_bool.astype(jnp.bfloat16)
            stage = lambda limb: lhs_b * limb  # noqa: E731
        if _SPLIT_TWO_DOTS:
            # two plain dots (no sublane concat copy of the stacked lhs)
            counts = jax.lax.dot_general(
                stage(hi), rhs_w, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                stage(lo), rhs_w, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
        else:
            lhs = jnp.concatenate([stage(hi), stage(lo)], axis=0)
            res = jax.lax.dot_general(
                lhs, rhs_w, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            counts = res[:nrows] + res[nrows:]
    else:
        # 'highest': per-weight-EXACT three-limb bf16 split. An f32
        # mantissa (24 bits) decomposes exactly into three bf16 limbs
        # (8 bits each): hi = RN_bf16(w) leaves a residual with <= 16
        # significant bits (exact in f32), mid absorbs its top 8, and the
        # final residual has <= 7 significant bits so lo represents it
        # exactly. Products against the 0/1 one-hots are exact in bf16 on
        # both sides, so the stacked 3-section bf16 matmul accumulates
        # exactly the same per-element values as a true f32 matmul — at
        # 3 MXU sections instead of the ~6 bf16 passes XLA's f32 HIGHEST
        # lowering pays (the r2 implementation; measured ~5x split's
        # 2-section cost). Only exception: residual limbs below the
        # bf16-subnormal threshold flush on-device — absolute error
        # < 2^-126 per weight, far below the cross-tile accumulation
        # noise the Kahan channel already absorbs.
        rhs = (
            rhs_w
            if rhs_w.dtype == jnp.bfloat16
            else rhs_w.astype(jnp.bfloat16)
        )
        hi = _bf16_hi(wf)  # overflow-clamped: keeps huge-but-finite
        # weights' residuals exact instead of -inf (see _BF16_MAX)
        r1 = wf - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        if _BF16_SELECT:
            # a DIRECT bf16 select hits the int8-style Mosaic relayout wall
            # ((8,128) mask vs (16,128) bf16 tiling — probed, r4): select in
            # f32 (same tiling as the mask) and narrow
            stage = lambda limb: jnp.where(  # noqa: E731
                oh_lhs_bool, limb.astype(jnp.float32), jnp.float32(0)
            ).astype(jnp.bfloat16)
        else:
            lhs_b = oh_lhs_bool.astype(jnp.bfloat16)
            stage = lambda limb: lhs_b * limb  # noqa: E731
        lhs = jnp.concatenate([stage(hi), stage(mid), stage(lo)], axis=0)
        res = jax.lax.dot_general(
            lhs, rhs, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        # mid + lo first: their sum is exactly the hi-residual (error-free
        # by construction), so hi + (mid + lo) cannot overflow for finite
        # per-slot sums — (hi + mid) + lo hits 2^128 = inf at w ≈ f32_max
        # (hi clamps to bf16_max and mid rounds UP past the gap)
        counts = res[:nrows] + (res[nrows : 2 * nrows] + res[2 * nrows :])
    return counts, flags


def _accum_channels_when_bad(ch_refs, oh_lhs_bool, flags, rhs_bf16):
    """Accumulate the three nonfinite-indicator channel matmuls into their
    output refs ONLY when this tile actually contains a nonfinite weight
    (data-dependent ``pl.when``): clean data pays one cheap any-reduce per
    tile instead of a 3-section MXU matmul. Poisoned tiles pay the full
    stacked matmul once."""
    isnan, ispos, isneg = flags
    bad = isnan | ispos | isneg

    @pl.when(jnp.any(bad))
    def _():
        nrows = oh_lhs_bool.shape[0]
        lhs_b = oh_lhs_bool.astype(jnp.bfloat16)
        lhs = jnp.concatenate(
            [lhs_b * f.astype(jnp.bfloat16) for f in flags], axis=0
        )
        rhs = (
            rhs_bf16
            if rhs_bf16.dtype == jnp.bfloat16
            else rhs_bf16.astype(jnp.bfloat16)
        )
        res = jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for k, r in enumerate(ch_refs):
            r[...] += res[k * nrows : (k + 1) * nrows].astype(r.dtype)


_faithful_mode = _nonfinite.faithful_mode


def _n_weight_channels(faithful):
    """How many extra per-slot channel outputs the weighted kernels emit."""
    return 3 if faithful else 0


def _weight_lhs_bytes(faithful, wmode):
    """Live lhs bytes per (row, element) across the weighted matmul
    sections for VMEM tile sizing: split two bf16 sections (4 B), i8/i8x3
    one f32 staging product + 2/3 int8 limbs (6/7 B), highest three bf16
    sections (6 B), intN one f32 staging product + N int8 digit sections;
    + bf16 channel sections (counted conservatively — they only
    materialize on poisoned tiles)."""
    n_digits = _int_wmode(wmode) or _dig_wmode(wmode)
    if n_digits is not None:
        base = 4 + n_digits
    else:
        base = {"i8": 6, "i8x3": 7, "highest": 6}.get(wmode, 4)
    return base + 2 * _n_weight_channels(faithful)


def _kahan(wmode):
    """Compensated cross-tile accumulation for weighted counts. On by
    default in 'highest' precision mode (whose per-tile matmul sums are
    exact f32, leaving cross-tile accumulation as the only error source —
    Kahan reduces it from O(n_tiles) ulp to O(1) ulp, i.e. near-f64
    totals); split mode is representation-limited (~17-bit weights) so the
    compensation would be noise."""
    return wmode == "highest"


def _kahan_add(o_ref, c_ref, v):
    """o += v with Kahan compensation held in c (c is the running error to
    subtract; wrappers return o - c merged)."""
    y = v - c_ref[...]
    t = o_ref[...] + y
    c_ref[...] = (t - o_ref[...]) - y
    o_ref[...] = t


def _accum_weighted(o_refs, counts, kahan):
    """Accumulate the weighted finite part; returns the channel refs that
    follow the counts (+compensation) outputs. A TUPLE of counts (the
    per-digit-output digN modes) accumulates each digit into its own
    output ref."""
    if isinstance(counts, tuple):
        for j, cj in enumerate(counts):
            o_refs[j][...] += cj
        return o_refs[len(counts):]
    if kahan:
        _kahan_add(o_refs[0], o_refs[1], counts)
        return o_refs[2:]
    o_refs[0][...] += counts
    return o_refs[1:]


def _add_counts(x, y):
    """x + y for _weighted_dot results: arrays, or per-digit tuples
    (joint2's E-axis sub-chunk accumulation)."""
    if isinstance(x, tuple):
        return tuple(a + b for a, b in zip(x, y))
    return x + y


def _weighted_extra_outputs(faithful, wmode):
    """Extra output operands beyond counts: optional Kahan compensation
    block + faithful channels; the per-digit-output "digN" modes carry one
    extra int32 per-slot output per digit beyond the first (never Kahan or
    faithful — their weights are integral)."""
    nd = _dig_wmode(wmode)
    if nd is not None:
        return nd - 1
    return (1 if _kahan(wmode) else 0) + _n_weight_channels(faithful)


def _extra_out_dtype(wmode):
    """dtype of the extra per-slot outputs: the digN modes' extras are
    int32 digit sums; Kahan/faithful channels are f32."""
    return jnp.int32 if _dig_wmode(wmode) is not None else jnp.float32


def _pick_tc_bytes(bytes_per_elem, fixed_bytes, c_syn, tm=_SUB):
    """Column tile from an honest per-tile VMEM estimate (the crude
    rows·f32 formula over-shrinks weighted tiles ~4x — the stacked lhs is
    bf16 and only one operand side grows with the section count)."""
    tc = _MAX_TC
    while tm * tc * bytes_per_elem + fixed_bytes > _VMEM_BUDGET and tc > _LANE:
        tc //= 2
    while tc > _LANE and tc >= 2 * max(c_syn, 1):
        tc //= 2
    return tc


# FTZ exactness fix: one shared definition with the XLA digitize
# (ops/ftz.py) so kernel and XLA semantics cannot desynchronize.
from .ftz import fix_neg_subnormals as _fix_neg_subnormals


def _widen(x):
    """32-bit container view of a narrow data/edge tile, right after the
    VMEM load. Mosaic cannot lower sub-32-bit tile compares on this
    toolchain (arith.cmpf on packed vector<8x128x2xbf16>: "Target does
    not support this comparison" — probed r5, scripts/r5_narrow_dtype.py),
    so bf16/f16 widen to f32 and i8/i16/u8/u16 to i32 in-register. The
    embeddings are exact, so every comparison against the (same-widened)
    compare-form edges is bit-identical to the narrow-dtype semantics,
    while HBM traffic keeps the narrow width."""
    dt = x.dtype
    if dt in (jnp.bfloat16, jnp.float16):
        return x.astype(jnp.float32)
    if dt in (jnp.int8, jnp.int16, jnp.uint8, jnp.uint16):
        return x.astype(jnp.int32)
    return x


def _digitize_tile(a, edges_ref):
    """Branchless searchsorted-right of a (tm, tc) tile against a VMEM edge
    column (ne_pad, 1) in half-open comparison form (bins.compare_form);
    returns int32 indices in [0, ne]. Small edge sets unroll (Mosaic
    pipelines the compare chain); large ones run a fori_loop over aligned
    dynamic chunks so compile time stays O(1) in the edge count."""
    a = _fix_neg_subnormals(_widen(a))
    ne_pad = edges_ref.shape[0]
    tm, tc = a.shape
    step = min(_DIG_CHUNK, ne_pad)
    if ne_pad <= _DIG_UNROLL_MAX:
        idx = jnp.zeros((tm, tc), jnp.int32)
        for e0 in range(0, ne_pad, step):
            chunk = _widen(edges_ref[e0 : e0 + step, :])  # (step, 1)
            cmp = a[None, :, :] >= chunk[:, :, None]  # (step, tm, tc)
            idx = idx + jnp.sum(cmp.astype(jnp.int32), axis=0)
        return idx

    def body(s, idx):
        # dynamic VMEM ref load (pl.ds start is a multiple of the sublane
        # tile: step is 8-aligned); lax.dynamic_slice on a loaded array is
        # NOT lowerable by Mosaic — the ref-indexed form is
        chunk = _widen(edges_ref[pl.ds(s * step, step), :])
        cmp = a[None, :, :] >= chunk[:, :, None]
        return idx + jnp.sum(cmp.astype(jnp.int32), axis=0)

    return jax.lax.fori_loop(
        0, ne_pad // step, body, jnp.zeros((tm, tc), jnp.int32)
    )


def _digitize_tile_uniform(a, t0, d, t_last, ne):
    """O(1)-in-edge-count digitize for HOST-VERIFIED uniform thresholds
    (bins.uniform_arith_form): arithmetic candidate index + a ±2 window of
    exactly-recomputed thresholds + one scalar compare against the
    (half-open-nudged) last threshold. Bit-identical to the compare-chain
    ``_digitize_tile`` under the host contract:

      - T[k] == f32(k*d + t0) for k < ne-1 with k*d exact in f32 (so the
        recompute is FMA-contraction-independent);
      - ulp(max|T|) <= d/4, so the candidate+threshold rounding error is
        < 1.3 index units and the ±2 window provably brackets the true
        count;
      - integer data only when |T| < 2^23 (the int→f32 cast cannot cross
        a threshold).

    Replaces O(n_edges) VPU compares with ~25 ops/element — the many-edge
    regimes (4k-32k edges) gain 10-100x (measured r3).
    """
    x = _fix_neg_subnormals(a.astype(jnp.float32))
    nu = ne - 1  # uniform thresholds; T[ne-1] handled separately
    t0f = jnp.float32(t0)
    df = jnp.float32(d)
    inv = jnp.float32(1.0 / d)
    # clamp in the FLOAT domain before the int cast: f32->s32 conversion of
    # values beyond int32 range (|x - t0| >= 2^31 * d, or +-inf) is
    # backend-defined (saturate vs wrap); the clamp makes the candidate
    # well-defined everywhere for one extra VPU op (NaN still propagates —
    # the final x == x select discards it)
    y = jnp.clip((x - t0f) * inv, jnp.float32(0.0), jnp.float32(nu))
    kc = jnp.floor(y).astype(jnp.int32)
    if nu >= 5:
        # clamp the candidate so the ±2 window is always in-bounds: the
        # out-of-range cases are decided entirely by the window compares
        # (below range → all False; above → all True), so the per-j bounds
        # guards disappear (2 int ops x 5 steps saved per element)
        kc = jnp.clip(kc, 2, nu - 3)
        idx = kc - 2  # thresholds below the window: all <= x
        for j in range(5):
            kj = kc - 2 + j
            tj = t0f + kj.astype(jnp.float32) * df
            idx = idx + (x >= tj).astype(jnp.int32)
    else:
        kc = jnp.clip(kc, 0, nu - 1)
        idx = jnp.clip(kc - 2, 0, nu)
        for j in range(5):
            kj = kc - 2 + j
            tj = t0f + kj.astype(jnp.float32) * df
            cnt = (x >= tj) & (kj >= 0) & (kj < nu)
            idx = idx + cnt.astype(jnp.int32)
    idx = idx + (x >= jnp.float32(t_last)).astype(jnp.int32)
    # NaN: every compare is False but the candidate arithmetic is garbage —
    # force the compare-chain's NaN result (0 → routed to the trash slot)
    return jnp.where(x == x, idx, 0)


def _digitize_tile_uniform_ds(a, t0, t0l, inv, D, b1, b2, bl1, bl2,
                              t_last, exc, ne):
    """O(1)-in-edge-count digitize for GENERIC uniform float32 threshold
    grids (bins.uniform_ds_form — e.g. np.linspace(-4, 4, 91)-scale grids
    whose spacing is not exactly representable, which the exact-form kernel
    above rejects). Same candidate + clamped ±2 window structure, but each
    window threshold is recomputed in double-single arithmetic:

      k = khi + klo (12/12 bit split) makes khi*b1, khi*b2, klo*b1, klo*b2
      all EXACT f32 products (b1/b2 are the host's 12-bit split of the
      f32 spacing; bl1/bl2 the same split of its f64 residual — EVERY
      product in the model is exact, so XLA-CPU FMA contraction cannot
      change a bit; a barrier-protected rounding product is not an
      option, XLA strips bitcast round-trips); t0 is itself a hi+lo pair
      carrying the ORIGINAL f64 first edge (the thresholds' own f32
      rounding would inject ~1-ulp slope error — the model must anchor to
      the f64 edges); an exact TwoSum against t0 absorbs cancellation at
      the grid's zero crossing, with t0l folded into the tail. Accuracy
      before the final rounding is ~2^-45 relative. compare_form
      thresholds are the ROUNDUP of the f64 edge, so the decision is
      ``[x >= F0] - [x == F0 and rho > 0]`` where rho is the Fast2Sum
      residual of the final rounding (effective threshold nextup(F0) when
      the true edge lies above the reconstruction) — no nextafter needed
      in-kernel. The host certified the effective threshold equals the
      true one at EVERY k except the static exception list ``exc``
      ((T_k, F0_k, strict_k) triples), corrected per entry with
      ``[x >= T_k] - model_k(x)`` — a global fixup: in-window occurrences
      cancel the model term exactly, and certified bracketing makes
      out-of-window model compares equal their assumed constants.

    ~150 VPU ops/element vs 2/edge for the compare chain — a 10-100x win
    beyond ~256 edges. Bit-exactness is certified by construction: the
    host emulated THIS op sequence (bins._ds_window_model/_ds_candidate)
    against every threshold, with FTZ-flush and candidate-slack guards.
    """
    x = _fix_neg_subnormals(a.astype(jnp.float32))
    nu = ne - 1
    t0f = jnp.float32(t0)
    t0lf = jnp.float32(t0l)
    invf = jnp.float32(inv)
    b1f = jnp.float32(b1)
    b2f = jnp.float32(b2)
    bl1f = jnp.float32(bl1)
    bl2f = jnp.float32(bl2)
    # the t0l correction the candidate needs on far-offset grids
    # (|t0| >> span) is applied as an INTEGER subtraction: in float, XLA
    # constant-folds (x - t0) - t0l to x - fl(t0 + t0l) == x - t0 and the
    # correction vanishes (bins._ds_candidate mirrors this op sequence)
    y = jnp.clip(
        (x - t0f) * invf, jnp.float32(0.0),
        jnp.float32(float(_bins._DS_CAND_CLIP))
    )
    kc = jnp.clip(
        jnp.floor(y).astype(jnp.int32) - jnp.int32(D), 2, nu - 3
    )
    idx = kc - 2  # thresholds below the window: all <= x (certified)
    for j in range(5):
        kj = kc - 2 + j
        khi = (kj & jnp.int32(~0xFFF)).astype(jnp.float32)
        klo = (kj & jnp.int32(0xFFF)).astype(jnp.float32)
        p1 = khi * b1f  # ALL products exact -> FMA-stable by construction
        c1 = khi * b2f
        c2 = klo * b1f
        p3 = klo * b2f
        q1 = khi * bl1f
        q2 = khi * bl2f
        q3 = klo * bl1f
        q4 = klo * bl2f
        # error-free Fast2Sum chain over the exact products (ordering
        # certified host-side; bins._ds_window_model mirrors every op)
        s1 = p1 + c2
        r1 = c2 - (s1 - p1)
        s2 = s1 + c1
        r2 = c1 - (s2 - s1)
        s3 = s2 + p3
        r3 = p3 - (s3 - s2)
        s4 = s3 + t0f  # TwoSum(s3, t0h): branch-free, no ordering needed
        bb = s4 - s3
        r4 = (s3 - (s4 - bb)) + (t0f - bb)
        tail = ((((((((r1 + r2) + r3) + r4) + q1) + q2) + q3) + q4)
                + t0lf)
        f0 = s4 + tail
        rho = tail - (f0 - s4)  # Fast2Sum residual: sign directs rounding
        cnt = (x >= f0) & ~((x == f0) & (rho > jnp.float32(0.0)))
        idx = idx + cnt.astype(jnp.int32)
    for t_true, f_model, strict_m in exc:
        fm = jnp.float32(f_model)
        mc = x >= fm
        if strict_m:
            mc = mc & ~(x == fm)
        idx = idx + (
            (x >= jnp.float32(t_true)).astype(jnp.int32)
            - mc.astype(jnp.int32)
        )
    idx = idx + (x >= jnp.float32(t_last)).astype(jnp.int32)
    return jnp.where(x == x, idx, 0)


def _digitize_uniform(a, form, ne):
    """Dispatch a uniform-spacing certificate (bins.uniform_form) to its
    kernel: 3-tuple ``(t0, d, t_last)`` -> exact arithmetic digitize;
    ``("ds", ...)`` -> double-single digitize for generic grids."""
    if isinstance(form[0], str):
        return _digitize_tile_uniform_ds(a, *form[1:], ne=ne)
    return _digitize_tile_uniform(a, *form, ne=ne)


# ---------------------------------------------------------------------------
# membership-row builder (shared by one_input / joint2 kernel bodies)
# ---------------------------------------------------------------------------


def _bin_rows(a_row, lo_col, hi_col):
    """(nb_pad, E) boolean matrix whose row k is the bin-k membership of the
    E elements in ``a_row`` (1, E): [lo_k, hi_k) over *half-open comparison
    edges* (bins.edges_for_compare — the closed last bin of reference
    core.py:163-174 is already folded into hi's open upper bound)."""
    return (a_row >= lo_col) & (a_row < hi_col)  # (nb_pad, E)


# ---------------------------------------------------------------------------
# one_input: single input, bin-membership rows + row matmul
# ---------------------------------------------------------------------------


def _one_input_kernel(
    a_ref, w_ref, lo_ref, hi_ref, *o_refs,
    nb, f, m_true, c_syn, c_real, weighted, reduce_all, faithful,
    wmode="split", ones_lhs=False,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tm, tc = a_ref.shape
    e_elems = tm * tc

    a_row = _fix_neg_subnormals(_widen(a_ref[...]).reshape(1, e_elems))

    # All index vectors are built directly in (1, E) layout — reshaping a
    # broadcasted iota is an unsupported Mosaic shape cast (replicated lane
    # layout), while data reshapes are fine. tc is a power of two, so the
    # flat→(row, col) split is shifts/masks.
    e_ids = jax.lax.broadcasted_iota(jnp.int32, (1, e_elems), 1)
    local_row = e_ids // tc
    local_col = e_ids - local_row * tc
    # An element is real iff its row is real, it lies inside the synthetic
    # row width, and its position within its *real* row is < c_real.
    # Synthetic sub-row s of a real row holds columns s%f * c_syn + col
    # (f is a power of two; fold padding sits at the tail of each row's last
    # sub-row).
    sub = (i * tm + local_row) % f if f > 1 else 0
    cols = j * tc + local_col
    in_bounds = (
        (i * tm + local_row < m_true)
        & (cols < c_syn)
        & (sub * c_syn + cols < c_real)
    )

    if ones_lhs:
        # reduce-all float fast path: mask out-of-bounds elements in the
        # DATA (NaN fails every >= compare — same "contributes nowhere"
        # routing as real NaNs) so the row-selection one-hot R collapses to
        # a constant ones lhs: no per-tile R build, no R cast. Every output
        # row then holds the full tile count; the wrapper reads row 0.
        a_row = jnp.where(
            in_bounds, a_row, jnp.asarray(jnp.nan, a_row.dtype)
        )
        A = (a_row >= _widen(lo_ref[...])).astype(jnp.bfloat16)
        counts = jax.lax.dot_general(
            jnp.ones((tm, e_elems), jnp.bfloat16), A,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when((i == 0) & (j == 0))
        def _init0():
            for r in o_refs:
                r[...] = jnp.zeros_like(r)

        o_refs[0][...] += counts.astype(o_refs[0].dtype)
        return

    m_col = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    R_bool = (m_col == local_row) & in_bounds
    flags = rhs_bf = None
    if weighted:
        # bin-membership rows: direct per-bin sums, no cumulative-difference
        # cancellation for float weights
        rhs_bf = _bin_rows(
            a_row, _widen(lo_ref[...]), _widen(hi_ref[...])
        ).astype(_weight_rhs_dtype(wmode))
        counts, flags = _weighted_dot(
            R_bool, w_ref[...].reshape(1, e_elems), rhs_bf, faithful, wmode
        )
    else:
        # cumulative compare rows: 1 compare per edge (vs 3 ops per bin);
        # per-bin counts are exact integer differences, taken by the
        # wrapper. one_input is ALWAYS VPU-bound (its MXU term is just 8
        # rows x bins), so bf16 one-hots stay faster than int8 here — the
        # int8 cast costs more VPU and the doubled MXU rate buys nothing
        # (measured r2: 25.2 vs 23.7 GB/s at 64 bins). Exact: per-tile f32
        # partials ≤ E < 2^24.
        A = (a_row >= _widen(lo_ref[...])).astype(jnp.bfloat16)
        counts = jax.lax.dot_general(
            R_bool.astype(jnp.bfloat16), A,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tm, rows_pad) cumulative counts

    if reduce_all:
        # single output block accumulated over the whole grid; the tm
        # sublane partials are merged by the wrapper
        @pl.when((i == 0) & (j == 0))
        def _init():
            for r in o_refs:
                r[...] = jnp.zeros_like(r)
    else:
        @pl.when(j == 0)
        def _init():
            for r in o_refs:
                r[...] = jnp.zeros_like(r)

    if weighted:
        ch_refs = _accum_weighted(o_refs, counts, _kahan(wmode))
        if flags is not None:
            _accum_channels_when_bad(ch_refs, R_bool, flags, rhs_bf)
    else:
        o_refs[0][...] += counts.astype(o_refs[0].dtype)


def _run_one_input(a2d, w2d, edges, nbins, reduce_all, wmode="split"):
    # (m, c) is the canonical layout, or (reduce_all) an arbitrary
    # minor-dim-preserving 2-D view of the element set. Small-m inputs are
    # folded into synthetic sub-rows either way — one reshape copy beats the
    # 8x row-padding copy a (1, C) pallas operand would need.
    m, c = a2d.shape
    faithful = _faithful_mode(w2d)
    (a_list, w2d, m_syn, c_syn, f) = _fold_rows([a2d], w2d, m, c)
    a2d = a_list[0]
    weighted_mode = w2d is not None
    if weighted_mode:
        lo, hi, nb, rows_pad = _lo_hi_cols(edges)
    else:
        nb = int(jnp.asarray(edges).shape[0]) - 1
        rows_pad = _round_up(nb + 1, _SUB)
        lo, _ = _cum_col(edges, rows_pad)
        hi = lo  # unused in cumulative mode

    tm = _SUB
    # A keeps only sublane-rounded rows (the VPU compare/cast cost scales
    # with A's row count; Mosaic masks the non-lane-aligned output tiles
    # internally — probed on-chip). Budget: weighted mode uses honest byte
    # accounting — data f32 + A as bool+bf16 + stacked bf16 lhs + temps.
    nb_out = rows_pad
    if weighted_mode:
        n_x = _weighted_extra_outputs(faithful, wmode)
        bpe = 20 + 3 * nb_out + _weight_lhs_bytes(faithful, wmode) * tm
        fixed = (1 + n_x) * tm * nb_out * 4
        tc = _pick_tc_bytes(bpe, fixed, c_syn, tm)
    else:
        bpe_oh = 2 if _INT8_ONEHOT else 4  # int8 one-hots: ~2 B live/entry
        tc = _MAX_TC
        while tm * tc * nb_out * bpe_oh > _VMEM_BUDGET and tc > _LANE:
            tc //= 2
        while tc > _LANE and tc >= 2 * max(c_syn, 1):
            tc //= 2  # don't pad columns beyond the (folded) row width
    m_pad = _round_up(max(m_syn, 1), tm)
    c_pad = _round_up(max(c_syn, 1), tc)
    a2d = _pad_operand(a2d, m_pad - m_syn, c_pad - c_syn)
    weighted = weighted_mode
    if weighted:
        w2d = _pad2d(_stage_weights(w2d, wmode), m_pad - m_syn, c_pad - c_syn)
    else:
        w2d = jnp.zeros((tm, tc), jnp.float32)  # unused placeholder block

    out_dtype = jnp.int32 if not weighted else _weighted_out_dtype(wmode)

    grid = (m_pad // tm, c_pad // tc)
    fixed = lambda i, j: (0, 0)
    out_rows = tm if reduce_all else m_pad
    n_outs = 1 + (
        _weighted_extra_outputs(faithful, wmode) if weighted else 0
    )
    out_spec = pl.BlockSpec(
        (tm, nb_out),
        fixed if reduce_all else (lambda i, j: (i, 0)),
        memory_space=pltpu.VMEM,
    )
    # ones-lhs fast path (reduce-all, unweighted, float data): masking the
    # data with NaN replaces the per-tile row-selection one-hot build
    ones_lhs = (
        reduce_all
        and not weighted_mode
        and jnp.issubdtype(a2d.dtype, jnp.floating)
        and _os.environ.get("XHIST_ONEINPUT_ONES", "0") == "1"
    )
    results = pl.pallas_call(
        partial(
            _one_input_kernel,
            nb=nb, f=f, m_true=m_syn, c_syn=c_syn, c_real=c,
            weighted=weighted, reduce_all=reduce_all, faithful=faithful,
            wmode=wmode, ones_lhs=ones_lhs,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tm, tc),
                (lambda i, j: (i, j)) if weighted else fixed,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((nb_out, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_out, 1), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * n_outs,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, nb_out), out_dtype)
        ] + [
            jax.ShapeDtypeStruct((out_rows, nb_out), _extra_out_dtype(wmode))
        ] * (n_outs - 1),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(a2d, w2d, lo, hi)

    def merge(x):
        # merge sublane partials / synthetic sub-rows
        if reduce_all:
            if ones_lhs:
                return x[0:1]  # every row holds the full count
            return x.sum(axis=0, keepdims=True)
        x = x[:m_syn]
        if f > 1:
            x = x.reshape(m, f, nb_out).sum(axis=1)
        return x

    m_out = 1 if reduce_all else m
    if weighted_mode and _dig_wmode(wmode) is not None:
        # per-digit outputs: (n_digits, m_out, nb + trash)
        parts = jnp.stack([merge(r)[:, :nb] for r in results])
        trash = jnp.zeros((parts.shape[0], m_out, 1), parts.dtype)
        return jnp.concatenate([parts, trash], axis=2)
    if weighted_mode:
        counts = merge(results[0])[:, :nb]
        k = 1 if _kahan(wmode) else 0
        if k:
            counts = counts - merge(results[1])[:, :nb]
        channels = tuple(
            merge(r)[:, :nb] for r in results[1 + k :]
        ) or None
        counts = _resolve_nonfinite(counts, channels)
    else:
        # cumulative → per-bin: exact integer differences of edge counts
        full = merge(results[0])
        counts = full[:, :nb] - full[:, 1 : nb + 1]
    # trailing trash column for caller-contract compatibility
    trash = jnp.zeros((m_out, 1), counts.dtype)
    return jnp.concatenate([counts, trash], axis=1)


# ---------------------------------------------------------------------------
# joint2: two inputs, full reduction, factored one-hot matmul
# ---------------------------------------------------------------------------


def _joint2_kernel(
    a_ref, b_ref, w_ref,
    alo_ref, ahi_ref, blo_ref, bhi_ref, *o_refs,
    nba, nbb, m_true, f, c_syn, c_real, weighted, faithful,
    wmode="split",
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tm, tc = a_ref.shape
    e_elems = tm * tc

    a_row = _fix_neg_subnormals(_widen(a_ref[...]).reshape(1, e_elems))
    b_row = _fix_neg_subnormals(_widen(b_ref[...]).reshape(1, e_elems))

    # The operands keep their natural (rows, cols) layout (pallas inputs are
    # materialized buffers — a host-side flatten would be a full HBM copy);
    # masks are built directly in (1, E) layout (iota reshapes are
    # unsupported Mosaic shape casts). tc is a power of two. Fold-mask
    # semantics are as in _one_input_kernel.
    e_ids = jax.lax.broadcasted_iota(jnp.int32, (1, e_elems), 1)
    local_row = e_ids // tc
    local_col = e_ids - local_row * tc
    sub = (i * tm + local_row) % f if f > 1 else 0
    cols = j * tc + local_col
    ok_row = (
        (i * tm + local_row < m_true)
        & (cols < c_syn)
        & (sub * c_syn + cols < c_real)
    )

    # For float data, fold the bounds mask into the DATA once (NaN fails
    # every compare — identical routing to real NaNs) instead of ANDing the
    # (1, E) mask into every row of the (nba, E) one-hot: saves ~nba VPU
    # ops/element. Int data keeps the row-wise AND (no NaN available).
    nan_mask = jnp.issubdtype(a_ref.dtype, jnp.floating) and (
        _os.environ.get("XHIST_JOINT2_NANMASK", "1") == "1"
    )
    if nan_mask:
        a_row = jnp.where(ok_row, a_row, jnp.asarray(jnp.nan, a_row.dtype))

    flag_chunks = []
    if weighted:
        # E-axis sub-chunking measured SLOWER here (3.22 vs 3.33 GB/s on
        # the weighted T-S config, XHIST_WEIGHTED_ESPLIT to re-probe): the
        # bf16 2-section matmul leaves less VPU slack to hide, and
        # sub-chunks below 1024 lanes don't lower at all (Mosaic
        # vector.broadcast vpad relayout). Default stays unsplit.
        k = int(_os.environ.get("XHIST_WEIGHTED_ESPLIT", "1"))
        k = min(k, max(1, e_elems // 1024))
        if e_elems % k:
            k = 1
        step = e_elems // k
        w_row = w_ref[...].reshape(1, e_elems)
        counts = None
        for s in range(k):
            sl = slice(s * step, (s + 1) * step)
            A_s = _bin_rows(
                a_row[:, sl], _widen(alo_ref[...]), _widen(ahi_ref[...])
            )
            if not nan_mask:
                A_s = A_s & ok_row[:, sl]
            B_s = _bin_rows(
                b_row[:, sl], _widen(blo_ref[...]), _widen(bhi_ref[...])
            ).astype(_weight_rhs_dtype(wmode))
            c_s, flags_s = _weighted_dot(
                A_s, w_row[:, sl], B_s, faithful, wmode
            )
            counts = c_s if counts is None else _add_counts(counts, c_s)
            if flags_s is not None:
                flag_chunks.append((A_s, flags_s, B_s))
    else:
        # cumulative compare rows (1 op per edge); the joint per-bin counts
        # are the exact 2-D inclusion-exclusion differences, taken by the
        # wrapper: c[i,j] = cum[i,j] - cum[i+1,j] - cum[i,j+1] + cum[i+1,j+1]
        oh_dt, acc_dt = _onehot_dtypes()
        # same >= 1024-lane sub-chunk floor as the weighted branch (smaller
        # chunks hit the unlowerable Mosaic vector.broadcast vpad relayout)
        k = min(_JOINT2_ESPLIT, max(1, e_elems // 1024))
        if k > 1 and e_elems % k == 0:
            # E-axis sub-chunks: chunk s+1's one-hot build (VPU) is
            # independent of chunk s's dot (MXU) — gives Mosaic a chance to
            # pipeline the two units
            step = e_elems // k
            counts = None
            for s in range(k):
                sl = slice(s * step, (s + 1) * step)
                As = a_row[:, sl] >= _widen(alo_ref[...])
                if not nan_mask:
                    As = As & ok_row[:, sl]
                As = As.astype(oh_dt)
                Bs = (b_row[:, sl] >= _widen(blo_ref[...])).astype(oh_dt)
                d = jax.lax.dot_general(
                    As, Bs, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dt,
                )
                counts = d if counts is None else counts + d
        else:
            A = a_row >= _widen(alo_ref[...])
            if not nan_mask:
                A = A & ok_row
            A = A.astype(oh_dt)
            B = (b_row >= _widen(blo_ref[...])).astype(oh_dt)
            counts = jax.lax.dot_general(
                A, B, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc_dt,
            )  # (nba_pad, nbb_pad)

    @pl.when((i == 0) & (j == 0))
    def _init():
        for r in o_refs:
            r[...] = jnp.zeros_like(r)

    if weighted:
        ch_refs = _accum_weighted(o_refs, counts, _kahan(wmode))
        for A_s, flags_s, B_s in flag_chunks:
            _accum_channels_when_bad(ch_refs, A_s, flags_s, B_s)
    else:
        o_refs[0][...] += counts.astype(o_refs[0].dtype)


def _run_joint2(a2d, b2d, w2d, edges_a, edges_b, nbins, wmode="split"):
    # full-reduction joint histogram over an arbitrary 2-D element set —
    # operands keep their natural shape, only tail padding (no-op when the
    # shape is tile-aligned); small-m inputs fold into synthetic sub-rows
    m, c = a2d.shape
    faithful = _faithful_mode(w2d)
    arrays, w2d, m_syn, c_syn, f = _fold_rows([a2d, b2d], w2d, m, c)
    a2d, b2d = arrays
    weighted_mode = w2d is not None
    if weighted_mode:
        alo, ahi, nba, nba_pad = _lo_hi_cols(edges_a)
        blo, bhi, nbb, nbb_pad = _lo_hi_cols(edges_b)
    else:
        nba = int(jnp.asarray(edges_a).shape[0]) - 1
        nbb = int(jnp.asarray(edges_b).shape[0]) - 1
        nba_pad = _round_up(nba + 1, _SUB)
        nbb_pad = _round_up(nbb + 1, _SUB)
        alo, _ = _cum_col(edges_a, nba_pad)
        blo, _ = _cum_col(edges_b, nbb_pad)
        ahi, bhi = alo, blo  # unused in cumulative mode

    tm = _SUB
    # keep A+B+temps under the VMEM budget, accounting for lane padding
    # (weighted mode: honest bytes — A carries the stacked bf16 sections)
    nba_out = _round_up(nba_pad, _SUB)
    nbb_out = nbb_pad  # sublane-rounded only; Mosaic masks non-128 lanes
    if weighted_mode:
        n_x = _weighted_extra_outputs(faithful, wmode)
        bpe = (
            28 + (1 + _weight_lhs_bytes(faithful, wmode)) * nba_out
            + 3 * nbb_out
        )
        fixed = (1 + n_x) * nba_out * nbb_out * 4
        tc = _pick_tc_bytes(bpe, fixed, c_syn, tm)
    else:
        # int8 one-hots store 1 B/entry (bool compare + int8 cast ≈ 2 B
        # live) vs 4 B for f32-era temps — bigger tiles per VMEM budget
        bpe_oh = 2 if _INT8_ONEHOT else 4
        tc = _MAX_TC
        while (
            tm * tc * (nba_out + nbb_out) * bpe_oh > _VMEM_BUDGET
            and tc > _LANE
        ):
            tc //= 2
        while tc > _LANE and tc >= 2 * max(c_syn, 1):
            tc //= 2  # don't pad columns beyond the (folded) row width
    m_pad = _round_up(max(m_syn, 1), tm)
    c_pad = _round_up(max(c_syn, 1), tc)

    def padded(x):
        return _pad_operand(x, m_pad - m_syn, c_pad - c_syn)

    a2d = padded(a2d)
    b2d = padded(b2d)
    weighted = w2d is not None
    if weighted:
        w = _pad2d(_stage_weights(w2d, wmode), m_pad - m_syn, c_pad - c_syn)
    else:
        w = jnp.zeros((tm, tc), jnp.float32)

    out_dtype = jnp.int32 if not weighted else _weighted_out_dtype(wmode)
    # nba_out == nba_pad and nbb_out == nbb_pad (both already sublane-
    # rounded; output tiles need no lane rounding — Mosaic masks them)

    grid = (m_pad // tm, c_pad // tc)
    fixed = lambda i, j: (0, 0)
    moving = lambda i, j: (i, j)
    n_outs = 1 + (
        _weighted_extra_outputs(faithful, wmode) if weighted else 0
    )
    out_spec = pl.BlockSpec((nba_out, nbb_out), fixed, memory_space=pltpu.VMEM)
    results = pl.pallas_call(
        partial(
            _joint2_kernel,
            nba=nba, nbb=nbb, m_true=m_syn, f=f, c_syn=c_syn, c_real=c,
            weighted=weighted, faithful=faithful, wmode=wmode,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tc), moving, memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tc), moving, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tm, tc), moving if weighted else fixed,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((nba_out, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((nba_out, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbb_out, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbb_out, 1), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * n_outs,
        out_shape=[
            jax.ShapeDtypeStruct((nba_out, nbb_out), out_dtype)
        ] + [
            jax.ShapeDtypeStruct((nba_out, nbb_out), _extra_out_dtype(wmode))
        ] * (n_outs - 1),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(a2d, b2d, w, alo, ahi, blo, bhi)

    if weighted_mode and _dig_wmode(wmode) is not None:
        # per-digit outputs: (n_digits, 1, nba·nbb + trash)
        parts = jnp.stack(
            [r[:nba, :nbb].reshape(1, nba * nbb) for r in results]
        )
        trash = jnp.zeros((parts.shape[0], 1, 1), parts.dtype)
        return jnp.concatenate([parts, trash], axis=2)
    counts = results[0]
    if weighted_mode:
        base = counts[:nba, :nbb]
        k = 1 if _kahan(wmode) else 0
        if k:
            base = base - results[1][:nba, :nbb]
        channels = tuple(r[:nba, :nbb] for r in results[1 + k :]) or None
        counts = _resolve_nonfinite(base, channels)
    else:
        # 2-D inclusion-exclusion: cumulative joint → per-bin (exact ints)
        cum = counts[: nba + 1, : nbb + 1]
        counts = cum[:-1, :-1] - cum[1:, :-1] - cum[:-1, 1:] + cum[1:, 1:]
    # flatten (nba, nbb) joint counts to the flat-slot contract + trash col
    flat = counts[:nba, :nbb].reshape(1, nba * nbb)
    trash = jnp.zeros((1, 1), flat.dtype)
    return jnp.concatenate([flat, trash], axis=1)



# ---------------------------------------------------------------------------
# factored: any input count, reduce-all or per kept row, grids to ~8M slots
# ---------------------------------------------------------------------------


def _factored_kernel(
    *refs, n_inputs, nbins, f, m_true, c_syn, c_real, n1c, log2_n2, weighted,
    per_row, faithful, wmode="split", rpt=1, bpt=1, uniform=None,
    n_edges=None,
):
    """Digitize → flat joint slot id g → split into integer sub-indices
    (g1, g2) = (g >> log2_n2, g & (n2-1)) → equality one-hots → one matmul
    gives cum-free exact counts over an (n1, n2) factorization of the slot
    space. O(Σ n_edges + n1 + n2) VPU work per element; the O(n1·n2) joint
    work rides the MXU. This is how joint grids beyond the direct kernel's
    slot-chunk budget stay on the fused path (the reference's analog is just
    more dask tasks; SURVEY.md §7 'huge joint grids' hard part).

    ``per_row``: every (_SUB, tc) tile holds elements of exactly one real
    (kept) row — the wrapper force-folds rows — and the output block is that
    row's own (n1, n2) grid, so kept-row (bystander) histograms with big
    joint grids stay fused too (reference rows = core.py:211-229 kept axes).

    The middle grid dim chunks n1 into ``n1c``-row pieces so the VMEM output
    block stays bounded for huge joint grids (the full (n1, n2) grid lives
    in HBM) — the fused-path analog of streaming over the slot space.
    """
    data_refs = refs[:n_inputs]
    pos = n_inputs
    w_ref = None
    if weighted:
        w_ref = refs[pos]
        pos += 1
    edge_refs = refs[pos : pos + n_inputs]
    o_refs = refs[pos + n_inputs :]

    # Grid-dim order differs by mode so that every OUTPUT block is visited
    # in consecutive grid steps (Pallas TPU only preserves an output VMEM
    # block across consecutive visits): per_row's block (i·chunks + n) is
    # consecutive over inner j with grid (i, n, j); reduce-all's block (n)
    # must own the OUTER dim — grid (n, i, j).
    if per_row:
        i = pl.program_id(0)
        n = pl.program_id(1)  # n1 chunk
        j = pl.program_id(2)
    else:
        n = pl.program_id(0)  # n1 chunk
        i = pl.program_id(1)
        j = pl.program_id(2)
    tm, tc = data_refs[0].shape
    e_elems = tm * tc
    n2 = 1 << log2_n2

    if bpt > 1:
        # Packed batching: bpt row-blocks per grid step, each keeping its
        # OWN stacked slot space and its own output rows — the narrow-c
        # packed regime is fixed-grid-step-overhead bound (~5 us/step
        # measured r3), so fewer, fatter steps amortize it. Wrapper
        # guarantees: per_row grid, unweighted, f == 1, n_chunks == 1.
        tm_sub = tm // bpt
        e_sub = tm_sub * tc
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (1, e_sub), 1)
        local_row = e_ids // tc
        local_col = e_ids - local_row * tc
        cols = j * tc + local_col
        oh_dt, acc_dt = _onehot_dtypes()
        r1 = jax.lax.broadcasted_iota(jnp.int32, (n1c, 1), 0)
        r2 = jax.lax.broadcasted_iota(jnp.int32, (n2, 1), 0)
        n_real = math.prod(nbins)

        @pl.when(j == 0)
        def _init_batched():
            for r in o_refs:
                r[...] = jnp.zeros_like(r)

        for b in range(bpt):
            row0 = i * tm + b * tm_sub
            valid = (row0 + local_row < m_true) & (cols < c_real)
            g = None
            for k in range(n_inputs):
                a = _widen(data_refs[k][b * tm_sub : (b + 1) * tm_sub, :])
                if uniform is not None and uniform[k] is not None:
                    idx = _digitize_uniform(a, uniform[k], ne=n_edges[k])
                else:
                    idx = _digitize_tile(a, edge_refs[k])
                t = (idx - 1).reshape(1, e_sub)
                okt = (t >= 0) & (t <= nbins[k] - 1)
                valid = valid & okt
                t = jnp.clip(t, 0, nbins[k] - 1)
                g = t if g is None else g * nbins[k] + t
            g = jnp.where(valid, g, n_real)
            if rpt > 1:
                g = g + local_row * (n_real + 1)  # f == 1: one row/sublane
            A2 = (r2 == (g & (n2 - 1))).astype(oh_dt)
            counts = jax.lax.dot_general(
                (r1 == (g >> log2_n2)).astype(oh_dt), A2,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc_dt,
            )
            o_refs[0][b * n1c : (b + 1) * n1c, :] += counts.astype(
                o_refs[0].dtype
            )
        return

    e_ids = jax.lax.broadcasted_iota(jnp.int32, (1, e_elems), 1)
    local_row = e_ids // tc
    local_col = e_ids - local_row * tc
    sub = (i * tm + local_row) % f if f > 1 else 0
    cols = j * tc + local_col
    in_bounds = (
        (i * tm + local_row < m_true)
        & (cols < c_syn)
        & (sub * c_syn + cols < c_real)
    )

    g = None
    valid = in_bounds
    for k in range(n_inputs):
        a = _widen(data_refs[k][...])
        if uniform is not None and uniform[k] is not None:
            idx = _digitize_uniform(a, uniform[k], ne=n_edges[k])
        else:
            # edge_refs[k]: (ne_pad, 1), +max padded, half-open transform
            idx = _digitize_tile(a, edge_refs[k])
        t = (idx - 1).reshape(1, e_elems)
        ok = (t >= 0) & (t <= nbins[k] - 1)
        valid = valid & ok
        t = jnp.clip(t, 0, nbins[k] - 1)
        g = t if g is None else g * nbins[k] + t
    n_real = math.prod(nbins)
    g = jnp.where(valid, g, n_real)  # trash slot (also covers padding)
    if rpt > 1:
        # packed mode: rpt distinct kept rows share each tile; stack their
        # slot spaces so one factored matmul counts all of them with full
        # tiles (the narrow-reduce-axis regime where per-row tiles would be
        # mostly padding)
        g = g + (local_row // f) * (n_real + 1)

    g1 = g >> log2_n2  # (1, E) integer sub-indices
    g2 = g & (n2 - 1)

    r1 = n * n1c + jax.lax.broadcasted_iota(jnp.int32, (n1c, 1), 0)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (n2, 1), 0)

    flags = None
    if weighted:
        A1 = r1 == g1  # (n1c, E) equality one-hot for this n1 chunk
        A2 = (r2 == g2).astype(_weight_rhs_dtype(wmode))  # (n2, E)
        counts, flags = _weighted_dot(
            A1, w_ref[...].reshape(1, e_elems), A2, faithful, wmode
        )
    else:
        # NOTE: joint2-style E-axis sub-chunking measured SLOWER here
        # (1M slots: 0.48 vs 0.56 GB/s; per-row 150x90: 7.6 vs 8.3) — the
        # digitize already interleaves with the dot, and splitting shrinks
        # the matmuls below good MXU shapes. Keep one dot per tile.
        oh_dt, acc_dt = _onehot_dtypes()
        A2 = (r2 == g2).astype(oh_dt)  # (n2, E)
        counts = jax.lax.dot_general(
            (r1 == g1).astype(oh_dt), A2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dt,
        )  # (n1c, n2)

    @pl.when((j == 0) if per_row else ((i == 0) & (j == 0)))
    def _init():
        for r in o_refs:
            r[...] = jnp.zeros_like(r)

    if weighted:
        ch_refs = _accum_weighted(o_refs, counts, _kahan(wmode))
        if flags is not None:
            _accum_channels_when_bad(ch_refs, A1, flags, A2)
    else:
        o_refs[0][...] += counts.astype(o_refs[0].dtype)


def _packed_tm():
    """Row-tile height of the packed kernel (sublane-tile multiples).

    Measured on v5e (m=16384, c=64, 10.8k slots): tm=8 24.6 ms, tm=32
    34.9 ms, tm=64 34.4 ms — taller tiles grow the stacked slot space S and
    its factorization padding faster than they amortize grid-step overhead,
    so the default stays 8 (negative result; knob kept for re-probing)."""
    return max(_SUB, int(_os.environ.get("XHIST_PACKED_TM", _SUB)) // _SUB * _SUB)


def _pick_factorization(n_slots):
    """Choose the (n1, n2 = 2^k) slot factorization minimizing padded MXU
    work n1·n2 (== out VMEM), tie-broken by n1+n2 (the VPU one-hot cost).

    ``XHIST_MIN_LOG2N2`` lowers the smallest n2 considered (default 7 =
    128 lanes); ``XHIST_FORCE_LOG2N2`` pins it outright (probe knobs —
    sub-128 n2 output blocks lower fine, Mosaic masks the lanes)."""
    force = _os.environ.get("XHIST_FORCE_LOG2N2")
    if force is not None:
        k = int(force)
        return _round_up(-(-n_slots // (1 << k)), _SUB), k
    lo = int(_os.environ.get("XHIST_MIN_LOG2N2", 3))
    best = None
    for log2_n2 in range(lo, max(lo + 1, n_slots.bit_length() + 1)):
        n2 = 1 << log2_n2
        n1 = _round_up(-(-n_slots // n2), _SUB)
        # per-element cost model (ps): MXU n1·n2 int8 MACs at 197 TMAC/s
        # + VPU ~2.5 ops per equality row at ~3.9 Tops/s. The r2 pick
        # (lexicographic min n1·n2) forced n2 >= 128 and over-weighted the
        # MXU for small slot spaces; the scored pick chooses e.g. (16, 16)
        # for 129 slots — measured 40.5 vs 25-ish GB/s at 128 uniform bins
        # (scripts/r3_uniform_oneinput.py; small-n2 out blocks lower fine,
        # Mosaic masks the lanes).
        key = 0.00508 * (n1 * n2) + 0.65 * (n1 + n2)
        if best is None or key < best[0]:
            best = (key, n1, log2_n2)
    return best[1], best[2]


def _run_factored(arrays_2d, edges, weights_2d, nbins, per_row=False,
                  packed=False, wmode="split", uniform=None):
    """``per_row``: one tile per kept row (wide reduce axes). ``packed``:
    several kept rows per tile with their slot spaces stacked into one
    factored space — full tiles for narrow reduce axes (c < 256) where
    per-row tiles would be mostly padding; MXU work is rpt x a single row's
    but amortized over rpt rows of real elements."""
    m, c = arrays_2d[0].shape
    n_inputs = len(arrays_2d)
    faithful = _faithful_mode(weights_2d)
    arrays_2d, weights_2d, m_syn, c_syn, f = _fold_rows(
        list(arrays_2d), weights_2d, m, c, force_full=per_row and not packed
    )
    n_real = math.prod(int(b) for b in nbins)
    n_slots = n_real + 1
    # packed tiles may span several sublane tiles (tm > 8): more rows per
    # grid step amortizes the per-step overhead that dominates narrow-c
    # shapes; MACs/element are tm-independent (S and the real elements per
    # tile both scale with rpt)
    tm = _packed_tm() if packed else _SUB
    rpt = (tm // f) if packed else 1
    per_row = per_row or packed  # packed shares the per-row grid/output form

    n1, log2_n2 = _pick_factorization(rpt * n_slots)
    n2 = 1 << log2_n2

    weighted = weights_2d is not None
    out_dtype = jnp.int32 if not weighted else _weighted_out_dtype(wmode)
    n_outs = 1 + (
        _weighted_extra_outputs(faithful, wmode) if weighted else 0
    )

    # Chunk n1 so the VMEM-resident output block(s) stay bounded — huge
    # joint grids (> ~2M slots) keep the full (n1, n2) grid in HBM and
    # stream n1c-row pieces (inputs are re-read once per chunk; the MXU
    # work, O(slots)/element, dominates at those sizes anyway).
    n1c = n1
    out_budget = int(_os.environ.get("XHIST_OUT_BUDGET", 8 << 20))
    while n_outs * n1c * n2 * 4 > out_budget and n1c > _SUB:
        n1c = _round_up(-(-n1c // 2), _SUB)
    n_chunks = -(-n1 // n1c)
    n1_pad = n_chunks * n1c

    # A1+A2 are ((n1c+n2), E); weighted mode adds the stacked bf16 sections
    if weighted:
        bpe = 32 + 4 * n_inputs
        bpe += (1 + _weight_lhs_bytes(faithful, wmode)) * n1c
        bpe += 3 * n2
        fixed = n_outs * n1c * n2 * 4
        tc = _pick_tc_bytes(bpe, fixed, c_syn, tm)
    else:
        bpe_oh = 2 if _INT8_ONEHOT else 4  # int8 one-hots: ~2 B live/entry
        tc = _MAX_TC
        while tm * tc * (n1c + n2) * bpe_oh > _VMEM_BUDGET and tc > _LANE:
            tc //= 2
        while tc > _LANE and tc >= 2 * max(c_syn, 1):
            tc //= 2

    # Packed batching: bpt row-blocks per grid step, each with its own
    # stacked slot space + output rows. The narrow-c packed regime is
    # fixed-per-grid-step-overhead bound (~5 us/step measured r3, tiny-slot
    # probe) — fewer, fatter steps amortize it; MACs/element unchanged
    # (each sub-block runs its own small dot). Unweighted per_row only
    # (weighted outputs interleave kahan/channel refs), one n-chunk, no
    # row folding.
    bpt = 1
    if packed and not weighted and f == 1 and n_chunks == 1:
        bpt = max(1, int(_os.environ.get("XHIST_PACKED_BATCH", "8")))
        bpt = min(bpt, max(1, -(-m_syn // tm)))  # no all-padding sub-blocks

    tm_io = tm * bpt  # data-tile height per grid step
    m_pad = _round_up(max(m_syn, 1), tm_io)
    c_pad = _round_up(max(c_syn, 1), tc)
    padded = [
        _pad_operand(a, m_pad - m_syn, c_pad - c_syn) for a in arrays_2d
    ]
    if weighted:
        w = _pad2d(_stage_weights(weights_2d, wmode), m_pad - m_syn,
                   c_pad - c_syn)

    edge_ops = _edge_cols_or_dummies(edges, uniform)

    # grid order must keep each output block's visits consecutive (see the
    # kernel docstring): per_row → (i, n, j); reduce-all → (n, i, j)
    if per_row:
        grid = (m_pad // tm_io, n_chunks, c_pad // tc)
        fixed = lambda i, n, j: (0, 0)
        moving = lambda i, n, j: (i, j)
        # one (n1_pad, n2) output group per real row; with force_full
        # folding, row-block i holds exactly real row i's elements
        out_rows_total = (m_pad // tm) * n1_pad
        out_index = lambda i, n, j: (i * n_chunks + n, 0)
    else:
        grid = (n_chunks, m_pad // tm_io, c_pad // tc)
        fixed = lambda n, i, j: (0, 0)
        moving = lambda n, i, j: (i, j)
        out_rows_total = n1_pad
        out_index = lambda n, i, j: (n, 0)

    in_specs = [
        pl.BlockSpec((tm_io, tc), moving, memory_space=pltpu.VMEM)
        for _ in range(n_inputs)
    ]
    operands = list(padded)
    if weighted:
        in_specs.append(
            pl.BlockSpec((tm_io, tc), moving, memory_space=pltpu.VMEM)
        )
        operands.append(w)
    for col in edge_ops:
        in_specs.append(pl.BlockSpec(col.shape, fixed, memory_space=pltpu.VMEM))
        operands.append(col)

    out_spec = pl.BlockSpec(
        (bpt * n1c, n2), out_index, memory_space=pltpu.VMEM
    )

    results = pl.pallas_call(
        partial(
            _factored_kernel,
            n_inputs=n_inputs,
            nbins=tuple(int(b) for b in nbins),
            f=f,
            m_true=m_syn,
            c_syn=c_syn,
            c_real=c,
            n1c=n1c,
            log2_n2=log2_n2,
            weighted=weighted,
            per_row=per_row,
            faithful=faithful,
            wmode=wmode,
            rpt=rpt,
            bpt=bpt,
            uniform=uniform,
            n_edges=tuple(
                int(jnp.asarray(e).shape[0]) for e in edges
            ),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * n_outs,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows_total, n2), out_dtype)
        ] + [
            jax.ShapeDtypeStruct(
                (out_rows_total, n2), _extra_out_dtype(wmode)
            )
        ] * (n_outs - 1),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*operands)

    if packed:
        def post(x):
            x = x.reshape(m_pad // tm, n1_pad * n2)[:, : rpt * n_slots]
            return x.reshape((m_pad // tm) * rpt, n_slots)[:m]
    elif per_row:
        def post(x):
            return x.reshape(m_pad // tm, n1_pad * n2)[:m, :n_slots]
    else:
        def post(x):
            return x.reshape(1, n1_pad * n2)[:, :n_slots]

    if weighted and _dig_wmode(wmode) is not None:
        return jnp.stack([post(r) for r in results])  # (n_digits, m, slots)
    counts = post(results[0])
    if weighted:
        k = 1 if _kahan(wmode) else 0
        if k:
            counts = counts - post(results[1])
        channels = tuple(post(r) for r in results[1 + k :]) or None
        counts = _resolve_nonfinite(counts, channels)
    return counts


# ---------------------------------------------------------------------------
# direct: general flat-slot one-hot kernel (3+ inputs / kept rows + joint)
# ---------------------------------------------------------------------------


def _direct_kernel(
    *refs, n_inputs, nbins, m_true, f, c_syn, c_real, slot_chunk,
    weighted, faithful, wmode="split", uniform=None, n_edges=None,
):
    data_refs = refs[:n_inputs]
    pos = n_inputs
    w_ref = None
    if weighted:
        w_ref = refs[pos]
        pos += 1
    edge_refs = refs[pos : pos + n_inputs]
    o_refs = refs[pos + n_inputs :]

    i = pl.program_id(0)  # row tile
    n = pl.program_id(1)  # slot chunk
    j = pl.program_id(2)  # column tile

    tm, tc = data_refs[0].shape
    e_elems = tm * tc

    # Index/mask vectors are built directly in (1, E) layout — reshaping a
    # broadcasted iota is an unsupported Mosaic shape cast; only data-derived
    # arrays get reshaped. tc is a power of two.
    e_ids = jax.lax.broadcasted_iota(jnp.int32, (1, e_elems), 1)
    local_row = e_ids // tc
    local_col = e_ids - local_row * tc
    sub = (i * tm + local_row) % f if f > 1 else 0
    cols = j * tc + local_col
    in_bounds = (
        (i * tm + local_row < m_true)
        & (cols < c_syn)
        & (sub * c_syn + cols < c_real)
    )

    g = None
    valid = in_bounds
    for k in range(n_inputs):
        a = _widen(data_refs[k][...])
        if uniform is not None and uniform[k] is not None:
            idx = _digitize_uniform(a, uniform[k], ne=n_edges[k])
        else:
            # branchless searchsorted-right over pre-transformed half-open
            # edges (no inclusive-last-bin fixup; bins.compare_form)
            idx = _digitize_tile(a, edge_refs[k])
        t = (idx - 1).reshape(1, e_elems)  # data-derived reshape
        ok = (t >= 0) & (t <= nbins[k] - 1)
        valid = valid & ok
        t = jnp.clip(t, 0, nbins[k] - 1)
        g = t if g is None else g * nbins[k] + t
    n_real = math.prod(nbins)
    g = jnp.where(valid, g, n_real)  # (1, E)

    slot_col = n * slot_chunk + jax.lax.broadcasted_iota(
        jnp.int32, (slot_chunk, 1), 0
    )
    G = (slot_col == g)

    m_col = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    R_bool = m_col == local_row
    flags = None
    if weighted:
        G_bf = G.astype(_weight_rhs_dtype(wmode))
        counts, flags = _weighted_dot(
            R_bool, w_ref[...].reshape(1, e_elems), G_bf, faithful, wmode
        )
    else:
        oh_dt, acc_dt = _onehot_dtypes()
        G_bf = G.astype(oh_dt)
        counts = jax.lax.dot_general(
            R_bool.astype(oh_dt), G_bf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dt,
        )

    @pl.when(j == 0)
    def _init():
        for r in o_refs:
            r[...] = jnp.zeros_like(r)

    if weighted:
        ch_refs = _accum_weighted(o_refs, counts, _kahan(wmode))
        if flags is not None:
            _accum_channels_when_bad(ch_refs, R_bool, flags, G_bf)
    else:
        o_refs[0][...] += counts.astype(o_refs[0].dtype)


def _pick_tiles_direct(n_slots_pad, weighted=False, faithful=False,
                       wmode="split"):
    tm = _SUB
    tc = min(_MAX_TC, 512)
    slot_chunk = min(n_slots_pad, 1024)
    budget_elems = _VMEM_BUDGET // 4
    if weighted:
        budget_elems //= 3 + _weighted_extra_outputs(faithful, wmode)
    while tm * tc * slot_chunk > budget_elems and tc > _LANE:
        tc //= 2
    while tm * tc * slot_chunk > budget_elems and slot_chunk > _LANE:
        slot_chunk //= 2
    return tm, tc, slot_chunk


def _run_direct(arrays_2d, edges, weights_2d, nbins, wmode="split",
                uniform=None):
    n_inputs = len(arrays_2d)
    m, c = arrays_2d[0].shape
    n_real = math.prod(int(b) for b in nbins)
    n_slots = n_real + 1
    n_slots_pad = _round_up(n_slots, _LANE)
    faithful = _faithful_mode(weights_2d)

    arrays_2d, weights_2d, m_syn, c_syn, f = _fold_rows(
        list(arrays_2d), weights_2d, m, c
    )

    tm, tc, slot_chunk = _pick_tiles_direct(
        n_slots_pad, weighted=weights_2d is not None, faithful=faithful,
        wmode=wmode,
    )
    m_pad = _round_up(max(m_syn, 1), tm)
    c_pad = _round_up(max(c_syn, 1), tc)
    n_chunks = -(-n_slots_pad // slot_chunk)
    n_slots_pad = n_chunks * slot_chunk

    weighted = weights_2d is not None
    out_dtype = jnp.int32 if not weighted else _weighted_out_dtype(wmode)

    padded = [
        _pad_operand(a, m_pad - m_syn, c_pad - c_syn) for a in arrays_2d
    ]
    if weighted:
        w = _pad2d(_stage_weights(weights_2d, wmode), m_pad - m_syn,
                   c_pad - c_syn)

    edge_ops = _edge_cols_or_dummies(edges, uniform)

    grid = (m_pad // tm, n_chunks, c_pad // tc)
    in_specs = [
        pl.BlockSpec((tm, tc), lambda i, n, j: (i, j), memory_space=pltpu.VMEM)
        for _ in range(n_inputs)
    ]
    operands = list(padded)
    if weighted:
        in_specs.append(
            pl.BlockSpec((tm, tc), lambda i, n, j: (i, j), memory_space=pltpu.VMEM)
        )
        operands.append(w)
    for col in edge_ops:
        in_specs.append(
            pl.BlockSpec(col.shape, lambda i, n, j: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(col)

    n_outs = 1 + (
        _weighted_extra_outputs(faithful, wmode) if weighted else 0
    )
    out_spec = pl.BlockSpec(
        (tm, slot_chunk), lambda i, n, j: (i, n), memory_space=pltpu.VMEM
    )
    results = pl.pallas_call(
        partial(
            _direct_kernel,
            n_inputs=n_inputs,
            nbins=tuple(int(b) for b in nbins),
            m_true=m_syn,
            f=f,
            c_syn=c_syn,
            c_real=c,
            slot_chunk=slot_chunk,
            weighted=weighted,
            faithful=faithful,
            wmode=wmode,
            uniform=uniform,
            n_edges=tuple(
                int(jnp.asarray(e).shape[0]) for e in edges
            ),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * n_outs,
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, n_slots_pad), out_dtype)
        ] + [
            jax.ShapeDtypeStruct(
                (m_pad, n_slots_pad), _extra_out_dtype(wmode)
            )
        ] * (n_outs - 1),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*operands)

    def post(x):
        x = x[:m_syn]
        if f > 1:
            x = x.reshape(m, f, n_slots_pad).sum(axis=1)
        return x[:, :n_slots]

    if weighted and _dig_wmode(wmode) is not None:
        return jnp.stack([post(r) for r in results])  # (n_digits, m, slots)
    counts = post(results[0])
    if weighted:
        k = 1 if _kahan(wmode) else 0
        if k:
            counts = counts - post(results[1])
        channels = tuple(post(r) for r in results[1 + k :]) or None
        counts = _resolve_nonfinite(counts, channels)
    return counts


# ---------------------------------------------------------------------------


def _interpret():
    """On CPU, run kernels under the TPU-semantics Pallas interpreter (it
    enforces TPU grid rules — e.g. output blocks must be revisited in
    consecutive grid steps — that the legacy functional interpreter would
    silently tolerate; set XHIST_LEGACY_INTERPRET=1 to fall back)."""
    if jax.default_backend() == "tpu":
        return False
    if _os.environ.get("XHIST_LEGACY_INTERPRET", "0") == "1":
        return True
    return pltpu.InterpretParams()


def _dispatch(arrays_2d, edges, weights_2d, nbins, reduce_all,
              wmode="split", uniform=None):
    # float16 (alone among the narrow dtypes) cannot be widened in-kernel:
    # the TPU VPU has bf16 converts but no f16 extf, so even the f32
    # upcast fails Mosaic lowering (probed r5, scripts/r5_narrow_dtype.py
    # — bf16/i8/i16 run at full rate through _widen). Pre-cast f16 data
    # and its compare-form edges to f32 here (exact: f16 ⊂ f32, so every
    # comparison is unchanged); costs one XLA-fused pass over the data.
    if any(a.dtype == jnp.float16 for a in arrays_2d):
        arrays_2d = [
            a.astype(jnp.float32) if a.dtype == jnp.float16 else a
            for a in arrays_2d
        ]
        edges = [
            e.astype(jnp.float32) if e.dtype == jnp.float16 else e
            for e in edges
        ]
    n_inputs = len(arrays_2d)
    m, c = arrays_2d[0].shape
    n_outs = 1
    if weights_2d is not None:
        n_outs += _weighted_extra_outputs(_faithful_mode(weights_2d), wmode)
    # reduce_all inputs may be natural (m', c') views of the flat element
    # set; the plan's canonical full-reduce layout is m == 1
    kernel = plan(
        n_inputs,
        nbins,
        1 if reduce_all else m,
        c=None if reduce_all else c,
        weighted=weights_2d is not None,
        n_outs=n_outs,
        uniform=uniform,
        wmode=wmode,
    )
    forced = _os.environ.get("XHIST_FORCE_KERNEL")
    if forced:  # probe/bench knob: bypass plan()'s choice
        kernel = forced
    if kernel is None:
        # Explicit method='pallas' call outside the efficient envelope:
        # honor it with the most general kernel for the layout ('auto'
        # never lands here — supports() gates on the same plan()).
        kernel = "factored" if reduce_all else "direct"
    if kernel == "one_input":
        return _run_one_input(
            arrays_2d[0], weights_2d, edges[0], nbins, reduce_all,
            wmode=wmode,
        )
    if kernel == "joint2":
        return _run_joint2(
            arrays_2d[0], arrays_2d[1], weights_2d, edges[0], edges[1],
            nbins, wmode=wmode,
        )
    if kernel == "factored":
        return _run_factored(arrays_2d, edges, weights_2d, nbins,
                             wmode=wmode, uniform=uniform)
    if kernel == "factored_per_row":
        return _run_factored(
            list(arrays_2d), edges, weights_2d, nbins, per_row=True,
            wmode=wmode, uniform=uniform,
        )
    if kernel == "factored_packed":
        return _run_factored(
            list(arrays_2d), edges, weights_2d, nbins, packed=True,
            wmode=wmode, uniform=uniform,
        )
    return _run_direct(list(arrays_2d), edges, weights_2d, nbins,
                       wmode=wmode, uniform=uniform)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _weighted_call(arrays_2d, edges, weights_2d, nbins, reduce_all, wmode,
                   uniform):
    """Weighted kernel dispatch with a custom VJP: the histogram is linear in
    the weights, so d(counts)/d(w_e) is the one-hot of element e's joint slot
    — the cotangent pullback is a gather of g at each element's slot. Data
    and edge cotangents are zero (piecewise-constant dependence), matching
    the XLA strategies' implicit behavior."""
    from .partitioning import partitioned_dispatch

    return partitioned_dispatch(arrays_2d, edges, weights_2d, nbins,
                                reduce_all, wmode=wmode, uniform=uniform)


def _weighted_fwd(arrays_2d, edges, weights_2d, nbins, reduce_all, wmode,
                  uniform):
    from .partitioning import partitioned_dispatch

    out = partitioned_dispatch(arrays_2d, edges, weights_2d, nbins,
                               reduce_all, wmode=wmode, uniform=uniform)
    return out, (arrays_2d, edges, jnp.zeros((), weights_2d.dtype))


def _weighted_bwd(nbins, reduce_all, wmode, uniform, res, g):
    from .digitize import digitize_edges, joint_bin_index

    arrays_2d, edges, w_proto = res
    indices = [digitize_edges(a, e) for a, e in zip(arrays_2d, edges)]
    gidx, _ = joint_bin_index(indices, nbins)
    if g.shape[0] == 1 and gidx.shape[0] != 1:
        dw = jnp.take(g[0], gidx)
    else:
        dw = jnp.take_along_axis(g, gidx, axis=1)
    zeros_a = tuple(jnp.zeros_like(a) for a in arrays_2d)
    zeros_e = tuple(jnp.zeros_like(e) for e in edges)
    return zeros_a, zeros_e, dw.astype(w_proto.dtype)


_weighted_call.defvjp(_weighted_fwd, _weighted_bwd)


def pallas_histogram2d(arrays_2d, edges, weights_2d, nbins, reduce_all=False,
                       weighted_mode=None, uniform=None):
    """Fused Pallas histogram over a 2-D layout.

    With ``reduce_all=False`` the layout is the canonical (kept rows, reduce
    cols). With ``reduce_all=True`` the 2-D shape is an arbitrary
    minor-dim-preserving view of the full element set (zero host reshapes —
    pallas operands are materialized buffers, so a flatten would be a real
    HBM copy) and the result has one logical row.

    Weighted calls are differentiable w.r.t. the weights (custom VJP).

    Returns ``counts (M, prod(nbins) + 1)`` — trailing trash slot dropped by
    the caller (same contract as the ops.bincount strategies). The
    per-digit-output integer modes (``weighted_mode="digN"``, core's exact
    wide-weight engine) return ``(N, M, prod(nbins) + 1)`` int32 instead —
    one per-slot sum per signed base-256 digit of the int32 weights, no
    shift-combine (the host recombines in 64-bit arithmetic).
    """
    reduce_all = bool(reduce_all or arrays_2d[0].shape[0] == 1)
    if weights_2d is not None:
        return _weighted_call(
            tuple(arrays_2d), tuple(edges), weights_2d, tuple(nbins),
            reduce_all, _resolve_wmode(weighted_mode), uniform,
        )
    from .partitioning import partitioned_dispatch

    return partitioned_dispatch(list(arrays_2d), list(edges), None, nbins,
                                reduce_all, uniform=uniform)

"""GSPMD partitioning rule for the fused Pallas dispatch.

A user who wraps ``histogram`` in their own ``jit`` over mesh-sharded
inputs previously got GSPMD's default treatment of the Pallas custom
call — all-gather the operands and run the kernel replicated (correct,
not distributed; ``pallas_call`` carries no partitioning rule). EAGER
calls were already covered by core's auto-delegation to
``histogram_sharded``; this module closes the traced-caller case by
registering a ``jax.experimental.custom_partitioning`` node around the
kernel dispatch (the TPU-native analog of the reference's distributed
path working from inside user graph code, reference core.py:403-439):

  - every data/weights operand partitions like the first *informatively
    sharded* data operand (they share one broadcast (m, c) layout
    upstream, so one spec fits all);
  - bin-edge operands replicate (small compile-time metadata);
  - each shard runs the same fused kernel on its local block — the
    kernel family re-plans on the *local* shape inside the partition
    body, so per-shard tiles still route to the measured-best family;
  - one ``psum`` over the mesh axes that shard REDUCED data axes
    completes the histogram (the same single-collective structure
    ``histogram_sharded`` builds explicitly with shard_map).

Exactness across the node is the same as ``histogram_sharded``'s:
unweighted int32 partials sum to the global count, which core already
bounds below 2**31 (the wide path never routes here); the intN integer
modes psum mod-2**32 partials — linear, so the wrap contract holds; the
digN per-digit modes are only reachable from the eager host engine.

The node is bypassed (plain dispatch) when it cannot help or run:
  - inside ``shard_map`` (manual mesh axes — ``histogram_sharded``
    already owns the collective there, and custom_partitioning needs
    GSPMD context);
  - under ``vmap`` (custom_partitioning has no batching rule; direct
    vmap is gated off eagerly, and vmap applied later to an enclosing
    jit's jaxpr is absorbed by a ``custom_vmap`` rule that swaps in the
    plain dispatch, vmapped the way ``pallas_call`` already supports);
  - under the TPU-semantics CPU interpreter (its callback shim carries
    an ``OrderedIOEffect`` that the partitioning module builder cannot
    host; the legacy interpreter partitions fine and backs the
    HLO-level tests — scripts/r5_custom_partitioning.py records the
    probe);
  - ``XHIST_CUSTOM_PARTITION=0`` (escape hatch).
"""

import os as _os
from functools import lru_cache

import jax
from jax.custom_batching import custom_vmap
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

# private-API imports, pinned by tests/test_custom_partitioning.py's
# detection unit tests so a jax upgrade that moves them fails loudly
from jax._src import mesh as _mesh_internal
from jax._src.interpreters import batching as _batching

__all__ = ["partition_wanted", "partitioned_dispatch"]


def _in_manual_context():
    """True inside shard_map (mesh axes are Manual there)."""
    try:
        return bool(_mesh_internal.get_abstract_mesh().manual_axes)
    except Exception:  # pragma: no cover — private-API drift
        return True  # can't tell: skip the node, plain dispatch is safe


def _under_vmap(ops):
    return any(isinstance(x, _batching.BatchTracer) for x in ops)


def partition_wanted(ops):
    """Should this dispatch go through the custom_partitioning node?"""
    if _os.environ.get("XHIST_CUSTOM_PARTITION", "1") != "1":
        return False
    from .pallas_hist import _interpret

    interp = _interpret()
    if not (interp is False or interp is True):
        # TPU-semantics interpreter: OrderedIOEffect blocker (see module
        # docstring). Real TPU (False) and legacy interpreter (True) work.
        return False
    if _in_manual_context() or _under_vmap(ops):
        return False
    return True


def _first_informative_spec(arg_shapes, n_data):
    """Spec of the first data/weights operand that is actually sharded
    (all data-shaped operands share one broadcast layout, so any of their
    specs is valid for all; a replicated first operand must not force an
    all-gather of a sharded second)."""
    candidates = list(arg_shapes[:n_data]) + list(arg_shapes[2 * n_data:])
    for s in candidates:
        spec = tuple(s.sharding.spec)
        if any(e is not None for e in spec):
            return spec + (None,) * (2 - len(spec))
    return (None, None)


@lru_cache(maxsize=None)
def _make_node(n_inputs, nbins, reduce_all, wmode, uniform, weighted):
    """One cached node per static dispatch signature (the partition
    callbacks close over the statics; lru_cache keeps jit tracing from
    rebuilding identical nodes)."""
    from . import pallas_hist as _ph

    dig = _ph._dig_wmode(wmode) if weighted else None

    def fn(*ops):
        arrays = list(ops[:n_inputs])
        edges = list(ops[n_inputs:2 * n_inputs])
        w = ops[2 * n_inputs] if weighted else None
        return _ph._dispatch(arrays, edges, w, nbins, reduce_all,
                             wmode=wmode, uniform=uniform)

    node = custom_partitioning(fn)

    def _out_spec(row):
        # digN results carry a leading per-digit axis (never sharded)
        return P(None, row, None) if dig else P(row, None)

    def infer(mesh, arg_shapes, result_shape):
        spec = _first_informative_spec(arg_shapes, n_inputs)
        row = None if reduce_all else spec[0]
        return NamedSharding(mesh, _out_spec(row))

    def partition(mesh, arg_shapes, result_shape):
        spec = _first_informative_spec(arg_shapes, n_inputs)
        data_sh = NamedSharding(mesh, P(*spec))
        repl = NamedSharding(mesh, P())
        row = None if reduce_all else spec[0]
        out_sh = NamedSharding(mesh, _out_spec(row))
        # mesh axes sharding REDUCED data axes: always the minor (reduce
        # cols) axis; the rows too under reduce_all (both axes of the
        # natural view are reduced there)
        red = (spec[0], spec[1]) if reduce_all else (spec[1],)
        red_names = []
        for ax in red:
            if ax is None:
                continue
            red_names += list(ax) if isinstance(ax, tuple) else [ax]

        def lower_fn(*ops):
            counts = fn(*ops)  # local shard; plan() re-routes on its shape
            if red_names:
                counts = jax.lax.psum(counts, tuple(red_names))
            return counts

        arg_shs = (data_sh,) * n_inputs + (repl,) * n_inputs + (
            (data_sh,) if weighted else ()
        )
        return mesh, lower_fn, out_sh, arg_shs

    # Shardy sharding rule: every data/weights operand is (rows, reduce
    # cols); edges get distinct factors; reduce_all emits a fresh
    # size-1 row factor ("z"), digN a fresh leading digit factor ("d").
    data_f = ["m e"] * n_inputs
    edge_f = [f"b{i}" for i in range(n_inputs)]
    w_f = ["m e"] if weighted else []
    out_row = "z" if reduce_all else "m"
    out_f = f"d {out_row} s" if dig else f"{out_row} s"
    rule = ", ".join(data_f + edge_f + w_f) + " -> " + out_f
    node.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        reduction_factors=("m", "e") if reduce_all else ("e",),
    )

    # custom_partitioning has NO batching rule, and the _under_vmap gate
    # cannot see batching that is applied to an enclosing jit's jaxpr
    # AFTER tracing (vmap-of-jit). custom_vmap closes that hole at the
    # jaxpr level: when anything batches this node, the rule swaps in the
    # plain (un-partitioned) dispatch vmapped the way pallas_call already
    # supports — exactly the pre-node behavior.
    vnode = custom_vmap(lambda *ops: node(*ops))

    @vnode.def_vmap
    def _vmap_rule(axis_size, in_batched, *ops):
        in_axes = tuple(0 if b else None for b in in_batched)
        out = jax.vmap(fn, in_axes=in_axes)(*ops)
        return out, True

    return vnode


def partitioned_dispatch(arrays_2d, edges, weights_2d, nbins, reduce_all,
                         wmode="split", uniform=None):
    """Kernel dispatch that partitions under a user's jit over sharded
    inputs (per-shard fused kernels + one psum) where possible, and falls
    back to the plain dispatch everywhere else. Drop-in for
    ``pallas_hist._dispatch`` — same static args, same result contract."""
    from .pallas_hist import _dispatch

    ops = tuple(arrays_2d) + tuple(edges) + (
        () if weights_2d is None else (weights_2d,)
    )
    if not partition_wanted(ops):
        return _dispatch(list(arrays_2d), list(edges), weights_2d, nbins,
                         reduce_all, wmode=wmode, uniform=uniform)
    node = _make_node(
        len(arrays_2d), tuple(int(n) for n in nbins), bool(reduce_all),
        wmode, uniform, weights_2d is not None,
    )
    return node(*ops)

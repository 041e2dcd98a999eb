"""Probe: jax.experimental.custom_partitioning around the fused pallas
dispatch (VERDICT r4 next #4).

Question: can a user-jitted `histogram` over mesh-sharded inputs run
per-shard fused kernels + psum instead of GSPMD's all-gather-and-replicate
(pallas_call is a custom call with no partitioning rule)?

Stages:
  1. minimal custom_partitioning + psum viability (done inline in r5 —
     works: no all-gather, all-reduce present, exact result)
  2. THIS SCRIPT: the real `pallas_histogram2d` inside lower_fn on the
     8-virtual-device CPU mesh (interpret-mode kernels) — HLO checked for
     the absence of all-gather over the data and the presence of
     all-reduce; results checked exactly vs numpy.

Run: PYTHONPATH= JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/r5_custom_partitioning.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.custom_partitioning import custom_partitioning

    from xhistogram_tpu.ops.pallas_hist import pallas_histogram2d

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("r", "c"))

    nbins = (8,)
    edges_np = np.linspace(0.0, 1.0, 9).astype(np.float32)

    def make_node(weighted, reduce_all):
        if weighted:
            def fn(a, e, w):
                return pallas_histogram2d([a], [e], w, nbins,
                                          reduce_all=reduce_all)
        else:
            def fn(a, e):
                return pallas_histogram2d([a], [e], None, nbins,
                                          reduce_all=reduce_all)

        node = custom_partitioning(fn)

        def infer(mesh_, arg_shapes, result_shape):
            spec = arg_shapes[0].sharding.spec
            row = None if reduce_all else (spec[0] if len(spec) else None)
            return NamedSharding(mesh_, P(row, None))

        def partition(mesh_, arg_shapes, result_shape):
            a_sh = arg_shapes[0].sharding
            spec = tuple(a_sh.spec) + (None,) * (2 - len(a_sh.spec))
            data_sh = NamedSharding(mesh_, P(*spec))
            repl = NamedSharding(mesh_, P(None))
            row = None if reduce_all else spec[0]
            out_sh = NamedSharding(mesh_, P(row, None))
            red = [ax for ax in (
                (spec[0], spec[1]) if reduce_all else (spec[1],)
            ) if ax is not None]
            red_names = sum(
                [list(ax) if isinstance(ax, tuple) else [ax] for ax in red],
                [],
            )

            def lower_fn(*ops):
                counts = fn(*ops)
                if red_names:
                    counts = jax.lax.psum(counts, tuple(red_names))
                return counts

            arg_shs = (data_sh, repl) + ((data_sh,) if weighted else ())
            return mesh_, lower_fn, out_sh, arg_shs

        rules = {
            (False, False): ("m e, b -> m s", ("e",)),
            (False, True): ("m e, b -> z s", ("m", "e")),
            (True, False): ("m e, b, m e -> m s", ("e",)),
            (True, True): ("m e, b, m e -> z s", ("m", "e")),
        }
        rule, red_factors = rules[(weighted, reduce_all)]
        node.def_partition(
            infer_sharding_from_operands=infer,
            partition=partition,
            sharding_rule=rule,
            reduction_factors=red_factors,
        )
        return node

    rng = np.random.RandomState(0)
    a = rng.rand(8, 64).astype(np.float32)
    w = rng.rand(8, 64).astype(np.float32)
    e = jnp.asarray(edges_np)

    for weighted in (False, True):
        for reduce_all in (False, True):
            for spec in (P("r", "c"), P(None, ("r", "c")), P("r", None)):
                node = make_node(weighted, reduce_all)
                ash = jax.device_put(a, NamedSharding(mesh, spec))
                wsh = jax.device_put(w, NamedSharding(mesh, spec))
                args = (ash, e) + ((wsh,) if weighted else ())
                f = jax.jit(node)
                out = np.asarray(f(*args))

                # numpy oracle (right-open, inclusive top edge; data in
                # (0,1) so no edge collisions)
                idx = np.minimum((a * 8).astype(int), 7)
                exp = np.zeros((8, 9), np.float64)
                for i in range(8):
                    for j in range(64):
                        exp[i, idx[i, j]] += w[i, j] if weighted else 1
                if reduce_all:
                    exp = exp.sum(0, keepdims=True)
                got = out[:, :8].astype(np.float64)
                ok = (
                    # split mode: ~17-bit weight carrier → ~1e-5 relative
                    np.allclose(got, exp[:, :8], rtol=5e-4, atol=1e-4)
                    if weighted
                    else np.array_equal(got, exp[:, :8])
                )

                txt = f.lower(*args).compile().as_text()
                has_ag = "all-gather" in txt
                has_ar = "all-reduce" in txt
                print(
                    f"weighted={weighted} reduce_all={reduce_all} "
                    f"spec={spec}: parity={ok} all-gather={has_ag} "
                    f"all-reduce={has_ar}"
                )
                assert ok
    print("PROBE OK: pallas dispatch partitions under custom_partitioning")


if __name__ == "__main__":
    main()

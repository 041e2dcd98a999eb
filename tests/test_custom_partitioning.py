"""Traced-caller distribution: the custom_partitioning node around the
fused Pallas dispatch (VERDICT r4 #4; ops/partitioning.py).

A user who wraps ``histogram`` in their OWN jit over mesh-sharded inputs
must get per-shard fused kernels + one psum — not GSPMD's default
all-gather-and-replicate of the Pallas custom call. These tests pin that
at the HLO level (no all-gather, all-reduce present) and by exact
parity, on the 8-virtual-device CPU mesh under the legacy interpreter
(the TPU-semantics interpreter's callback shim carries an
OrderedIOEffect that custom_partitioning's module builder cannot host;
real TPU runs interpret=False and takes the node unconditionally).

Shapes here are deliberately unique to this file: the jitted pipeline's
executable cache does not key on XHIST_LEGACY_INTERPRET, so sharing an
(aval, static-args) signature with another test could resurface a
compilation made under the other interpreter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xhistogram_tpu import histogram

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


@pytest.fixture(autouse=True)
def _legacy_interpreter(monkeypatch):
    monkeypatch.setenv("XHIST_LEGACY_INTERPRET", "1")


def _mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("r", "c"))


EDGES = np.linspace(0.0, 1.0, 8).astype(np.float64)  # 7 bins (unique here)


def _oracle(a, w=None):
    return np.stack([
        np.histogram(a[i], bins=EDGES,
                     weights=None if w is None else w[i])[0]
        for i in range(a.shape[0])
    ])


def test_user_jit_sharded_unweighted_no_allgather():
    mesh = _mesh()
    rng = np.random.RandomState(0)
    a = rng.rand(16, 96).astype(np.float32)
    ash = jax.device_put(a, NamedSharding(mesh, P("r", "c")))

    f = jax.jit(
        lambda x: histogram(x, bins=[EDGES], axis=1, method="pallas")[0]
    )
    txt = f.lower(ash).compile().as_text()
    assert "all-gather" not in txt
    assert "all-reduce" in txt  # the reduce-axis psum
    out = np.asarray(f(ash))
    np.testing.assert_array_equal(out, _oracle(a))
    # kept rows stay sharded over their mesh axis — no output gather
    got = f(ash)
    assert got.sharding.spec[0] == "r"


def test_user_jit_sharded_weighted_and_grad():
    mesh = _mesh()
    rng = np.random.RandomState(1)
    a = rng.rand(16, 96).astype(np.float32)
    w = rng.rand(16, 96).astype(np.float32)
    sh = NamedSharding(mesh, P("r", "c"))
    ash, wsh = jax.device_put(a, sh), jax.device_put(w, sh)

    def loss(x, wt):
        h, _ = histogram(x, bins=[EDGES], axis=1, weights=wt,
                         method="pallas")
        return (h * h).sum()

    f = jax.jit(loss)
    txt = f.lower(ash, wsh).compile().as_text()
    assert "all-gather" not in txt
    assert "all-reduce" in txt
    exp = _oracle(a, w)
    np.testing.assert_allclose(
        float(f(ash, wsh)), float((exp * exp).sum()), rtol=5e-4
    )
    # grad w.r.t. weights flows through the custom VJP around the node
    g = jax.jit(jax.grad(loss, argnums=1))(ash, wsh)
    # d/dw_e sum(h^2) = 2*h[slot(e)]
    idx = np.clip(
        np.searchsorted(EDGES, a.astype("f8"), side="right") - 1, 0, 6
    )
    in_range = (a >= EDGES[0]) & (a <= EDGES[-1])
    gexp = np.where(in_range, 2 * np.take_along_axis(exp, idx, axis=1), 0.0)
    np.testing.assert_allclose(np.asarray(g), gexp, rtol=5e-4, atol=1e-3)


def test_full_reduction_sharded_psums_both_axes():
    mesh = _mesh()
    rng = np.random.RandomState(2)
    a = rng.rand(16, 96).astype(np.float32)
    ash = jax.device_put(a, NamedSharding(mesh, P("r", "c")))
    f = jax.jit(lambda x: histogram(x, bins=[EDGES], method="pallas")[0])
    txt = f.lower(ash).compile().as_text()
    assert "all-gather" not in txt
    assert "all-reduce" in txt
    np.testing.assert_array_equal(
        np.asarray(f(ash)), np.histogram(a, bins=EDGES)[0]
    )


def test_vmap_still_works_bypassing_node():
    # custom_partitioning has no batching rule; the dispatch detects vmap
    # and takes the plain path
    rng = np.random.RandomState(3)
    a = rng.rand(5, 97).astype(np.float32)
    f = jax.vmap(
        lambda row: histogram(row, bins=[EDGES], method="pallas")[0]
    )
    out = np.asarray(f(jnp.asarray(a)))
    np.testing.assert_array_equal(out, _oracle(a))


def test_vmap_of_jit_absorbed_by_custom_vmap_rule():
    # vmap applied AFTER tracing (to the enclosing jit's jaxpr) cannot be
    # seen by the eager BatchTracer gate — the node's custom_vmap rule
    # must absorb it
    rng = np.random.RandomState(7)
    a = rng.rand(5, 97).astype(np.float32)
    f = jax.vmap(
        jax.jit(lambda row: histogram(row, bins=[EDGES],
                                      method="pallas")[0])
    )
    out = np.asarray(f(jnp.asarray(a)))
    np.testing.assert_array_equal(out, _oracle(a))


def test_histogram_sharded_unaffected():
    # shard_map bodies must bypass the node (manual mesh axes)
    from xhistogram_tpu.parallel import histogram_sharded

    mesh = _mesh()
    rng = np.random.RandomState(4)
    a = rng.rand(16, 96).astype(np.float32)
    h, _ = histogram_sharded(
        a, mesh=mesh, in_spec=P("r", "c"), bins=[EDGES], axis=1
    )
    np.testing.assert_array_equal(np.asarray(h), _oracle(a))


def test_gate_detection_units():
    """The gates rely on two private jax APIs — pin them so an upgrade
    that moves them fails here, not silently mid-dispatch."""
    from xhistogram_tpu.ops.partitioning import (
        _in_manual_context,
        _under_vmap,
    )

    assert _in_manual_context() is False

    seen = {}

    def body(x):
        seen["manual"] = _in_manual_context()
        return x

    mesh = Mesh(np.array(jax.devices()[:1]), ("q",))
    jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P(), out_specs=P()))(
        jnp.ones(3)
    )
    assert seen["manual"] is True

    assert _under_vmap((jnp.ones(3),)) is False
    hit = {}

    def vb(x):
        hit["vmapped"] = _under_vmap((x,))
        return x

    jax.vmap(vb)(jnp.ones((2, 3)))
    assert hit["vmapped"] is True

"""Probe which Mosaic ops compile on this chip: reshapes, transposes,
rank-3 broadcasts/reductions, dot_general variants. Drives kernel design."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, kernel, out_shape, *inputs):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(f)(*inputs)
        r.block_until_ready()
        print(f"OK    {name}")
        return np.asarray(r)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL  {name}: {msg}")
        return None


x8x512 = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512)
i8x512 = jnp.arange(8 * 512, dtype=jnp.int32).reshape(8, 512)
x1x4096 = jnp.arange(4096, dtype=jnp.float32).reshape(1, 4096)
i1x4096 = jnp.arange(4096, dtype=jnp.int32).reshape(1, 4096)

# 1. reshapes
try_kernel("reshape (8,512)->(32,128)",
           lambda i, o: o.__setitem__(..., i[...].reshape(32, 128)),
           ((32, 128), jnp.float32), x8x512)
try_kernel("reshape (8,512)->(1,4096)",
           lambda i, o: o.__setitem__(..., i[...].reshape(1, 4096)),
           ((1, 4096), jnp.float32), x8x512)
try_kernel("reshape (8,512)->(4096,1)",
           lambda i, o: o.__setitem__(..., i[...].reshape(4096, 1)),
           ((4096, 1), jnp.float32), x8x512)
try_kernel("reshape (1,4096)->(4096,1)",
           lambda i, o: o.__setitem__(..., i[...].reshape(4096, 1)),
           ((4096, 1), jnp.float32), x1x4096)

# 2. transpose
try_kernel("transpose (8,512)->(512,8)",
           lambda i, o: o.__setitem__(..., i[...].T),
           ((512, 8), jnp.float32), x8x512)
try_kernel("transpose (128,128)",
           lambda i, o: o.__setitem__(..., i[...].T),
           ((128, 128), jnp.float32),
           jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128))

# 3. rank-3 compare + reductions
def r3_reduce_mid(i, o):
    cmp = (i[...][:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (8, 512, 128), 2)).astype(jnp.float32)
    o[...] = jnp.sum(cmp, axis=1)
try_kernel("rank3 (8,512,128) compare + sum axis=1", r3_reduce_mid,
           ((8, 128), jnp.float32), i8x512)

def r3_reduce_lead(i, o):
    cmp = (i[...][:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (8, 512, 128), 2)).astype(jnp.float32)
    o[...] = jnp.sum(cmp, axis=0)
try_kernel("rank3 (8,512,128) compare + sum axis=0", r3_reduce_lead,
           ((512, 128), jnp.float32), i8x512)

# 4. broadcast (N,1) vs (1,E) compare  → (N, E), then A @ B.T dot_general
def factored(ia, o):
    a = ia[...]  # (1, 4096) int32
    slots = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    A = (slots == a).astype(jnp.float32)          # (128, 4096)
    B = (slots == (a // 32)).astype(jnp.float32)  # (128, 4096)
    o[...] = jax.lax.dot_general(
        A, B, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
try_kernel("factored: (128,1)==(1,4096) bcast + dot_general contract minor",
           factored, ((128, 128), jnp.float32), i1x4096)

# 5. digitize on a (1, E) row via rank-3 edges
def digitize_row(ia, o):
    a = ia[...]  # (1, 4096) f32
    edges = jax.lax.broadcasted_iota(jnp.float32, (1, 4096, 128), 2) * 32.0
    idx = jnp.sum((a[:, :, None] >= edges).astype(jnp.int32), axis=2)
    o[...] = idx
try_kernel("digitize rank3 on (1,4096) row", digitize_row,
           ((1, 4096), jnp.int32), x1x4096)

# 6. bf16 matmul variant of factored
def factored_bf16(ia, o):
    a = ia[...]
    slots = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    A = (slots == a).astype(jnp.bfloat16)
    B = (slots == (a // 32)).astype(jnp.bfloat16)
    o[...] = jax.lax.dot_general(
        A, B, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
try_kernel("factored bf16 operands f32 accum", factored_bf16,
           ((128, 128), jnp.float32), i1x4096)

# 7. strided gather-free row extraction: data[s, :] from (8,512)
def row_extract(i, o):
    o[...] = i[...][3:4, :]
try_kernel("static row slice (8,512)->(1,512)", row_extract,
           ((1, 512), jnp.float32), x8x512)

# 8. int matmul (i8 x i8 -> i32)
def int_mm(ia, o):
    a = (ia[...] > 100).astype(jnp.int8).reshape(128, 32)
    o[...] = jax.lax.dot_general(
        a, a, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
try_kernel("int8 matmul i32 accum (128,32)x(128,32)^T", int_mm,
           ((128, 128), jnp.int32), i1x4096)

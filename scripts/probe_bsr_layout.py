"""AOT memory-analysis probe: which BSR value layout avoids the while-loop
relayout copy at 324^3x3 (8.6 GB operator)?

Compiles (never runs) a fori_loop-wrapped chunked BSR matvec for candidate
storage layouts and prints XLA's temp/argument byte counts.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

nx, bs, D = 324, 3, 7
RB = nx ** 3
MB = RB
chunk = 1 << 21
n_ch = -(-RB // chunk)


def report(name, fn, args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        m = c.memory_analysis()
        print(f"{name}: temp={m.temp_size_in_bytes/1e9:.2f}G "
              f"args={m.argument_size_in_bytes/1e9:.2f}G "
              f"out={m.output_size_in_bytes/1e9:.3f}G "
              f"total={(m.temp_size_in_bytes+m.argument_size_in_bytes)/1e9:.2f}G",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {e!s:.300}", flush=True)


S = jax.ShapeDtypeStruct

# (a) plane-major 4-D + einsum (current)
def mv_einsum(vals, bcols, xb):
    def body(i, y):
        i0 = jnp.minimum(i * chunk, RB - chunk)
        bcc = jax.lax.dynamic_slice_in_dim(bcols, i0, chunk, 0)
        vlc = jax.lax.dynamic_slice_in_dim(vals, i0, chunk, 3)
        yc = jnp.zeros((chunk, bs), jnp.float32)
        for w in range(D):
            g = jnp.take(xb, bcc[:, w], axis=0)
            yc = yc + jnp.einsum("ijr,rj->ri", vlc[w], g)
        return jax.lax.dynamic_update_slice_in_dim(y, yc, i0, 0)
    return jax.lax.fori_loop(0, n_ch, body, jnp.zeros((RB, bs), jnp.float32))


def loop8(mv):
    def run(vals, bcols, xb):
        def step(i, x):
            y = mv(vals, bcols, x)
            return y / (1.0 + jnp.sum(y[:1]) * 1e-20)
        out = jax.lax.fori_loop(0, 8, step, xb)
        return jnp.sum(out.ravel()[:1])
    return run

report("einsum-4d", loop8(lambda v, b, x: mv_einsum(v, b, x).reshape(MB, bs)),
       (S((D, bs, bs, RB), jnp.float32), S((RB, D), jnp.int32),
        S((MB, bs), jnp.float32)))

# (b) plane arithmetic on static slices of the same 4-D array
def mv_planes4d(vals, bcols, xb):
    def body(i, y):
        i0 = jnp.minimum(i * chunk, RB - chunk)
        bcc = jax.lax.dynamic_slice_in_dim(bcols, i0, chunk, 0)
        vlc = jax.lax.dynamic_slice_in_dim(vals, i0, chunk, 3)
        cols = []
        for i_ in range(bs):
            acc = jnp.zeros((chunk,), jnp.float32)
            for w in range(D):
                g = jnp.take(xb, bcc[:, w], axis=0)
                for j in range(bs):
                    acc = acc + vlc[w, i_, j] * g[:, j]
            cols.append(acc)
        yc = jnp.stack(cols, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(y, yc, i0, 0)
    return jax.lax.fori_loop(0, n_ch, body, jnp.zeros((RB, bs), jnp.float32))

report("planes-4d-static-slice",
       loop8(lambda v, b, x: mv_planes4d(v, b, x).reshape(MB, bs)),
       (S((D, bs, bs, RB), jnp.float32), S((RB, D), jnp.int32),
        S((MB, bs), jnp.float32)))

# (c) tuple of 1-D planes
def mv_tuple(vals, bcols, xb):
    def body(i, y):
        i0 = jnp.minimum(i * chunk, RB - chunk)
        bcc = jax.lax.dynamic_slice_in_dim(bcols, i0, chunk, 0)
        cols = []
        for i_ in range(bs):
            acc = jnp.zeros((chunk,), jnp.float32)
            for w in range(D):
                g = jnp.take(xb, bcc[:, w], axis=0)
                for j in range(bs):
                    v = jax.lax.dynamic_slice_in_dim(
                        vals[(w * bs + i_) * bs + j], i0, chunk, 0)
                    acc = acc + v * g[:, j]
            cols.append(acc)
        yc = jnp.stack(cols, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(y, yc, i0, 0)
    return jax.lax.fori_loop(0, n_ch, body, jnp.zeros((RB, bs), jnp.float32))

report("tuple-1d",
       loop8(lambda v, b, x: mv_tuple(v, b, x).reshape(MB, bs)),
       (tuple(S((RB,), jnp.float32) for _ in range(D * bs * bs)),
        S((RB, D), jnp.int32), S((MB, bs), jnp.float32)))

"""Bisect the P5 Mosaic internal compiler crash (tools/probe_inkernel.py):
which construct combination kills tpu_compile_helper. Run as the only TPU
process."""

import sys
import time
import traceback

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

L, W, T = 256, 512, 2048


def report(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {out}")
        return True
    except Exception as e:  # noqa: BLE001
        head = (str(e).splitlines() or [type(e).__name__])[0]
        print(f"{name}: FAIL {type(e).__name__}: {head[:200]}")
        if "--verbose" in sys.argv:
            traceback.print_exc()
        return False


def run(kernel, steps=64):
    words = np.random.default_rng(0).integers(
        0, 1 << 31, (L, W)).astype(np.int32)
    tab = ((np.arange(T) % 13 + 2) | ((np.arange(T) % 251) << 8)).astype(
        np.int32)[None, :]
    f = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((L, 1), jnp.int32)))
    out = np.asarray(f(words, tab))
    return int(out[0, 0])


# A: fori + ONE select-reduce gather per step, all i32
def a():
    def kernel(words_ref, tab_ref, out_ref):
        tab = tab_ref[...]
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)

        def step(i, st):
            idx, acc = st
            e = jnp.sum(jnp.where(iota_t == idx, tab, 0), axis=1,
                        keepdims=True)
            return (idx + e) % T, acc + e

        idx0 = jnp.zeros((L, 1), jnp.int32)
        _, acc = jax.lax.fori_loop(0, 64, step, (idx0, idx0))
        out_ref[...] = acc
    return run(kernel)


# B: A + second select-reduce over the [L, W] words (per-lane row gather)
def b():
    def kernel(words_ref, tab_ref, out_ref):
        words = words_ref[...]
        tab = tab_ref[...]
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (L, W), 1)

        def step(i, st):
            idx, acc = st
            e = jnp.sum(jnp.where(iota_t == idx, tab, 0), axis=1,
                        keepdims=True)
            w = jnp.sum(jnp.where(iota_w == (idx % W), words, 0), axis=1,
                        keepdims=True)
            return (idx + e + (w & 7)) % T, acc + e + w

        idx0 = jnp.zeros((L, 1), jnp.int32)
        _, acc = jax.lax.fori_loop(0, 64, step, (idx0, idx0))
        out_ref[...] = acc
    return run(kernel)


# C: A + bitcast i32->u32->i32 in the loop
def c():
    def kernel(words_ref, tab_ref, out_ref):
        tab = tab_ref[...]
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)

        def step(i, st):
            idx, acc = st
            e = jnp.sum(jnp.where(iota_t == idx, tab, 0), axis=1,
                        keepdims=True)
            u = jax.lax.bitcast_convert_type(e, jnp.uint32)
            e2 = jax.lax.bitcast_convert_type(u >> 1, jnp.int32)
            return (idx + e2) % T, acc + e2

        idx0 = jnp.zeros((L, 1), jnp.int32)
        _, acc = jax.lax.fori_loop(0, 64, step, (idx0, idx0))
        out_ref[...] = acc
    return run(kernel)


# D: A + u32 vector-amount shifts in the loop (u32 carry)
def d():
    def kernel(words_ref, tab_ref, out_ref):
        tab = tab_ref[...]
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)

        def step(i, st):
            idx, cur, acc = st
            e = jnp.sum(jnp.where(iota_t == idx, tab, 0), axis=1,
                        keepdims=True)
            sh = (e & 7).astype(jnp.uint32)
            cur = (cur << sh) | (cur >> (jnp.uint32(32) - sh))
            return ((idx + e) % T, cur,
                    acc + jax.lax.bitcast_convert_type(cur, jnp.int32))

        idx0 = jnp.zeros((L, 1), jnp.int32)
        cur0 = jnp.full((L, 1), 0x12345678, jnp.uint32)
        _, _, acc = jax.lax.fori_loop(0, 64, step, (idx0, cur0, idx0))
        out_ref[...] = acc
    return run(kernel)


def main():
    print("devices:", jax.devices())
    report("A fori+lut-gather", a)
    report("B +word-row gather", b)
    report("C +bitcast in loop", c)
    report("D +u32 shifts in loop", d)


if __name__ == "__main__":
    main()

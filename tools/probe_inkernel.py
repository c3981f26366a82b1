"""Feasibility probe: the entropy decode loop INSIDE one Pallas kernel.

VERDICT r3 missing-item 1: every existing device entropy kernel is an
XLA-level loop whose per-sequential-step dispatch costs ~25-40us on this
axon stack; the "host/device crossover does not exist" claim therefore
covers only XLA-loop formulations. This probe tests whether Mosaic can
express the primitives an IN-KERNEL lockstep loop needs — where the
dispatch tax is paid once per kernel, not per step:

  P1  one-hot gather: lut[idx] per lane as (iota == idx) select-reduce
      (VPU) and as one-hot matmul (MXU), lanes on the sublane dim
  P2  variable per-lane shifts of u32/i32 by vector amounts
  P3  lax.while_loop with a jnp.any(...) scalar condition in-kernel
  P4  lax.fori_loop + dynamic store at the loop index (output flush)
  P5  a fused mini decode step (refill gather + LUT gather + shifts)
      iterated N times inside ONE kernel, timed per step

Run as the only TPU process: `timeout 600 python tools/probe_inkernel.py`.
Each probe reports OK / the exact Mosaic lowering failure.
"""

import functools
import sys
import time
import traceback

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


L = 256   # lanes, on the sublane dimension ([L, 1] state vectors)
T = 2048  # first-level LUT size (11-bit peek)


def report(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {out}")
        return True
    except Exception as e:  # noqa: BLE001 — we want the exact failure
        msg = str(e).splitlines()
        head = msg[0] if msg else type(e).__name__
        print(f"{name}: FAIL {type(e).__name__}: {head[:300]}")
        if "--verbose" in sys.argv:
            traceback.print_exc()
        return False


# --- P1a: select-reduce gather (VPU) ------------------------------------
def p1a():
    def kernel(idx_ref, tab_ref, out_ref):
        idx = idx_ref[...]  # [L, 1] i32
        tab = tab_ref[...]  # [1, T] i32
        iota = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)
        onehot = iota == idx  # [L, T] bool (idx broadcasts along lanes)
        out_ref[...] = jnp.sum(jnp.where(onehot, tab, 0), axis=1,
                               keepdims=True)

    idx = np.random.default_rng(0).integers(0, T, (L, 1)).astype(np.int32)
    tab = np.arange(T, dtype=np.int32)[None, :] * 3 + 7
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, 1), jnp.int32))
    got = jax.jit(f)(idx, tab)
    np.testing.assert_array_equal(np.asarray(got)[:, 0], tab[0, idx[:, 0]])
    return "select-reduce gather exact"


# --- P1b: one-hot matmul gather (MXU) ------------------------------------
def p1b():
    C = 8  # gathered fields per entry

    def kernel(idx_ref, tab_ref, out_ref):
        idx = idx_ref[...]
        tab = tab_ref[...]  # [T, C] f32 (integer-valued < 2^24: exact)
        iota = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)
        onehot = (iota == idx).astype(jnp.float32)
        out_ref[...] = jax.lax.dot_general(
            onehot, tab, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    rng = np.random.default_rng(1)
    idx = rng.integers(0, T, (L, 1)).astype(np.int32)
    tab = rng.integers(0, 1 << 16, (T, C)).astype(np.float32)
    f = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((L, C), jnp.float32))
    got = np.asarray(jax.jit(f)(idx, tab))
    np.testing.assert_array_equal(got, tab[idx[:, 0]])
    return "one-hot MXU gather exact"


# --- P2: variable per-lane shifts ----------------------------------------
def p2():
    def kernel(x_ref, n_ref, out_ref):
        x = x_ref[...]
        n = n_ref[...]
        out_ref[...] = ((x << n) | (x >> (32 - n))).astype(jnp.uint32)

    rng = np.random.default_rng(2)
    x = rng.integers(0, 1 << 32, (L, 1), dtype=np.uint64).astype(np.uint32)
    n = rng.integers(1, 31, (L, 1)).astype(np.uint32)
    f = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((L, 1), jnp.uint32))
    got = np.asarray(jax.jit(f)(x, n))
    want = ((x.astype(np.uint64) << n) | (x >> (32 - n))).astype(np.uint32)
    np.testing.assert_array_equal(got, want)
    return "vector-amount u32 shifts exact"


# --- P3: while_loop with any() condition ---------------------------------
def p3():
    def kernel(x_ref, out_ref):
        x = x_ref[...]

        def cond(st):
            v, it = st
            return jnp.any(v > 0) & (it < 100)

        def body(st):
            v, it = st
            return v - 1, it + 1

        v, it = jax.lax.while_loop(cond, body, (x, jnp.int32(0)))
        out_ref[...] = v + it

    x = np.arange(L, dtype=np.int32).reshape(L, 1) % 17
    f = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((L, 1), jnp.int32))
    got = np.asarray(jax.jit(f)(x))
    want = (x % 17) - 16 + 16  # after 16 iters: x-16 + it(16)
    np.testing.assert_array_equal(got, want)
    return "while_loop(any) in-kernel"


# --- P4: fori + dynamic store at loop index -------------------------------
def p4():
    B = 16

    def kernel(x_ref, out_ref):
        x = x_ref[...]

        def body(b, carry):
            out_ref[b, :, :] = carry
            return carry + 1

        jax.lax.fori_loop(0, B, body, x)

    x = np.arange(L, dtype=np.int32).reshape(L, 1)
    f = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((B, L, 1), jnp.int32))
    got = np.asarray(jax.jit(f)(x))
    for b in range(B):
        np.testing.assert_array_equal(got[b], x + b)
    return "fori + dynamic store"


# --- P5: fused mini decode step, timed ------------------------------------
def p5(n_steps=512, reps=20):
    W = 512  # per-lane u32 words of chunk data

    def kernel(words_ref, tab_ref, out_ref):
        words = words_ref[...]  # [L, W] i32 (lane-private chunk rows)
        tab = tab_ref[...]      # [1, T] i32 packed (len | sym<<8)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (L, W), 1)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)

        def step(i, st):
            cur, cnt, wi, acc = st
            # refill: one word at per-lane word index. Mosaic has no
            # unsigned reductions: words arrive i32, select-reduce in
            # i32, bitcast only the [L, 1] result to u32.
            need = cnt < 32
            w = jax.lax.bitcast_convert_type(
                jnp.sum(jnp.where(iota_w == wi, words, 0), axis=1,
                        keepdims=True), jnp.uint32)
            # place fetched word below the current bits (32-bit window
            # halves; the real kernel carries a (hi, lo) pair)
            cur = jnp.where(need, cur | (w >> cnt.astype(jnp.uint32)), cur)
            cnt = jnp.where(need, cnt + 32 - (cnt & 7), cnt)  # mock
            wi = jnp.where(need, wi + 1, wi)
            # LUT gather on 11-bit peek
            peek = jax.lax.bitcast_convert_type(cur >> 21, jnp.int32)
            e = jnp.sum(jnp.where(iota_t == peek, tab, 0), axis=1,
                        keepdims=True)
            length = e & 0x1F
            val = (e >> 8) & 0xFF
            # consume `length` bits (vector shift)
            cur = (cur << length.astype(jnp.uint32)).astype(jnp.uint32)
            cnt = cnt - length
            acc = acc + val + i
            return cur, cnt, wi, acc

        cur0 = jax.lax.bitcast_convert_type(words[:, :1], jnp.uint32)
        cnt0 = jnp.full((L, 1), 32, jnp.int32)
        wi0 = jnp.ones((L, 1), jnp.int32)
        acc0 = jnp.zeros((L, 1), jnp.int32)
        _, _, _, acc = jax.lax.fori_loop(0, n_steps, step,
                                         (cur0, cnt0, wi0, acc0))
        out_ref[...] = acc

    rng = np.random.default_rng(3)
    words = rng.integers(0, 1 << 32, (L, W), dtype=np.uint64).astype(
        np.uint32).view(np.int32)
    tab = ((np.arange(T) % 13 + 2) | ((np.arange(T) % 251) << 8)).astype(
        np.int32)[None, :]
    f = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((L, 1), jnp.int32)))
    out = f(words, tab)
    out.block_until_ready()
    # chained timing (TPU-tunnel rules: D2H checksum forces completion)
    t0 = time.perf_counter()
    s = 0
    for _ in range(reps):
        s += int(np.asarray(f(words, tab))[0, 0])
    dt = (time.perf_counter() - t0) / reps
    per_step_us = dt / n_steps * 1e6
    return (f"{per_step_us:.2f} us/step in-kernel "
            f"({n_steps} steps, {L} lanes, checksum {s & 0xffff})")


def main():
    print("devices:", jax.devices())
    ok = {}
    ok["P1a select-reduce gather"] = report("P1a select-reduce gather", p1a)
    ok["P1b one-hot MXU gather"] = report("P1b one-hot MXU gather", p1b)
    ok["P2 vector shifts"] = report("P2 vector shifts", p2)
    ok["P3 while(any)"] = report("P3 while(any)", p3)
    ok["P4 fori+dyn store"] = report("P4 fori+dyn store", p4)
    ok["P5 fused step timing"] = report("P5 fused step timing", p5)
    print("SUMMARY:", {k: v for k, v in ok.items()})


if __name__ == "__main__":
    main()

"""P5 crash bisect round 2: combinations. (probe_inkernel2.py cleared
each construct individually.) Run as the only TPU process."""

import sys
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
    except Exception as e:  # noqa: BLE001
        head = (str(e).splitlines() or [type(e).__name__])[0]
        print(f"{name}: FAIL {type(e).__name__}: {head[:200]}")
        if "--verbose" in sys.argv:
            traceback.print_exc()


def run(kernel, steps):
    words = np.random.default_rng(0).integers(
        0, 1 << 31, (L, W)).astype(np.int32)
    tab = ((np.arange(T) % 13 + 2) | ((np.arange(T) % 251) << 8)).astype(
        np.int32)[None, :]
    f = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((L, 1), jnp.int32)))
    return int(np.asarray(f(words, tab))[0, 0])


def make(n_steps, gated_refill, safe_shift):
    def kernel(words_ref, tab_ref, out_ref):
        words = words_ref[...]
        tab = tab_ref[...]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (L, W), 1)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)

        def step(i, st):
            cur, cnt, wi, acc = st
            need = cnt < 32
            w = jax.lax.bitcast_convert_type(
                jnp.sum(jnp.where(iota_w == wi, words, 0), axis=1,
                        keepdims=True), jnp.uint32)
            if safe_shift:
                sh = jnp.minimum(cnt, 31).astype(jnp.uint32)
            else:
                sh = cnt.astype(jnp.uint32)
            if gated_refill:
                cur = jnp.where(need, cur | (w >> sh), cur)
                cnt = jnp.where(need, cnt + 24, cnt)
                wi = jnp.where(need, wi + 1, wi)
            else:
                cur = cur | (w >> sh)
                cnt = cnt + 1
                wi = (wi + 1) % W
            peek = jax.lax.bitcast_convert_type(cur >> 21, jnp.int32)
            e = jnp.sum(jnp.where(iota_t == peek, tab, 0), axis=1,
                        keepdims=True)
            length = e & 0x1F
            cur = (cur << length.astype(jnp.uint32)).astype(jnp.uint32)
            cnt = cnt - length
            acc = acc + (e >> 8) + i
            return cur, cnt, wi, acc

        cur0 = jax.lax.bitcast_convert_type(words[:, :1], jnp.uint32)
        cnt0 = jnp.full((L, 1), 16, jnp.int32)
        wi0 = jnp.ones((L, 1), jnp.int32)
        acc0 = jnp.zeros((L, 1), jnp.int32)
        _, _, _, acc = jax.lax.fori_loop(0, n_steps, step,
                                         (cur0, cnt0, wi0, acc0))
        out_ref[...] = acc
    return kernel


def make2(n_steps, gate_cur_in_i32, gate_cnt_only):
    """Isolate WHICH where() crashes: u32-typed select vs i32."""
    def kernel(words_ref, tab_ref, out_ref):
        words = words_ref[...]
        tab = tab_ref[...]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (L, W), 1)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)
        bc_i = lambda v: jax.lax.bitcast_convert_type(v, jnp.int32)  # noqa: E731
        bc_u = lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32)  # noqa: E731

        def step(i, st):
            cur, cnt, wi, acc = st
            need = cnt < 32
            w = bc_u(jnp.sum(jnp.where(iota_w == wi, words, 0), axis=1,
                             keepdims=True))
            sh = jnp.minimum(cnt, 31).astype(jnp.uint32)
            if gate_cnt_only:
                cur = cur | (w >> sh)
            elif gate_cur_in_i32:
                cur = bc_u(jnp.where(need, bc_i(cur | (w >> sh)),
                                     bc_i(cur)))
            else:
                cur = jnp.where(need, cur | (w >> sh), cur)
            cnt = jnp.where(need, cnt + 24, cnt)
            wi = jnp.where(need, wi + 1, wi)
            peek = bc_i(cur >> 21)
            e = jnp.sum(jnp.where(iota_t == peek, tab, 0), axis=1,
                        keepdims=True)
            length = e & 0x1F
            cur = (cur << length.astype(jnp.uint32)).astype(jnp.uint32)
            cnt = cnt - length
            acc = acc + (e >> 8) + i
            return cur, cnt, wi, acc

        cur0 = jax.lax.bitcast_convert_type(words[:, :1], jnp.uint32)
        cnt0 = jnp.full((L, 1), 16, jnp.int32)
        wi0 = jnp.ones((L, 1), jnp.int32)
        acc0 = jnp.zeros((L, 1), jnp.int32)
        _, _, _, acc = jax.lax.fori_loop(0, n_steps, step,
                                         (cur0, cnt0, wi0, acc0))
        out_ref[...] = acc
    return kernel


def make3(n_steps, mode):
    """mode: 'where_cnt' = E + a single jnp.where on cnt;
    'arith' = all gating via arithmetic select (no jnp.where on carries);
    'where_nogather' = wheres on carries but NO [L,W] word gather."""
    def kernel(words_ref, tab_ref, out_ref):
        words = words_ref[...]
        tab = tab_ref[...]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (L, W), 1)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)
        bc_i = lambda v: jax.lax.bitcast_convert_type(v, jnp.int32)  # noqa: E731
        bc_u = lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32)  # noqa: E731

        def step(i, st):
            cur, cnt, wi, acc = st
            need = cnt < 32
            if mode == "where_nogather":
                w = bc_u(wi * 2654435761)
            else:
                w = bc_u(jnp.sum(jnp.where(iota_w == wi, words, 0), axis=1,
                                 keepdims=True))
            sh = jnp.minimum(cnt, 31).astype(jnp.uint32)
            if mode == "arith":
                g = need.astype(jnp.int32)
                cur = bc_u(bc_i(cur) + g * (bc_i(cur | (w >> sh)) -
                                            bc_i(cur)))
                cnt = cnt + g * 24
                wi = wi + g
            elif mode == "where_cnt":
                cur = cur | (w >> sh)
                cnt = jnp.where(need, cnt + 24, cnt + 1)
                wi = (wi + 1) % W
            else:  # where_nogather
                cur = jnp.where(need, cur | (w >> sh), cur)
                cnt = jnp.where(need, cnt + 24, cnt)
                wi = jnp.where(need, wi + 1, wi)
            peek = bc_i(cur >> 21)
            e = jnp.sum(jnp.where(iota_t == peek, tab, 0), axis=1,
                        keepdims=True)
            length = e & 0x1F
            cur = (cur << length.astype(jnp.uint32)).astype(jnp.uint32)
            cnt = cnt - length
            acc = acc + (e >> 8) + i
            return cur, cnt, wi, acc

        cur0 = jax.lax.bitcast_convert_type(words[:, :1], jnp.uint32)
        cnt0 = jnp.full((L, 1), 16, jnp.int32)
        wi0 = jnp.ones((L, 1), jnp.int32)
        acc0 = jnp.zeros((L, 1), jnp.int32)
        _, _, _, acc = jax.lax.fori_loop(0, n_steps, step,
                                         (cur0, cnt0, wi0, acc0))
        out_ref[...] = acc
    return kernel


def main():
    print("devices:", jax.devices())
    report("I1 E + where on cnt", lambda: run(make3(64, "where_cnt"), 64))
    report("I2 all-arith gating", lambda: run(make3(64, "arith"), 64))
    report("I3 wheres, no word gather",
           lambda: run(make3(64, "where_nogather"), 64))
    report("I2-512 arith at 512", lambda: run(make3(512, "arith"), 512))


if __name__ == "__main__":
    main()

"""P5 crash bisect round 3: pinpoint the gated-update formulation Mosaic
accepts. Hypotheses from rounds 1-2: identity-else `where(p, f(x), x)` on
a fori carry crashes; purely additive gating may not. Run as the only
TPU process."""

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
    except Exception as e:  # noqa: BLE001
        head = (str(e).splitlines() or [type(e).__name__])[0]
        print(f"{name}: FAIL {type(e).__name__}: {head[:200]}")
        if "--verbose" in sys.argv:
            traceback.print_exc()


def run(kernel, timed=False, n_steps=64, reps=10):
    words = np.random.default_rng(0).integers(
        0, 1 << 31, (L, W)).astype(np.int32)
    tab = ((np.arange(T) % 13 + 2) | ((np.arange(T) % 251) << 8)).astype(
        np.int32)[None, :]
    f = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((L, 1), jnp.int32)))
    out = int(np.asarray(f(words, tab))[0, 0])
    if not timed:
        return out
    t0 = time.perf_counter()
    s = 0
    for _ in range(reps):
        s += int(np.asarray(f(words, tab))[0, 0])
    dt = (time.perf_counter() - t0) / reps
    return f"{dt / n_steps * 1e6:.2f} us/step ({n_steps} steps, checksum {s & 0xffff})"


def make(n_steps, style, timed=False):
    """style: 'additive' = x + where(p, d, 0); 'identity_cnt' = the
    identity-else where on cnt only; 'bool_astype' = additive via
    p.astype(i32) * d."""
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
            fill = w >> sh
            if style == "additive":
                cur = cur | bc_u(jnp.where(need, bc_i(fill), 0))
                cnt = cnt + jnp.where(need, 24, 0)
                wi = wi + jnp.where(need, 1, 0)
            elif style == "bool_astype":
                g = need.astype(jnp.int32)
                cur = cur | bc_u(g * bc_i(fill))
                cnt = cnt + g * 24
                wi = wi + g
            else:  # identity_cnt
                cur = cur | fill
                cnt = jnp.where(need, cnt + 24, cnt)
                wi = wi + 1
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
    report("K1 additive where(p,d,0) gating",
           lambda: run(make(64, "additive")))
    report("K2 bool.astype multiplicative gating",
           lambda: run(make(64, "bool_astype")))
    report("K3 identity-else where on cnt only",
           lambda: run(make(64, "identity_cnt")))
    report("K1-512 additive, 512 steps, timed",
           lambda: run(make(512, "additive"), timed=True, n_steps=512))


if __name__ == "__main__":
    main()

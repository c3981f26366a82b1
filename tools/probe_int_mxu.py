"""Integer-MXU probe for the islow-style fixed-point IDCT alternative
(VERDICT r3 weak #6: the exact-tier ~2200 fps ceiling rests on one
rejected fusion's pass accounting; this measures the other named
formulation's primitive costs).

The exact tier's IDCT matmuls run f32 at HIGHEST (6-pass bf16). An
int16 islow-style IDCT needs int16 x int16 -> int32 dots (13-bit basis
constants + 32-bit accumulation, two 1-D passes with a rounding shift
between). This probe times, at pipeline-like shapes on the real chip:

  f32 HIGHEST dot   (the current exact tier's primitive)
  f32 DEFAULT dot   (the approx tier's primitive, 1-pass bf16)
  int8 dot -> i32   (native MXU int path)
  int16 dot -> i32  (what islow actually needs)

Methodology (hard-won — see the r4 measurement session):
  * `block_until_ready` LIES through the axon tunnel (bench.py:457);
    completion must be forced by a scalar D2H read (`float(out)`).
  * Repeated identical (fn, args) remote executions can return in ~0 s,
    so each measurement is a dependency-chained `x = dot(x, B)` loop
    (square B) whose step input IS the previous output — nothing to
    hoist, dedupe, or cache.
  * The per-dispatch tunnel latency varies by tens of ms; differential
    timing (chains of N and 3N dots) cancels it.
  * The int path's loop feedback must be cheap bitwise ops, not `%`
    (VPU modulo costs more than the dot at these shapes and inverted an
    earlier conclusion).

Measured 2026-08-18 (TPU v5 lite, M=2048 K=128 square-B chain):

  f32 HIGHEST : 2.450 us/dot  (13.7 Tmac/s)
  f32 DEFAULT : 0.643 us/dot  (52.2 Tmac/s)   0.26x of HIGHEST
  int8 -> i32 : 0.275 us/dot  (122.0 Tmac/s)  0.11x of HIGHEST
  int16 -> i32: 1.569 us/dot  (21.4 Tmac/s)   0.64x of HIGHEST

Verdict: the int16 islow IDCT pays TWO 1-D passes (plus a rounding
shift between) at 0.64x each = ~1.28x of the current ONE fused HIGHEST
sandwich per plane-pass — it LOSES before accounting for the extra
shift/clamp VPU work. int8 is the only primitive that beats HIGHEST,
and 8 bits cannot carry dequantized DCT coefficients (±2047 x quant)
or 13-bit islow basis constants without a hi/lo split (4 dots = 1.1 us
— still loses to DEFAULT's 0.64 for tolerant pipelines and is not
bit-exact vs the f32 compat spec for exact mode).

Run as the only TPU process.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

M, K = 2048, 128  # one band x column-tile of sandwich work; B is square so
# the timing chain x = dot(x, B) preserves shape (see bench())


def make(dot, a, b, chain):
    @jax.jit
    def chained(a, b):
        def step(i, x):
            out = dot(x, b)
            if jnp.issubdtype(a.dtype, jnp.integer):
                # cheap bitwise feedback: keeps values in [-3, 3] without
                # a VPU modulo polluting the dot timing
                return ((out & 7) - 3).astype(a.dtype)
            return jnp.clip(out, -3.0, 3.0)

        x = jax.lax.fori_loop(0, chain, step, a)
        return x.astype(jnp.float32).sum()

    return chained


def _timed(fn, a, b):
    t0 = time.perf_counter()
    float(fn(a, b))  # scalar D2H forces real completion through the tunnel
    return time.perf_counter() - t0


def measure(name, dot, a, b, chain=8192):
    try:
        f1, f3 = make(dot, a, b, chain), make(dot, a, b, 3 * chain)
        float(f1(a, b))
        float(f3(a, b))  # compile + warm both
        t1 = min(_timed(f1, a, b) for _ in range(4))
        t3 = min(_timed(f3, a, b) for _ in range(4))
        dt = max(t3 - t1, 1e-9) / (2 * chain)
        print(f"{name}: {dt*1e6:.3f} us/dot  ({M*K*K/dt/1e12:.2f} Tmac/s)  "
              f"[t1={t1:.3f}s t3={t3:.3f}s]")
        return dt
    except Exception as e:  # noqa: BLE001
        head = (str(e).splitlines() or [type(e).__name__])[0]
        print(f"{name}: FAIL {type(e).__name__}: {head[:200]}")
        return None


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    af = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    bf = jnp.asarray(rng.standard_normal((K, K)).astype(np.float32))
    a8 = jnp.asarray(rng.integers(-3, 4, (M, K)).astype(np.int8))
    b8 = jnp.asarray(rng.integers(-3, 4, (K, K)).astype(np.int8))
    a16 = jnp.asarray(rng.integers(-3, 4, (M, K)).astype(np.int16))
    b16 = jnp.asarray(rng.integers(-3, 4, (K, K)).astype(np.int16))

    t_hi = measure("f32 HIGHEST", jax.jit(lambda x, b: jax.lax.dot(
        x, b, precision=jax.lax.Precision.HIGHEST)), af, bf)
    t_de = measure("f32 DEFAULT", jax.jit(lambda x, b: jax.lax.dot(
        x, b, precision=jax.lax.Precision.DEFAULT)), af, bf)
    t_i8 = measure("int8->i32", jax.jit(lambda x, b: jax.lax.dot(
        x, b, preferred_element_type=jnp.int32)), a8, b8)
    t_i16 = measure("int16->i32", jax.jit(lambda x, b: jax.lax.dot(
        x, b, preferred_element_type=jnp.int32)), a16, b16)
    if t_hi and t_i16:
        print(f"islow-relevant ratio: int16 dot = {t_i16/t_hi:.2f}x of "
              f"f32 HIGHEST (needs < 0.5x to win: islow pays TWO passes "
              f"with a rounding shift between)")
    if t_hi and t_de:
        print(f"approx headroom: DEFAULT = {t_de/t_hi:.2f}x of HIGHEST")
    if t_hi and t_i8:
        print(f"int8 = {t_i8/t_hi:.2f}x of HIGHEST (one-hot gather fodder)")


if __name__ == "__main__":
    main()

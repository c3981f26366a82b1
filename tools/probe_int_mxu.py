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
  int8 dot -> i32   (native MXU int path, if it lowers)
  int16 dot -> i32  (what islow actually needs, if it lowers)

Run as the only TPU process.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

M, K, N = 2048, 128, 256  # one band x column-tile worth of sandwich work


def bench(name, fn, *args, reps=30):
    try:
        out = fn(*args)
        out.block_until_ready()
        t0 = time.perf_counter()
        s = 0
        for _ in range(reps):
            s += int(np.asarray(fn(*args))[0, 0])
        dt = (time.perf_counter() - t0) / reps
        macs = M * K * N
        print(f"{name}: {dt*1e6:.1f} us  ({macs/dt/1e12:.2f} Tmac/s, "
              f"chk {s & 0xffff})")
        return dt
    except Exception as e:  # noqa: BLE001
        head = (str(e).splitlines() or [type(e).__name__])[0]
        print(f"{name}: FAIL {type(e).__name__}: {head[:200]}")
        return None


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    af = rng.standard_normal((M, K)).astype(np.float32)
    bf = rng.standard_normal((K, N)).astype(np.float32)
    a8 = rng.integers(-127, 128, (M, K)).astype(np.int8)
    b8 = rng.integers(-127, 128, (K, N)).astype(np.int8)
    a16 = rng.integers(-(1 << 12), 1 << 12, (M, K)).astype(np.int16)
    b16 = rng.integers(-(1 << 12), 1 << 12, (K, N)).astype(np.int16)

    t_hi = bench("f32 HIGHEST", jax.jit(lambda a, b: jax.lax.dot(
        a, b, precision=jax.lax.Precision.HIGHEST)), af, bf)
    t_de = bench("f32 DEFAULT", jax.jit(lambda a, b: jax.lax.dot(
        a, b, precision=jax.lax.Precision.DEFAULT)), af, bf)
    t_i8 = bench("int8->i32", jax.jit(lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.int32)), a8, b8)
    t_i16 = bench("int16->i32", jax.jit(lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.int32)), a16, b16)
    if t_hi and t_i16:
        print(f"islow-relevant ratio: int16 dot = {t_i16/t_hi:.2f}x of "
              f"f32 HIGHEST (needs < 0.5x to win: islow pays TWO passes "
              f"with a rounding shift between)")
    if t_hi and t_de:
        print(f"approx headroom: DEFAULT = {t_de/t_hi:.2f}x of HIGHEST")


if __name__ == "__main__":
    main()

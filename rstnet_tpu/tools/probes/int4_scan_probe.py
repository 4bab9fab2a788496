"""int4 probe 2: bandwidth regime. Scan over L stacked [OUT, IN] weights in
ONE jit (like the decode layer loop), batch-1 activations. Total weight
bytes: bf16 1.07GB / int8 537MB / int4 268MB at L=16.

Measured 2026-08-20 (v5e via axon): bf16 2.09 ms (257 GB/s), int8
1.64 ms (164 GB/s effective on half the bytes), int4-packed 2.66 ms
(51 GB/s) — the in-jit nibble unpack defeats XLA's dot-operand fusion
and materializes the dequantized planes, making int4 SLOWER than
uncompressed bf16. Verdict: int8 is the quantized serving floor on this
backend (ARCHITECTURE.md "Measured-and-rejected (round 5)")."""
import time
import jax
import jax.numpy as jnp
import numpy as np

L, OUT, IN = 16, 8192, 2048
G = 128


def timeit(f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    np.asarray(out.astype(jnp.float32))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        np.asarray(out.astype(jnp.float32))
        reps.append((time.perf_counter() - t0) / n * 1e3)
    return min(reps)


@jax.jit
def f_bf16(a, ws):
    def body(x, w):
        y = (x @ w.T)[:, :IN]  # keep shape constant across scan steps
        return y, ()
    y, _ = jax.lax.scan(body, a, ws)
    return y


@jax.jit
def f_int8(a, w8s, s8s):
    def body(x, wv):
        w8, s = wv
        w = w8.astype(jnp.bfloat16) * s[:, None].astype(jnp.bfloat16)
        return (x @ w.T)[:, :IN], ()
    y, _ = jax.lax.scan(body, a, (w8s, s8s))
    return y


@jax.jit
def f_int4(a, packed, se, so):
    def body(x, wv):
        p, sev, sov = wv
        def plane(codes, s):
            g = codes.reshape(OUT, -1, G // 2)
            return (g * s[..., None].astype(jnp.bfloat16)).reshape(OUT, IN // 2)
        we = plane(((p << 4).astype(jnp.int8) >> 4).astype(jnp.bfloat16), sev)
        wo = plane((p >> 4).astype(jnp.bfloat16), sov)
        y = x[:, 0::2] @ we.T + x[:, 1::2] @ wo.T
        return y[:, :IN], ()
    y, _ = jax.lax.scan(body, a, (packed, se, so))
    return y


def main():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((L, OUT, IN)) * 0.02).astype(np.float32)
    a = jax.device_put(rng.standard_normal((1, IN)).astype(np.float32)).astype(jnp.bfloat16)

    wb = jax.device_put(w).astype(jnp.bfloat16)
    s8 = np.maximum(np.abs(w).max(-1) / 127.0, 1e-8)
    w8 = jax.device_put(np.clip(np.round(w / s8[..., None]), -127, 127).astype(np.int8))
    s8 = jax.device_put(s8.astype(np.float32))

    we_, wo_ = w[..., 0::2], w[..., 1::2]
    def q(wp):
        g = wp.reshape(L, OUT, -1, G // 2)
        s = np.maximum(np.abs(g).max(-1) / 7.0, 1e-8)
        return np.clip(np.round(g / s[..., None]), -8, 7).astype(np.int8).reshape(L, OUT, -1), s.astype(np.float32)
    qe, se = q(we_)
    qo, so = q(wo_)
    packed = jax.device_put((((qo & 0xF) << 4) | (qe & 0xF)).astype(np.int8))
    se, so = jax.device_put(se), jax.device_put(so)

    t_b = timeit(f_bf16, a, wb)
    t_8 = timeit(f_int8, a, w8, s8)
    t_4 = timeit(f_int4, a, packed, se, so)
    gb = L * OUT * IN
    print(f"L={L} scan: bf16 {t_b:.3f} ms ({gb*2/t_b/1e6:.0f} GB/s)  "
          f"int8 {t_8:.3f} ms ({gb/t_8/1e6:.0f} GB/s)  "
          f"int4 {t_4:.3f} ms ({gb/2/t_4/1e6:.0f} GB/s)")


if __name__ == "__main__":
    main()

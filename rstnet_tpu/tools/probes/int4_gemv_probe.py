"""Go/no-go microbench: batch-1 GEMV with bf16 vs int8-dequant vs
nibble-packed int4-dequant weights on the TPU. The int4 scheme stores two
4-bit planes (even/odd input columns) packed into one int8 byte; unpack +
per-group dequant happen inside the jit, so only half the weight bytes
cross HBM.

Measured 2026-08-20 (v5e via axon): a single 8192x2048 GEMV is
dispatch-bound (~0.56 ms for bf16/int8/int4 alike), so this probe alone
cannot rank them — see int4_scan_probe.py for the bandwidth-regime
verdict. Also measured here: rel-err int8 0.012 vs int4 0.128 (group
128), and jnp.int4 arrays cannot cross a jit boundary on this backend
(RecursionError in the axon arg-sharding path), which is why the packed
int8 carrier exists at all. Conclusion recorded in ARCHITECTURE.md
"Measured-and-rejected (round 5)"."""
import time
import jax
import jax.numpy as jnp
import numpy as np

OUT, IN = 8192, 2048  # one big decode linear (e.g. fc 2048->8192)
G = 128  # quant group size along IN


def pack_int4(w: np.ndarray):
    """w [OUT, IN] float -> planes packed [OUT, IN//2] int8 + scales."""
    we, wo = w[:, 0::2], w[:, 1::2]  # [OUT, IN/2] each

    def q(wp):
        g = wp.reshape(OUT, -1, G // 2)  # groups of G/2 per plane = G per pair
        s = np.maximum(np.abs(g).max(-1) / 7.0, 1e-8)  # [OUT, IN/2/(G/2)]
        q = np.clip(np.round(g / s[..., None]), -8, 7).astype(np.int8)
        return q.reshape(OUT, -1), s.astype(np.float32)

    qe, se = q(we)
    qo, so = q(wo)
    packed = ((qo & 0xF) << 4) | (qe & 0xF)  # one byte per (even, odd) pair
    return packed.astype(np.int8), se, so


def unpack_plane(packed, hi: bool):
    if hi:
        return (packed.astype(jnp.int8) >> 4).astype(jnp.bfloat16)
    # sign-extend the low nibble: shift up then arithmetic shift down
    return ((packed << 4).astype(jnp.int8) >> 4).astype(jnp.bfloat16)


def deq(plane_bf16, s):
    g = plane_bf16.reshape(OUT, -1, G // 2)
    return (g * s[..., None].astype(jnp.bfloat16)).reshape(OUT, -1)


@jax.jit
def f_bf16(a, w):
    return a @ w.T


@jax.jit
def f_int8(a, w8, s):
    w = w8.astype(jnp.bfloat16) * s[:, None].astype(jnp.bfloat16)
    return a @ w.T


@jax.jit
def f_int4(a, packed, se, so):
    we = deq(unpack_plane(packed, False), se)
    wo = deq(unpack_plane(packed, True), so)
    return a[:, 0::2] @ we.T + a[:, 1::2] @ wo.T


def timeit(f, *args, n=60):
    out = f(*args)
    np.asarray(out.astype(jnp.float32))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        np.asarray(out.astype(jnp.float32))
        reps.append((time.perf_counter() - t0) / n * 1e3)
    return min(reps)


def main():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((OUT, IN)) * 0.02).astype(np.float32)
    a_np = rng.standard_normal((1, IN)).astype(np.float32)

    a = jax.device_put(a_np).astype(jnp.bfloat16)
    wb = jax.device_put(w).astype(jnp.bfloat16)
    s8 = np.maximum(np.abs(w).max(-1) / 127.0, 1e-8)
    w8 = jax.device_put(np.clip(np.round(w / s8[:, None]), -127, 127).astype(np.int8))
    s8 = jax.device_put(s8.astype(np.float32))
    packed, se, so = pack_int4(w)
    packed, se, so = map(jax.device_put, (packed, se, so))

    # numerics sanity
    ref = a_np @ w.T
    got4 = np.asarray(f_int4(a, packed, se, so).astype(jnp.float32))
    got8 = np.asarray(f_int8(a, w8, s8).astype(jnp.float32))
    err4 = np.abs(got4 - ref).max() / (np.abs(ref).max() + 1e-9)
    err8 = np.abs(got8 - ref).max() / (np.abs(ref).max() + 1e-9)
    print("rel err int8:", round(float(err8), 4), "int4:", round(float(err4), 4))

    t_b = timeit(f_bf16, a, wb)
    t_8 = timeit(f_int8, a, w8, s8)
    t_4 = timeit(f_int4, a, packed, se, so)
    print(f"bf16 {t_b:.4f} ms  int8 {t_8:.4f} ms  int4-packed {t_4:.4f} ms")
    print(f"bytes: bf16 {OUT*IN*2/1e6:.1f}MB int8 {OUT*IN/1e6:.1f}MB "
          f"int4 {OUT*IN/2/1e6:.1f}MB")


if __name__ == "__main__":
    main()

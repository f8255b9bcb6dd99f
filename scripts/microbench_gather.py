"""Micro-benchmark TPU gather formulations to pick window/seed-hit layouts.

Times, for the align program's two hot gathers (windows: 49152 x 132 bytes
at arbitrary byte offsets; seed hits: 262144 x 8 int32 at arbitrary
offsets), every viable formulation:
  - elementwise flat gather arr[idx]
  - word gather (int32 words + byte-phase select)
  - row gather (reshape to [*, Wrow] rows + in-register phase selects)
plus a raw cost curve: row-gather time vs row width at fixed index count.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def t(f, *a, n=5):
    r = f(*a)
    jax.block_until_ready(r)
    ts = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - ts) / n


def main():
    rng = np.random.default_rng(0)
    G = 4_600_000 + 16384
    g8 = rng.integers(0, 4, G).astype(np.int8)
    g8_d = jnp.asarray(g8)
    gw = (g8[0::4].astype(np.int32) | (g8[1::4].astype(np.int32) << 8)
          | (g8[2::4].astype(np.int32) << 16)
          | (g8[3::4].astype(np.int32) << 24))
    gw_d = jnp.asarray(gw)

    B, WL = 49152, 132
    lo = jnp.asarray(rng.integers(0, G - 4096, B).astype(np.int32))

    @jax.jit
    def ew_bytes(g, lo):
        return g[lo[:, None] + jnp.arange(WL, dtype=jnp.int32)]

    @jax.jit
    def word_trick(w, lo):
        NW = WL // 4 + 2
        base = lo >> 2
        ph = lo & 3
        ww = w[base[:, None] + jnp.arange(NW, dtype=jnp.int32)]
        by = jnp.stack([ww & 0xFF, (ww >> 8) & 0xFF, (ww >> 16) & 0xFF,
                        (ww >> 24) & 0xFF], axis=-1).reshape(B, 4 * NW)
        out = by[:, 0:WL]
        for s in (1, 2, 3):
            out = jnp.where((ph == s)[:, None], by[:, s:s + WL], out)
        return out.astype(jnp.int8)

    @jax.jit
    def row32_trick(w, lo):
        # rows of 8 int32 = 32 bytes
        w2 = w[: (w.shape[0] // 8) * 8].reshape(-1, 8)
        base = lo >> 5
        NR = WL // 32 + 2   # 6
        rows = w2[base[:, None] + jnp.arange(NR, dtype=jnp.int32)]  # [B,NR,8]
        ww = rows.reshape(B, NR * 8)
        sw = (lo >> 2) & 7
        NW = WL // 4 + 2
        out_w = ww[:, 0:NW]
        for s in range(1, 8):
            out_w = jnp.where((sw == s)[:, None], ww[:, s:s + NW], out_w)
        by = jnp.stack([out_w & 0xFF, (out_w >> 8) & 0xFF,
                        (out_w >> 16) & 0xFF,
                        (out_w >> 24) & 0xFF], axis=-1).reshape(B, 4 * NW)
        ph = lo & 3
        out = by[:, 0:WL]
        for s in (1, 2, 3):
            out = jnp.where((ph == s)[:, None], by[:, s:s + WL], out)
        return out.astype(jnp.int8)

    ref = np.asarray(jax.jit(ew_bytes)(g8_d, lo))
    for name, fn, arr in (("windows elementwise int8", ew_bytes, g8_d),
                          ("windows word-gather", word_trick, gw_d),
                          ("windows row32-gather", row32_trick, gw_d)):
        dt = t(fn, arr, lo)
        out = np.asarray(fn(arr, lo))
        okmark = "OK" if np.array_equal(out, ref) else "MISMATCH"
        print(f"{name}: {dt*1e3:6.1f} ms  [{okmark}]", flush=True)

    # seed-hit gather: 262144 x 8 int32
    M = 4_600_000
    pf = jnp.asarray(rng.integers(0, 2**30, M).astype(np.int32))
    lo2 = jnp.asarray(rng.integers(0, M - 64, 262144).astype(np.int32))

    @jax.jit
    def pf_ew(p, lo):
        return p[lo[:, None] + jnp.arange(8, dtype=jnp.int32)]

    @jax.jit
    def pf_rows2(p, lo):
        p2 = p[: (M // 2) * 2].reshape(-1, 2)
        rows = p2[(lo >> 1)[:, None] + jnp.arange(5, dtype=jnp.int32)]
        flat = rows.reshape(-1, 10)
        return jnp.where((lo & 1)[:, None] == 1, flat[:, 1:9], flat[:, 0:8])

    @jax.jit
    def pf_rows8(p, lo):
        p2 = p[: (M // 8) * 8].reshape(-1, 8)
        rows = p2[(lo >> 3)[:, None] + jnp.arange(2, dtype=jnp.int32)]
        flat = rows.reshape(-1, 16)
        ph = lo & 7
        out = flat[:, 0:8]
        for s in range(1, 8):
            out = jnp.where((ph == s)[:, None], flat[:, s:s + 8], out)
        return out

    ref2 = np.asarray(pf_ew(pf, lo2))
    for name, fn in (("pf elementwise 8xint32", pf_ew),
                     ("pf rows-of-2", pf_rows2),
                     ("pf rows-of-8", pf_rows8)):
        dt = t(fn, pf, lo2)
        out = np.asarray(fn(pf, lo2))
        okmark = "OK" if np.array_equal(out, ref2) else "MISMATCH"
        print(f"{name}: {dt*1e3:6.1f} ms  [{okmark}]", flush=True)

    # binary-probe cost: 10 dependent single-element gathers [262144]
    ks = jnp.asarray(np.sort(rng.integers(0, 2**30, M).astype(np.int32)))

    @jax.jit
    def probes(k, lo):
        x = lo
        for _ in range(10):
            x = (x + k[jnp.clip(x, 0, M - 1)] % 7) % (M - 1)
        return x

    print(f"10 dependent probe gathers [262144]: "
          f"{t(probes, ks, lo2)*1e3:6.1f} ms", flush=True)

    # raw row-gather cost vs width (300k indices)
    NI = 294912
    idxr = jnp.asarray(rng.integers(0, 10000, NI).astype(np.int32))
    for wrow in (1, 2, 4, 8, 16, 32):
        arr = jnp.asarray(
            rng.integers(0, 100, (16384, wrow)).astype(np.int32))

        @partial(jax.jit, static_argnums=())
        def rowg(a, i):
            return a[i]

        dt = t(rowg, arr, idxr % 16384)
        print(f"row gather width {wrow:3d} int32 x {NI}: {dt*1e3:6.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()

"""Probe: does XLA:TPU hit the int8 MXU path, and does it help convs?

Rep-delta timings (RTT cancels). The op input is chained through the scan
carry (progressively rolled) so XLA cannot hoist the loop-invariant op.
Compares bf16 vs int8 (int32 accum) on:
  1. a big square matmul (pure MXU ceiling check)
  2. a ResNet stage3-shaped conv batch (3x3, 256ch, 14x14, batch 608)
  3. a YOLO backbone-shaped conv (3x3, 320ch, 28x28, batch 128)

Measured (single v5e via axon, 2026-08, jax 0.9 nightly):
  matmul 8192^3      bf16 183 T/s   int8 281 T/s  (1.53x — int8 MXU real)
  conv stage3-shape  bf16 0.35 ms   int8 0.24 ms
  conv yolo-shape    bf16 1.02 ms   int8 1.03 ms  (no win — XLA:TPU does
                                    not route convs to the int8 MXU path)
Conclusion in docs/performance.md (int8 backbone quantization rejected:
the conv op gains nothing; conv-as-im2col-dot would cap at 1.53x before
quantization overhead and fidelity loss).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def _measure(fn, *args, k=3, iters=3):
    _sync(fn(*args))
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(k):
            _sync(fn(*args))
        dt = (time.perf_counter() - t0) / k
        best = dt if best is None else min(best, dt)
    return best


def delta(build, args, n2=4):
    j1 = jax.jit(lambda *a: build(*a, 1))
    j2 = jax.jit(lambda *a: build(*a, n2))
    return (_measure(j2, *args) - _measure(j1, *args)) / (n2 - 1)


# ---- 1. big matmul ----
N = 8192
def mm(dtype):
    if dtype == jnp.int8:
        x = jnp.asarray(np.random.randint(-127, 127, (N, N)), jnp.int8)
        w = jnp.asarray(np.random.randint(-127, 127, (N, N)), jnp.int8)
        acc = jnp.int32
    else:
        x = jnp.asarray(np.random.randn(N, N), dtype)
        w = jnp.asarray(np.random.randn(N, N), dtype)
        acc = jnp.float32

    def build(x, w, n):
        def body(carry, _):
            xc, s = carry
            xr = jnp.roll(xc, 1, 0)
            y = jnp.dot(xr, w, preferred_element_type=acc)
            return (xr, s + y.astype(jnp.float32).sum()), ()
        (_, s), _ = lax.scan(body, (x, jnp.float32(0)), None, length=n)
        return s
    t = delta(build, (x, w))
    fl = 2 * N**3
    print(f"matmul {N}^3 {np.dtype(dtype).name:8}: {t*1e3:7.2f} ms  "
          f"{fl/t/1e12:6.1f} T/s", flush=True)

mm(jnp.bfloat16)
mm(jnp.int8)


# ---- 2/3. convs ----
def conv(name, b, h, w_, cin, cout, k, dtype):
    dn = lax.conv_dimension_numbers((b, h, w_, cin), (k, k, cin, cout),
                                    ("NHWC", "HWIO", "NHWC"))
    if dtype == jnp.int8:
        x = jnp.asarray(np.random.randint(-127, 127, (b, h, w_, cin)), jnp.int8)
        wt = jnp.asarray(np.random.randint(-127, 127, (k, k, cin, cout)), jnp.int8)
        acc = jnp.int32
    else:
        x = jnp.asarray(np.random.randn(b, h, w_, cin), dtype)
        wt = jnp.asarray(np.random.randn(k, k, cin, cout), dtype)
        acc = jnp.float32

    def build(x, wt, n):
        def body(carry, _):
            xc, s = carry
            xr = jnp.roll(xc, 1, 0)
            y = lax.conv_general_dilated(
                xr, wt, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=acc)
            return (xr, s + y.astype(jnp.float32).sum()), ()
        (_, s), _ = lax.scan(body, (x, jnp.float32(0)), None, length=n)
        return s
    t = delta(build, (x, wt))
    fl = 2 * b * h * w_ * cout * cin * k * k
    print(f"{name} {np.dtype(dtype).name:8}: {t*1e3:7.2f} ms  "
          f"{fl/t/1e12:6.1f} T/s", flush=True)

for d in (jnp.bfloat16, jnp.int8):
    conv("conv stage3 [608,14,14,256]x3x3->256", 608, 14, 14, 256, 256, 3, d)
for d in (jnp.bfloat16, jnp.int8):
    conv("conv yolo   [128,28,28,320]x3x3->320", 128, 28, 28, 320, 320, 3, d)

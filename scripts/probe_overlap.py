#!/usr/bin/env python3
"""Probe: does a readback issued BEFORE the next dispatch overlap with that
dispatch's device execution on the axon tunnel?

DECISIONS r3-007 measured that a readback issued AFTER dispatching frame
N+1 waits for N+1 too (in-order serialisation at issue time), which killed
the r2 dispatch-ahead pipeline.  The untested variant: issue the readback
of frame N (from a worker thread), THEN dispatch frame N+1 from the main
thread.  If readbacks only wait for programs queued at their own issue
time, the ~26 ms readback tax overlaps frame N+1's device time and the
serving loop's per-iteration cost drops from (device + tax) to
max(device, tax) + epsilon.

Run on the real chip (no JAX_PLATFORMS override), exclusively.
"""
import concurrent.futures
import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def step(x, w):
    def body(x, _):
        x = jnp.tanh(x @ w)
        return x, ()
    x, _ = jax.lax.scan(body, x, None, length=60)
    return x


def main():
    print("backend:", jax.default_backend())
    key = jax.random.key(0)
    x = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    w = jax.random.normal(key, (4096, 4096), jnp.bfloat16) * 0.01

    # compile + settle
    x1 = step(x, w)
    _ = np.asarray(x1[0, 0])
    t0 = time.perf_counter()
    x1 = step(x, w)
    _ = np.asarray(x1[0, 0])
    single = time.perf_counter() - t0
    print(f"single dispatch+readback: {single*1e3:.1f} ms")

    N = 20

    # --- serial: read fully before next dispatch
    cur = x
    t0 = time.perf_counter()
    for _ in range(N):
        cur = step(cur, w)
        _ = np.asarray(cur[0, 0])
    serial = (time.perf_counter() - t0) / N
    print(f"serial per-iter: {serial*1e3:.1f} ms")

    # --- overlap: issue read of N (worker thread), then dispatch N+1
    ex = concurrent.futures.ThreadPoolExecutor(1)
    cur = x
    dispatch_costs = []
    t0 = time.perf_counter()
    fut = None
    for i in range(N):
        nxt = step(cur, w)            # dispatch i
        f = ex.submit(np.asarray, nxt[0, 0])  # issue read of i
        # tiny pause so the worker thread actually enters device_get
        # before the next dispatch call goes down the tunnel
        time.sleep(0.001)
        if fut is not None:
            fut.result()              # await read of i-1
        fut = f
        cur = nxt
    fut.result()
    overlap = (time.perf_counter() - t0) / N
    print(f"overlap per-iter: {overlap*1e3:.1f} ms")

    # --- dispatch-while-reading cost: is the main-thread dispatch call
    # blocked while the worker thread sits in device_get?
    cur = x
    blocked = []
    for i in range(6):
        nxt = step(cur, w)
        f = ex.submit(np.asarray, nxt[0, 0])
        time.sleep(0.001)
        t1 = time.perf_counter()
        nxt2 = step(nxt, w)           # dispatch while read in flight
        blocked.append(time.perf_counter() - t1)
        f.result()
        _ = np.asarray(nxt2[0, 0])
        cur = nxt2
    print(f"dispatch-call wall while read in flight: "
          f"{[round(b*1e3,1) for b in blocked]} ms")

    print(f"VERDICT: overlap {'WINS' if overlap < serial * 0.85 else 'does not win'}"
          f" ({serial*1e3:.1f} -> {overlap*1e3:.1f} ms/iter)")


if __name__ == "__main__":
    main()

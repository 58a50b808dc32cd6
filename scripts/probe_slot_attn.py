#!/usr/bin/env python3
"""A/B the slot-wise int8 flash-decode kernel vs the dense int8 path.

Isolated attention microbench at the serving geometry (orpheus_3b: L=28,
B=8, KV=8, HD=128, H=24) over the position-major int8 cache: one jitted
program runs all 28 layers' decode attention (the per-step attention work
of the serving hot loop) for
  - the dense bucketed int8-MXU path (llama_decode_step's shipping einsum
    chain) at a static bucket, and
  - decode_attention_int8_slots (one grid program per slot, whole-slot
    (block_s, KV*HD) int8 DMA, in-register dequant).

Scenarios: uniform live length (the bench's 8x8k row) and MIXED lengths
(7 short streams + one 8k — the kernel's structural win: HBM traffic
follows live length, the dense path reads the full bucket per slot).

Timing per the axon-tunnel model (memory: block_until_ready does not
sync): chain N dispatches through a data dependence and end with ONE
device_get.  Also counts copy bytes in the compiled pallas program — a
cache-sized copy would mean the (L,B,S,KV,HD)->(L,B,S,KV*HD) operand
reshape failed to bitcast.

Usage: python scripts/probe_slot_attn.py [--impl both|dense|pallas]
       [--block-s 512] [--iters 10]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="both",
                    choices=["both", "dense", "pallas"])
    ap.add_argument("--block-s", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--seq", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from project_morpheus_tpu.model import LlamaConfig
    from project_morpheus_tpu.ops.decode_attention import (
        decode_attention_int8_slots,
    )

    cfg = LlamaConfig.orpheus_3b()
    L, KV, HD, H = (cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                    cfg.num_heads)
    B, S = 8, args.seq
    G = H // KV
    key = jax.random.key(0)

    # build ON DEVICE (h2d of GB-scale arrays is minutes-slow on the
    # tunnel, memory: axon-tunnel-performance-model)
    @jax.jit
    def build():
        k1, k2, k3, k4 = jax.random.split(key, 4)
        kc = jax.random.randint(k1, (L, B, S, KV, HD), -127, 128, jnp.int8)
        vc = jax.random.randint(k2, (L, B, S, KV, HD), -127, 128, jnp.int8)
        sc = jax.random.uniform(k3, (L, B, S, 2 * KV), jnp.float32,
                                0.005, 0.02)
        q0 = jax.random.normal(k4, (B, H, HD), jnp.float32)
        return kc, vc, sc, q0

    kc, vc, sc, q0 = build()
    jax.device_get(q0[0, 0, :1])  # sync build

    def dense_all_layers(q, lengths, bucket):
        """The shipping dense int8 attention chain, all L layers."""
        key_mask = jnp.arange(bucket)[None, :] <= lengths[:, None]

        def layer(i, acc):
            qg = q.reshape(B, KV, G, HD)
            k_s = lax.dynamic_slice(kc, (i, 0, 0, 0, 0),
                                    (1, B, bucket, KV, HD))[0]
            v_s = lax.dynamic_slice(vc, (i, 0, 0, 0, 0),
                                    (1, B, bucket, KV, HD))[0]
            sc_s = lax.dynamic_slice(sc, (i, 0, 0, 0),
                                     (1, B, bucket, 2 * KV))[0]
            ks_s = jnp.swapaxes(sc_s[..., :KV], 1, 2)
            vs_s = jnp.swapaxes(sc_s[..., KV:], 1, 2)
            qsc = jnp.maximum(
                jnp.max(jnp.abs(qg.astype(jnp.float32)), axis=-1), 1e-8
            ) / 127.0
            q8 = jnp.clip(
                jnp.round(qg.astype(jnp.float32) / qsc[..., None]),
                -127, 127,
            ).astype(jnp.int8)
            s32 = jnp.einsum("bkgd,bskd->bkgs", q8, k_s,
                             preferred_element_type=jnp.int32)
            scores = (s32.astype(jnp.float32) * qsc[..., None]
                      * ks_s[:, :, None, :] * (HD ** -0.5))
            scores = jnp.where(key_mask[:, None, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            pv = probs * vs_s[:, :, None, :]
            psc = jnp.maximum(jnp.max(pv, axis=-1), 1e-30) / 127.0
            p8 = jnp.clip(jnp.round(pv / psc[..., None]), -127, 127
                          ).astype(jnp.int8)
            o32 = jnp.einsum("bkgs,bskd->bkgd", p8, v_s,
                             preferred_element_type=jnp.int32)
            attn = (o32.astype(jnp.float32) * psc[..., None]
                    ).reshape(B, H, HD)
            return acc + attn

        return lax.fori_loop(0, L, layer, jnp.zeros((B, H, HD), jnp.float32))

    def pallas_all_layers(q, lengths):
        def layer(i, acc):
            attn = decode_attention_int8_slots(
                q, kc, vc, sc, lengths, i, block_s=args.block_s
            )
            return acc + attn

        return lax.fori_loop(0, L, layer, jnp.zeros((B, H, HD), jnp.float32))

    def bench(fn, *fargs, label):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(q0, *fargs)
        jax.device_get(out[0, 0, :1])
        compile_s = time.perf_counter() - t0
        # chain dispatches through a data dependence; one readback at end
        t0 = time.perf_counter()
        x = q0
        for _ in range(args.iters):
            x = jfn(x * 0.0 + q0, *fargs)
        jax.device_get(x[0, 0, :1])
        ms = (time.perf_counter() - t0) / args.iters * 1000.0
        lowered = jax.jit(fn).lower(q0, *fargs).compile()
        txt = lowered.as_text()
        import re

        copy_b = 0
        for mm in re.finditer(
            r"(\S+?)\[([0-9,]*)\][^=]*= (?:copy|copy-start)\(", txt
        ):
            dt, dims = mm.group(1), mm.group(2)
            sz = {"bf16": 2, "f32": 4, "s8": 1, "s32": 4, "pred": 1,
                  "u32": 4}.get(dt.split("{")[0], 2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            copy_b += n * sz
        print(json.dumps({
            "label": label, "ms_per_step_alllayers": round(ms, 3),
            "ms_per_layer": round(ms / L, 4),
            "compile_s": round(compile_s, 1),
            "hlo_copy_bytes": copy_b,
        }), flush=True)
        return ms

    uniform = jnp.full((B,), min(S - 192, 8000), jnp.int32)
    mixed = jnp.asarray([min(S - 192, 8000)] + [600] * (B - 1), jnp.int32)

    # roofline note: live bytes per step = sum(lengths)*(2*KV*HD + 8*KV)
    for lengths, name in ((uniform, "uniform8k"), (mixed, "mixed")):
        live = int(np.sum(np.asarray(lengths)))
        gb = live * (2 * KV * HD + 4 * 2 * KV) * L / 1e9
        print(json.dumps({"scenario": name, "live_positions": live,
                          "kv_read_GB_per_step": round(gb, 3),
                          "roofline_ms_at_819GBps": round(gb / 819 * 1e3,
                                                          3)}), flush=True)
        if args.impl in ("both", "dense"):
            bench(dense_all_layers, lengths, S, label=f"dense/{name}")
        if args.impl in ("both", "pallas"):
            bench(pallas_all_layers, lengths, label=f"pallas/{name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

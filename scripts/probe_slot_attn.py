#!/usr/bin/env python3
"""A/B the slot-wise int8 flash-decode kernel vs the dense int8 path.

Isolated SINGLE-LAYER attention microbench at the serving geometry
(orpheus_3b: B=8, KV=8, HD=128, H=24) over the position-major int8 cache.
One layer keeps the XLA compile tractable on the remote tunnel compiler
(a 28-layer fori_loop + pallas program at S=8192 blew a 10-minute compile
budget); per-step cost = per-layer x 28 since layers are identical.

Scenarios: uniform live length (the bench's 8x8k row) and MIXED lengths
(7 short streams + one 8k — the kernel's structural win: its HBM traffic
follows live length; the dense path reads the full bucket per slot).

Timing per the axon-tunnel model (block_until_ready does not sync):
chain N dispatches through a data dependence, end with ONE device_get.
Counts copy bytes in the compiled HLO — a cache-sized copy would mean
the (L,B,S,KV,HD)->(L,B,S,KV*HD) operand reshape failed to bitcast.

Usage: python scripts/probe_slot_attn.py [--impl both|dense|pallas]
       [--block-s 512] [--iters 20] [--seq 8192] [--layers 2]
"""
from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def copy_bytes(txt: str) -> int:
    total = 0
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
        total += n * sz
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="both",
                    choices=["both", "dense", "pallas"])
    ap.add_argument("--block-s", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--layers", type=int, default=2,
                    help="allocated cache layers (>=2 keeps the layer "
                    "index dynamic like serving)")
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
    KV, HD, H = cfg.num_kv_heads, cfg.head_dim, cfg.num_heads
    L, B, S = args.layers, 8, args.seq
    G = H // KV
    key = jax.random.key(0)

    @jax.jit
    def build():
        k1, k2, k3, k4 = jax.random.split(key, 4)
        kc = jax.random.randint(k1, (L, B, S, KV, HD), -127, 128, jnp.int8)
        vc = jax.random.randint(k2, (L, B, S, KV, HD), -127, 128, jnp.int8)
        sc = jax.random.uniform(k3, (L, B, S, 2 * KV), jnp.float32,
                                0.005, 0.02)
        q0 = jax.random.normal(k4, (B, H, HD), jnp.float32)
        return kc, vc, sc, q0

    t0 = time.perf_counter()
    kc, vc, sc, q0 = build()
    jax.device_get(q0[0, 0, :1])
    print(json.dumps({"built_s": round(time.perf_counter() - t0, 1),
                      "cache_gb": round(2 * L * B * S * KV * HD / 1e9, 2)}),
          flush=True)

    def dense_layer(q, lengths, layer, kc, vc, sc):
        """The shipping dense int8 attention chain, one layer, bucket=S."""
        key_mask = jnp.arange(S)[None, :] <= lengths[:, None]
        qg = q.reshape(B, KV, G, HD)
        k_s = lax.dynamic_index_in_dim(kc, layer, 0, keepdims=False)
        v_s = lax.dynamic_index_in_dim(vc, layer, 0, keepdims=False)
        sc_s = lax.dynamic_index_in_dim(sc, layer, 0, keepdims=False)
        ks_s = jnp.swapaxes(sc_s[..., :KV], 1, 2)
        vs_s = jnp.swapaxes(sc_s[..., KV:], 1, 2)
        qsc = jnp.maximum(
            jnp.max(jnp.abs(qg.astype(jnp.float32)), axis=-1), 1e-8
        ) / 127.0
        q8 = jnp.clip(
            jnp.round(qg.astype(jnp.float32) / qsc[..., None]), -127, 127
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
        return (o32.astype(jnp.float32) * psc[..., None]).reshape(B, H, HD)

    def pallas_layer(q, lengths, layer, kc, vc, sc):
        return decode_attention_int8_slots(
            q, kc, vc, sc, lengths, layer, block_s=args.block_s
        )

    def bench(fn, lengths, label):
        # cache arrays ride as ARGUMENTS: a closure-captured device array
        # is inlined into the HLO as a constant, and the tunnel's remote
        # compiler rejects GB-scale request bodies (HTTP 413)
        layer = jnp.asarray(L - 1, jnp.int32)
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(q0, lengths, layer, kc, vc, sc)
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0
        print(json.dumps({"label": label,
                          "compile_s": round(compile_s, 1)}), flush=True)
        out = compiled(q0, lengths, layer, kc, vc, sc)
        jax.device_get(out[0, 0, :1])
        t0 = time.perf_counter()
        x = out
        for _ in range(args.iters):
            x = compiled(x * 1e-9 + q0, lengths, layer, kc, vc, sc)
        jax.device_get(x[0, 0, :1])
        ms = (time.perf_counter() - t0) / args.iters * 1000.0
        print(json.dumps({
            "label": label, "ms_per_layer": round(ms, 3),
            "ms_per_step_x28": round(ms * 28, 2),
            "hlo_copy_bytes": copy_bytes(compiled.as_text()),
        }), flush=True)
        return ms

    top = min(S - 192, 8000)
    uniform = jnp.full((B,), top, jnp.int32)
    mixed = jnp.asarray([top] + [600] * (B - 1), jnp.int32)

    for lengths, name in ((uniform, "uniform8k"), (mixed, "mixed")):
        live = int(np.sum(np.asarray(lengths)))
        gb = live * (2 * KV * HD + 4 * 2 * KV) / 1e9
        print(json.dumps({"scenario": name, "live_positions": live,
                          "kv_read_GB_per_layer": round(gb, 4),
                          "roofline_ms_at_819GBps": round(gb / 819 * 1e3,
                                                          4)}), flush=True)
        if args.impl in ("both", "dense"):
            bench(dense_layer, lengths, label=f"dense/{name}")
        if args.impl in ("both", "pallas"):
            bench(pallas_layer, lengths, label=f"pallas/{name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Torch-CPU SNAC decoder oracle — TEST ONLY.

A straight-line torch implementation of the same SNAC topology as
``snac_jax.py``, loaded from the shared torch-layout state dict
(``weights.random_torch_state``).  Used exclusively by the parity test
suite as the "reference semantics" side of the waveform-allclose gate
(mirrors the role of the torch `snac` package in the reference,
Morpheus_Client/tts_engine/speechpipe.py:113-137).

Not imported by any runtime code path; torch is a test dependency only.
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence

import numpy as np
import torch
import torch.nn as nn

from .snac_config import SNACConfig
from .weights import TorchState


def _snake(x: torch.Tensor, alpha: torch.Tensor) -> torch.Tensor:
    return x + torch.sin(alpha * x) ** 2 / (alpha + 1e-9)


class _ResUnit(nn.Module):
    def __init__(self, dim: int, dilation: int, groups: int):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.alpha1 = nn.Parameter(torch.ones(1, dim, 1))
        self.conv1 = nn.Conv1d(dim, dim, 7, dilation=dilation, padding=pad, groups=groups)
        self.alpha2 = nn.Parameter(torch.ones(1, dim, 1))
        self.conv2 = nn.Conv1d(dim, dim, 1)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        y = _snake(x, self.alpha1)
        y = self.conv1(y)
        y = _snake(y, self.alpha2)
        y = self.conv2(y)
        return x + y


class _VQLevel(nn.Module):
    def __init__(self, cfg: SNACConfig):
        super().__init__()
        self.codebook = nn.Embedding(cfg.codebook_size, cfg.codebook_dim)
        self.in_proj = nn.Conv1d(cfg.latent, cfg.codebook_dim, 1)
        self.out_proj = nn.Conv1d(cfg.codebook_dim, cfg.latent, 1)


class _DecoderBlock(nn.Module):
    def __init__(self, cfg: SNACConfig, i: int, rate: int):
        super().__init__()
        in_dim = cfg.decoder_dim // (2**i)
        out_dim = cfg.decoder_dim // (2 ** (i + 1))
        groups = out_dim if cfg.depthwise else 1
        self.alpha_up = nn.Parameter(torch.ones(1, in_dim, 1))
        self.up = nn.ConvTranspose1d(
            in_dim, out_dim, 2 * rate, stride=rate, padding=math.ceil(rate / 2)
        )
        self.has_noise = cfg.noise
        if cfg.noise:
            self.noise = nn.Conv1d(out_dim, out_dim, 1, bias=False)
        self.res1 = _ResUnit(out_dim, 1, groups)
        self.res2 = _ResUnit(out_dim, 3, groups)
        self.res3 = _ResUnit(out_dim, 9, groups)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = _snake(x, self.alpha_up)
        x = self.up(x)
        # Deterministic oracle: noise contribution zeroed, matching
        # snac_decode(..., noise_rng=None).
        x = self.res1(x)
        x = self.res2(x)
        x = self.res3(x)
        return x


class SnacDecoderOracle(nn.Module):
    """Deterministic (noise-free) SNAC decode, torch semantics."""

    def __init__(self, cfg: SNACConfig):
        super().__init__()
        self.cfg = cfg
        lat = cfg.latent
        self.quantizer = nn.ModuleList(_VQLevel(cfg) for _ in cfg.vq_strides)
        dec: Dict[str, nn.Module] = {}
        if cfg.depthwise:
            self.in_dw = nn.Conv1d(lat, lat, 7, padding=3, groups=lat)
            self.in_pw = nn.Conv1d(lat, cfg.decoder_dim, 1)
        else:
            self.in_conv = nn.Conv1d(lat, cfg.decoder_dim, 7, padding=3)
        self.blocks = nn.ModuleList(
            _DecoderBlock(cfg, i, r) for i, r in enumerate(cfg.decoder_rates)
        )
        d_last = cfg.decoder_dim // (2 ** len(cfg.decoder_rates))
        self.alpha_out = nn.Parameter(torch.ones(1, d_last, 1))
        self.out = nn.Conv1d(d_last, 1, 7, padding=3)

    def load_state(self, state: TorchState) -> None:
        sd = {}
        for i in range(len(self.cfg.vq_strides)):
            for name in ("codebook.weight", "in_proj.weight", "in_proj.bias",
                         "out_proj.weight", "out_proj.bias"):
                sd[f"quantizer.{i}.{name}"] = torch.from_numpy(
                    np.ascontiguousarray(state[f"quantizer.{i}.{name}"])
                )
        ren = {
            "decoder.in_dw.": "in_dw.", "decoder.in_pw.": "in_pw.",
            "decoder.in.": "in_conv.", "decoder.out.": "out.",
        }
        for key, val in state.items():
            if key.startswith("quantizer.") or key.startswith("encoder."):
                continue
            new = key
            for old, repl in ren.items():
                if key.startswith(old):
                    new = repl + key[len(old):]
                    break
            if key == "decoder.alpha_out":
                new = "alpha_out"
            if key.startswith("decoder.block"):
                rest = key[len("decoder."):]  # block{i}.xxx
                i = int(rest[len("block")])
                sub = rest.split(".", 1)[1]
                new = f"blocks.{i}.{sub}"
            sd[new] = torch.from_numpy(np.ascontiguousarray(val))
        missing, unexpected = self.load_state_dict(sd, strict=False)
        missing = [m for m in missing if not m.startswith("encoder")]
        assert not missing, f"missing keys: {missing}"

    @torch.no_grad()
    def decode(self, codes: Sequence[np.ndarray]) -> np.ndarray:
        """codes: (codes0, codes1, codes2) int arrays (B, T_level) -> (B, T)."""
        z = None
        for level, stride in enumerate(self.cfg.vq_strides):
            q = self.quantizer[level]
            idx = torch.from_numpy(np.asarray(codes[level])).long()
            emb = q.codebook(idx).transpose(1, 2)  # (B, cb_dim, T)
            zl = q.out_proj(emb)
            if stride > 1:
                zl = zl.repeat_interleave(stride, dim=-1)
            z = zl if z is None else z + zl
        if self.cfg.depthwise:
            x = self.in_pw(self.in_dw(z))
        else:
            x = self.in_conv(z)
        for blk in self.blocks:
            x = blk(x)
        x = _snake(x, self.alpha_out)
        x = torch.tanh(self.out(x))
        return x[:, 0, :].numpy()

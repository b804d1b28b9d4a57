"""Probe 3: decompose the v6 kernel time into floor / per-iteration / exp /
matmul-precision components by forcing plane ranges empty or full.

Run: timeout 580 python benchmarks/experiments/kernel_probe3.py [names...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from benchmarks.experiments.kernel_probe2 import (  # noqa: E402
    BATCH, measure, transform_and_pack, run_v6, pd, spec, SIGMA,
)

HI = jax.lax.Precision.HIGHEST
BF = jax.lax.Precision.DEFAULT

# monkeypatch hooks: force ranges empty/full
_orig_ranges = pd._plane_ranges_axes
MODE = {"mode": None}

def patched_ranges(dy2_t, dz2_t, thresh, hwt, a):
    r = _orig_ranges(dy2_t, dz2_t, thresh, hwt, a)
    if MODE["mode"] == "floor":
        return jnp.zeros_like(r)
    if MODE["mode"] == "full":
        dl = thresh.shape[1]
        return jnp.concatenate([jnp.zeros_like(r[..., :1]), jnp.full_like(r[..., 1:], dl)], axis=-1)
    return r

pd._plane_ranges_axes = patched_ranges


def make_step(pack=2, mode=None, **kw):
    def step(key):
        pc, pw, pr, pm = transform_and_pack(key, pack)
        out = run_v6(pc, pw, pr, pm, **kw)
        return out[:, :1, ::16, ::128]
    return step


def run(name, pack, mode, **kw):
    MODE["mode"] = mode
    try:
        us = measure(make_step(pack=pack, mode=mode, **kw)) * 1e6
        print(f"{name:16s} {us:8.2f} us/mol  ({1e6 / us:,.0f} mols/s)", flush=True)
    except Exception as e:
        print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    run("floor-hi", 2, "floor", precision=HI, subl=True, dlout=True)
    run("full-hi", 2, "full", precision=HI, subl=True, dlout=True)
    run("floor-bf16", 2, "floor", precision=BF, subl=True, dlout=True)
    run("full-bf16", 2, "full", precision=BF, subl=True, dlout=True)
    run("floor-p8r8", 8, "floor", precision=HI, subl=True, dlout=True, hwt_rows=8)
    run("full-p8r8", 8, "full", precision=HI, subl=True, dlout=True, hwt_rows=8)

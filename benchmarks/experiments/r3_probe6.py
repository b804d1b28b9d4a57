"""r3_probe6: decompose the stream-from-disk residual (DESIGN.md 3b).

The 50k-ligand wire stream runs ~56k mols/s against a ~87-94k kernel rate.
Which rung eats the rest — host parse/assembly, wire packing, the H2D
transfer through the axon tunnel, or dispatch overhead?  Four variants,
same 50k-molecule workload, one final scalar fetch each (the only
trustworthy fence under the deferring tunnel):

  e2e        : the production path (parse + pack + H2D + dispatch), CLI-equal
  noparse    : superbatches pre-parsed to RAM; pack + H2D + dispatch remain
  nopack     : wire arrays pre-packed in RAM; H2D (prefetch-staged) + dispatch
  resident   : wire arrays pre-transferred to HBM; dispatch + compute only

resident is the device-side floor of this pipeline; nopack-resident is the
tunnel H2D tax; noparse-nopack the quantize/pack tax; e2e-noparse the
parse/assembly tax (overlapped by the prefetch thread, so it can be ~0).

Usage:  python benchmarks/experiments/r3_probe6.py /tmp/lib50k.sdf
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

from molvoxel_tpu.utils.timing import enable_compilation_cache  # noqa: E402

enable_compilation_cache(str(REPO / ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from molvoxel_tpu.core.config import GridSpec  # noqa: E402
from molvoxel_tpu.data.feed import SDFBatchFeeder, pack_wire, prefetch_iter, wire_scale  # noqa: E402
from molvoxel_tpu.parallel.stream import _fused_scan_step_wire, stream_checksum  # noqa: E402

SUPER, CHUNK = 4096, 256
KW = dict(density_type="gaussian", sigma=0.5, random_rotation=True,
          out_dtype="bfloat16")


def feeder(path):
    return SDFBatchFeeder(path, ["C", "N", "O", "S"], batch_size=SUPER, compact=True, workers=2)


def run_stream(batches_iter, n):
    t0 = time.time()
    stats, _ = stream_checksum(batches_iter, SPEC, chunk=CHUNK, radii=1.0,
                               random_translation=0.5, seed=1, wire=True, **KW)
    return n / (time.time() - t0)


def step_kwargs(num_channels, scale):
    return dict(chunk=CHUNK, num_channels=num_channels, radii_value=1.0,
                random_translation=0.5, spec=SPEC, impl="auto", presorted=False,
                inv_scale=1.0 / scale, **KW)


def run_steps(wires, num_channels, scale, n, *, resident):
    key = jax.random.PRNGKey(1)
    kw = step_kwargs(num_channels, scale)
    if resident:
        wires = [jax.device_put(w) for w in wires]
        jax.block_until_ready(wires[-1])
        # one throwaway dispatch+fetch to fence the queued transfers for real
        float(_fused_scan_step_wire(wires[-1], key, jnp.int32(99), **kw))
    t0 = time.time()
    accs = []
    if resident:
        for step, dev in enumerate(wires):
            accs.append(_fused_scan_step_wire(dev, key, jnp.int32(step), **kw))
    else:
        staged = prefetch_iter((jax.device_put(w) for w in wires), depth=2)
        for step, dev in enumerate(staged):
            accs.append(_fused_scan_step_wire(dev, key, jnp.int32(step), **kw))
    float(jnp.sum(jnp.stack(accs)))
    return n / (time.time() - t0)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lib50k.sdf"
    global SPEC
    SPEC = GridSpec(resolution=0.5, dimension=64)
    scale = wire_scale(SPEC)

    print("parsing once ...", flush=True)
    batches = list(feeder(path))
    n = sum(int((b.num_atoms > 0).sum()) for b in batches)
    wires = [pack_wire(b, scale) for b in batches]
    nc = batches[0].num_channels
    print(f"{len(batches)} superbatches, {n} molecules", flush=True)

    # warm the jit cache once
    run_steps(wires[:1], nc, scale, 1, resident=True)

    for name, fn in [
        ("e2e     ", lambda: run_stream(prefetch_iter(iter(feeder(path))), n)),
        ("noparse ", lambda: run_stream(iter(list(batches)), n)),
        ("nopack  ", lambda: run_steps(wires, nc, scale, n, resident=False)),
        ("resident", lambda: run_steps(wires, nc, scale, n, resident=True)),
    ]:
        best = max(fn() for _ in range(3))
        print(f"{name} {best:10,.0f} mols/s", flush=True)


if __name__ == "__main__":
    main()

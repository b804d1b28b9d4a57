"""r5: the stream ladder under the WITNESS consumer (VERDICT r4 weak #1).

The r4 attribution (docs/DESIGN.md 4d) measured stage 2's "61.6k ceiling"
under the old full-read consumer and skipped chunk 1024 for compile time.
This probe re-runs the whole ladder under the witness protocol and sweeps
the remaining knobs, to either reach >=90k mols/s end-to-end or pin the
tunnel-dispatch floor with witness-protocol numbers:

  1. feed-only: host parse + C wire assembly, no device.
  3. resident-dispatch: one superbatch resident in HBM, N fused-scan
     dispatches (pure dispatch + compute) x chunk {256, 512, 1024}.
  2. staged-H2D + dispatch: pre-parsed wires, device_put from a prefetch
     thread x chunk {512, 1024} x depth {2, 4}.
  4. end-to-end production x chunk {512, 1024} x superbatch {4096, 8192}.

Fixture: 50k-molecule SDF at /tmp/lib50k.sdf (auto-created).
Run on an idle host: timeout 3000 python benchmarks/experiments/r5_stream_probe.py
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from molvoxel_tpu.utils.timing import enable_compilation_cache  # noqa: E402

enable_compilation_cache(str(REPO / ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from molvoxel_tpu.core.config import GridSpec  # noqa: E402
from molvoxel_tpu.data.feed import SDFBatchFeeder, prefetch_iter, wire_scale  # noqa: E402
from molvoxel_tpu.parallel.stream import _fused_scan_step_wire, stream_checksum  # noqa: E402

PATH = "/tmp/lib50k.sdf"


def make_feeder(spec, superbatch):
    return SDFBatchFeeder(
        PATH, ["C", "N", "O", "S"], batch_size=superbatch, unknown=True, workers=2,
        presort=False, spec=spec,
    )


def step_kwargs(spec, chunk):
    return dict(chunk=chunk, num_channels=5, radii_value=1.0, random_translation=0.5,
                spec=spec, density_type="gaussian", sigma=0.5, random_rotation=True,
                out_dtype="bfloat16", presorted=False, inv_scale=1.0 / wire_scale(spec),
                witness=True)


def main():
    spec = GridSpec(resolution=0.5, dimension=64)
    if not Path(PATH).exists():
        Path(PATH).write_bytes(
            Path("/root/reference/test/10gs/10gs_ligand.sdf").read_bytes() * 50000
        )
    key = jax.random.PRNGKey(0)

    # 1. feed-only + cache all wires in RAM for stages 2/3
    feeder = make_feeder(spec, 4096)
    t0 = time.time()
    n = 0
    wires = []
    for wire, num_atoms, nc in feeder.iter_wire(spec):
        nm = int((num_atoms > 0).sum())
        n += nm
        wires.append((wire, nm, nc))
    dt = time.time() - t0
    print(f"1. feed-only: {n / dt:>10,.0f} mols/s ({n} mols, {dt:.2f}s)", flush=True)

    # warm every chunk compile once (compilation cache makes reruns cheap)
    dev0 = jax.device_put(wires[0][0])
    for chunk in (256, 512, 1024):
        float(_fused_scan_step_wire(dev0, key, jnp.int32(0), **step_kwargs(spec, chunk)))
        print(f"   warmed chunk {chunk}", flush=True)

    # 3. resident-dispatch (no H2D, no parse), witness consumer
    for chunk in (256, 512, 1024):
        kw = step_kwargs(spec, chunk)
        t0 = time.time()
        accs = [
            _fused_scan_step_wire(dev0, key, jnp.int32(1 + i), **kw)
            for i in range(len(wires))
        ]
        cs = float(jnp.sum(jnp.stack(accs)))
        dt = time.time() - t0
        print(f"3. resident-dispatch chunk {chunk:4d}: {n / dt:>10,.0f} mols/s (cs {cs:.3e})",
              flush=True)

    # 2. staged-H2D + dispatch, witness consumer
    for chunk in (512, 1024):
        for depth in (2, 4):
            kw = step_kwargs(spec, chunk)

            def staged():
                for wire, nm, nc in wires:
                    yield jax.device_put(wire), nm

            t0 = time.time()
            accs = []
            for step, (dev, nm) in enumerate(prefetch_iter(staged(), depth=depth)):
                accs.append(_fused_scan_step_wire(dev, key, jnp.int32(step), **kw))
            cs = float(jnp.sum(jnp.stack(accs)))
            dt = time.time() - t0
            print(f"2. staged-H2D chunk {chunk:4d} depth {depth}: {n / dt:>10,.0f} mols/s "
                  f"(cs {cs:.3e})", flush=True)

    # 4. end-to-end production path, witness
    for superbatch in (4096, 8192):
        for chunk in (512, 1024):
            feeder = make_feeder(spec, superbatch)
            t0 = time.time()
            stats, cs = stream_checksum(
                feeder.iter_wire(spec), spec, chunk=chunk, radii=1.0,
                random_translation=0.5, random_rotation=True, out_dtype="bfloat16",
                wire=True, witness=True,
            )
            dt = time.time() - t0
            print(f"4. e2e super {superbatch:5d} chunk {chunk:4d}: "
                  f"{stats.molecules / dt:>10,.0f} mols/s", flush=True)


if __name__ == "__main__":
    main()

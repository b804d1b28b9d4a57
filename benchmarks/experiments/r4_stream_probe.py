"""r4 probe: attribute the stream-lane gap (58k end-to-end vs ~115k device).

VERDICT r3 weak #6: the end-to-end stream (native parse -> wire -> fused
scan) reaches ~58k mols/s while the device-only rate is ~115k, and the
residual was attributed to "the tunnel client" without an accounting.  This
ladder isolates each stage on the 50k-molecule fixture:

  1. feed-only: drain SDFBatchFeeder.iter_wire, no device work at all
     (host parse + C wire assembly rate).
  2. dispatch-only: pre-stage ALL wire superbatches in RAM, then run the
     fused scan step over them (device_put + dispatch + device compute;
     zero parse cost).
  3. resident-dispatch: transfer ONE superbatch once, dispatch the fused
     step N times on device-resident wire (pure dispatch + device compute;
     zero H2D).
  4. end-to-end: the production path (prefetch depth 2), for reference.

Fixture: python -c "open('/tmp/lib50k.sdf','wb').write(
    open('/root/reference/test/10gs/10gs_ligand.sdf','rb').read()*50000)"
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

from molvoxel_tpu.utils.timing import enable_compilation_cache  # noqa: E402

enable_compilation_cache(str(REPO / ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from molvoxel_tpu.core.config import GridSpec  # noqa: E402
from molvoxel_tpu.data.feed import SDFBatchFeeder, prefetch_iter  # noqa: E402
from molvoxel_tpu.parallel.stream import _fused_scan_step_wire, stream_checksum  # noqa: E402

PATH = "/tmp/lib50k.sdf"
SUPER = 4096
CHUNK = 256


def make_feeder(spec):
    return SDFBatchFeeder(
        PATH, ["C", "N", "O", "S"], batch_size=SUPER, unknown=True, workers=2,
        presort=False, spec=spec,
    )


def rate(nmol, dt):
    return nmol / dt


def main():
    spec = GridSpec(resolution=0.5, dimension=64)
    if not Path(PATH).exists():
        Path(PATH).write_bytes(
            Path("/root/reference/test/10gs/10gs_ligand.sdf").read_bytes() * 50000
        )

    # 1. feed-only
    feeder = make_feeder(spec)
    t0 = time.time()
    n = 0
    wires = []
    for wire, num_atoms, nc in feeder.iter_wire(spec):
        n += int((num_atoms > 0).sum())
        wires.append((wire, int((num_atoms > 0).sum()), nc))
    dt = time.time() - t0
    print(f"1. feed-only (parse + C wire assembly): {rate(n, dt):>10,.0f} mols/s ({n} mols, {dt:.2f}s)", flush=True)

    kw = dict(chunk=CHUNK, num_channels=5, radii_value=1.0, random_translation=0.5,
              spec=spec, density_type="gaussian", sigma=0.5, random_rotation=True,
              out_dtype="bfloat16", presorted=False,
              inv_scale=1.0 / float(2**15 - 1) * (spec.width / 2 + 4.0) / (spec.width / 2 + 4.0))
    # use the production scale
    from molvoxel_tpu.data.feed import wire_scale

    kw["inv_scale"] = 1.0 / wire_scale(spec)
    key = jax.random.PRNGKey(0)

    # warm the compile with one superbatch
    dev0 = jax.device_put(wires[0][0])
    float(_fused_scan_step_wire(dev0, key, jnp.int32(0), **kw))

    # 3. resident-dispatch (zero H2D): same superbatch, fresh step ids
    t0 = time.time()
    accs = [
        _fused_scan_step_wire(dev0, key, jnp.int32(1 + i), **kw)
        for i in range(len(wires))
    ]
    cs = float(jnp.sum(jnp.stack(accs)))
    dt = time.time() - t0
    print(f"3. resident-dispatch (no H2D, no parse): {rate(n, dt):>10,.0f} mols/s (cs {cs:.3e})", flush=True)

    # 2. dispatch-only from pre-staged host wires (device_put in prefetch thread)
    def staged():
        for wire, nm, nc in wires:
            yield jax.device_put(wire), nm

    t0 = time.time()
    accs = []
    for step, (dev, nm) in enumerate(prefetch_iter(staged(), depth=2)):
        accs.append(_fused_scan_step_wire(dev, key, jnp.int32(step), **kw))
    cs = float(jnp.sum(jnp.stack(accs)))
    dt = time.time() - t0
    print(f"2. dispatch-only (staged H2D + dispatch): {rate(n, dt):>10,.0f} mols/s (cs {cs:.3e})", flush=True)

    # 4. end-to-end production path
    feeder = make_feeder(spec)
    t0 = time.time()
    stats, cs = stream_checksum(
        feeder.iter_wire(spec), spec, chunk=CHUNK, radii=1.0,
        random_translation=0.5, random_rotation=True, out_dtype="bfloat16", wire=True,
    )
    dt = time.time() - t0
    print(f"4. end-to-end (production): {rate(stats.molecules, dt):>10,.0f} mols/s", flush=True)


if __name__ == "__main__":
    main()

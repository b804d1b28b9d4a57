"""r5: protein-stream ladder — attribute the 10.0k vs 12.9k gap (VERDICT r4 #6).

The 500-atom protein stream runs at ~78% of the protein batch-path rate.
One ladder under the witness consumer says whether the residual is presort,
wire assembly, or dispatch:

  1. feed-only: parse + in-C Morton presort + wire assembly, no device.
  1b. feed-only without presort (isolates the presort term).
  3. resident-dispatch: one superbatch resident, N fused-scan dispatches
     (presorted=True graph: zero in-graph argsort).
  2. staged-H2D + dispatch: pre-parsed wires, device_put off-thread.
  4. end-to-end production (stream_checksum wire path).

Fixture: 5,000 copies of the H-stripped 10gs pocket (~500 atoms -> 512
bucket), 48^3 x 5ch, bf16 grids.
Run idle: timeout 3000 python benchmarks/experiments/r5_protein_stream_probe.py
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

PATH = "/tmp/pocket5k.sdf"
SUPER = 1024
CHUNK = 256


def make_fixture():
    if Path(PATH).exists():
        return
    from molvoxel_tpu.data.parsers import read_pdb, write_sdf

    prot = read_pdb("/root/reference/test/10gs/10gs_pocket_nowater.pdb").without_hydrogens()
    write_sdf(prot, PATH)
    one = Path(PATH).read_bytes()
    Path(PATH).write_bytes(one * 5000)


def make_feeder(spec, presort=True):
    return SDFBatchFeeder(
        PATH, ["C", "N", "O", "S"], batch_size=SUPER, unknown=True, workers=2,
        presort=presort, spec=spec if presort else None,
    )


def main():
    make_fixture()
    spec = GridSpec(resolution=0.5, dimension=48)
    key = jax.random.PRNGKey(0)

    # 1. feed-only with presort (and keep the wires for stages 2/3)
    feeder = make_feeder(spec, presort=True)
    t0 = time.time()
    n = 0
    wires = []
    for wire, num_atoms, nc in feeder.iter_wire(spec):
        nm = int((num_atoms > 0).sum())
        n += nm
        wires.append((wire, nm, nc))
    dt = time.time() - t0
    print(f"1. feed-only (presort): {n / dt:>10,.0f} mols/s ({n} mols, {dt:.2f}s)", flush=True)

    # 1b. feed-only without presort
    feeder = make_feeder(spec, presort=False)
    t0 = time.time()
    n2 = 0
    for wire, num_atoms, nc in feeder.iter_wire(spec):
        n2 += int((num_atoms > 0).sum())
    dt = time.time() - t0
    print(f"1b. feed-only (no presort): {n2 / dt:>10,.0f} mols/s", flush=True)

    kw = dict(chunk=CHUNK, num_channels=5, radii_value=1.0, random_translation=0.5,
              spec=spec, density_type="gaussian", sigma=0.5, random_rotation=True,
              out_dtype="bfloat16", presorted=True, inv_scale=1.0 / wire_scale(spec),
              witness=True)

    dev0 = jax.device_put(wires[0][0])
    float(_fused_scan_step_wire(dev0, key, jnp.int32(0), **kw))

    # 3. resident-dispatch
    t0 = time.time()
    accs = [
        _fused_scan_step_wire(dev0, key, jnp.int32(1 + i), **kw)
        for i in range(len(wires))
    ]
    cs = float(jnp.sum(jnp.stack(accs)))
    dt = time.time() - t0
    print(f"3. resident-dispatch: {n / dt:>10,.0f} mols/s (cs {cs:.3e})", flush=True)

    # 2. staged-H2D + dispatch
    def staged():
        for wire, nm, nc in wires:
            yield jax.device_put(wire), nm

    t0 = time.time()
    accs = []
    for step, (dev, nm) in enumerate(prefetch_iter(staged(), depth=2)):
        accs.append(_fused_scan_step_wire(dev, key, jnp.int32(step), **kw))
    cs = float(jnp.sum(jnp.stack(accs)))
    dt = time.time() - t0
    print(f"2. staged-H2D + dispatch: {n / dt:>10,.0f} mols/s (cs {cs:.3e})", flush=True)

    # 4. end-to-end production
    feeder = make_feeder(spec, presort=True)
    t0 = time.time()
    stats, cs = stream_checksum(
        feeder.iter_wire(spec), spec, chunk=CHUNK, radii=1.0,
        random_translation=0.5, random_rotation=True, out_dtype="bfloat16",
        wire=True, witness=True, presorted=True,
    )
    dt = time.time() - t0
    print(f"4. end-to-end: {stats.molecules / dt:>10,.0f} mols/s", flush=True)


if __name__ == "__main__":
    main()

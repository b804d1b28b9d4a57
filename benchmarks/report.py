"""Full benchmark sweep -> BENCHMARKS.md.

Covers the reference's own timing protocol shapes (10gs ligand / complex /
protein, /root/reference/test/test_time_numpy.py) plus the north-star config,
on real hardware with deferred-execution-safe timing (utils/timing.py).
Every workload is measured in both grid dtypes: f32 (bit-parity lane) and
bf16 (production training lane, 2^-8 relative).

Run:  python benchmarks/report.py                 # kernel sweep
      python benchmarks/report.py --stream PATH   # + stream-from-disk row
                                                  # (PATH = multi-record SDF)
      python benchmarks/report.py --stream-protein PATH
                                                  # + protein-scale stream row
                                                  # (auto-generates the pocket
                                                  # fixture when PATH is absent)

The stream fixture is the 10gs ligand repeated 50k times:
  python -c "open('/tmp/lib50k.sdf','wb').write(
      open('/root/reference/test/10gs/10gs_ligand.sdf','rb').read()*50000)"
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from molvoxel_tpu.utils.timing import enable_compilation_cache  # noqa: E402

enable_compilation_cache(str(REPO / ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from molvoxel_tpu.core.config import GridSpec, small_atom_bucket  # noqa: E402
from molvoxel_tpu.data import AtomTypeGetter, BondTypeGetter, MolPointCloudMaker, read_pdb, read_sdf  # noqa: E402
from molvoxel_tpu.ops.batch import voxelize_batch  # noqa: E402

DENSITIES = ["gaussian", "binary", "gaussian_notrunc"]


def load_cases():
    lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
    prot = read_pdb("/root/reference/test/10gs/10gs_protein_nowater.pdb").without_hydrogens()

    ag = AtomTypeGetter(["C", "N", "O", "S"], unknown=True)
    bg = BondTypeGetter.default()
    maker = MolPointCloudMaker(ag, bg, channel_type="features")
    lig_coords, lig_feats = maker.run(lig)
    center = lig.coords.mean(0)

    prot_types = np.asarray([{"C": 0, "N": 1, "O": 2, "S": 3}.get(s, 3) for s in prot.symbols])
    prot_feats = np.eye(4, dtype=np.float32)[prot_types]

    complex_coords = np.concatenate([lig_coords, prot.coords])
    complex_feats = np.zeros((complex_coords.shape[0], lig_feats.shape[1] + 4), np.float32)
    complex_feats[: lig_feats.shape[0], : lig_feats.shape[1]] = lig_feats
    complex_feats[lig_feats.shape[0] :, lig_feats.shape[1] :] = prot_feats

    lig_onehot = np.eye(4, dtype=np.float32)[
        np.asarray([{"C": 0, "N": 1, "O": 2, "S": 3}.get(s, 3) for s in lig.symbols])
    ]

    return [
        # name, coords, feats, center, dim, batch, extra-kwargs
        ("ligand 64^3 x4ch", lig.coords - center, lig_onehot, 64, 64, {}),
        # forward_single (C=1): the channel-aligned packing path (8 mols/launch row)
        ("ligand 64^3 x1ch (single)", lig.coords - center,
            np.ones((lig.coords.shape[0], 1), np.float32), 64, 64, {}),
        ("ligand+bonds 48^3 x9ch", lig_coords - center, lig_feats, 48, 64, {}),
        ("complex 48^3 x13ch (6.6k pts)", complex_coords - center, complex_feats, 48, 8, {}),
        ("protein 48^3 x4ch (3.3k atoms)", prot.coords - center, prot_feats, 48, 8, {}),
        ("ligand 128^3 x4ch", lig.coords - center, lig_onehot, 128, 8, {}),
        # the BASELINE.json configs[4] protein regime: 128^3 pocket/protein grid
        ("protein 128^3 x4ch (3.3k atoms)", prot.coords - prot.coords.mean(0), prot_feats, 128, 4, {}),
        # channel-wise radii (4 distinct radii) via the v5 channel expansion
        ("ligand 64^3 x4ch channel-wise radii", lig.coords - center, lig_onehot, 64, 16,
         {"channelwise": True, "radii_c": np.asarray([0.9, 1.1, 1.3, 1.6], np.float32)}),
        # a 64-deep slab of a 256^3 grid: the unit of depth-sharded execution
        # on pod slices (parallel/sharded.py); per-mol cost is per SLAB here
        ("ligand 256^3 x4ch (64-deep slab)", lig.coords - center, lig_onehot, 256, 4,
         {"d_count": 64}),
    ]


def pad_batch(coords, feats, batch):
    v, c = feats.shape
    vp = small_atom_bucket(v)  # the production bucket (api/pipeline use it too)
    bc = np.zeros((batch, vp, 3), np.float32)
    bw = np.zeros((batch, vp, c), np.float32)
    bc[:, :v] = coords[None]
    bw[:, :v] = feats[None]
    mask = np.zeros((batch, vp), bool)
    mask[:, :v] = True
    return jnp.asarray(bc), jnp.asarray(bw), jnp.asarray(mask), vp


def measure(coords, feats, dim, batch, density, out_dtype="float32", d_count=None,
            channelwise=False, radii_c=None, consumer="witness"):
    spec = GridSpec(0.5, dim)
    bc, bw, mask, vp = pad_batch(coords, feats, batch)
    radii = jnp.asarray(radii_c) if radii_c is not None else jnp.ones((vp,), jnp.float32)

    # Grids must land in HBM (materialize=True fences the separable einsum;
    # the Pallas write is intrinsic).  The timed consumer is a witness read —
    # one molecule's complete grid per iteration via a layout-trivial
    # leading-dim slice (docs/DESIGN.md 3c): it keeps the data dependency
    # real without billing a full HBM re-read of every produced grid to the
    # producer.  consumer="full" reproduces the old full-read protocol.
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(key, n):
        def body(i, acc):
            keys = jax.random.split(jax.random.fold_in(key, i), batch)
            out = voxelize_batch(bc, bw, radii, mask, None, keys, 0.5,
                                 spec=spec, density_type=density, sigma=0.5,
                                 random_rotation=True, impl="auto", materialize=True,
                                 out_dtype=out_dtype, d_count=d_count,
                                 channelwise=channelwise)
            out = out if consumer == "full" else out[:1]
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)

    def run(n):
        t0 = time.time()
        float(loop(jax.random.PRNGKey(n), n))
        return time.time() - t0

    def timed(iters, reps=3):
        run(iters)  # compile
        base = min(run(1) for _ in range(reps))
        best = min(run(iters) for _ in range(reps))
        return (best - base) / ((iters - 1) * batch)

    run(1)
    per = timed(17)
    # Cheap workloads drown in dispatch noise at 17 iterations (the tunnel's
    # per-call jitter is ~1ms); rescale until the timed span is >= ~50 ms.
    if per * 16 * batch < 0.05:
        iters = int(0.05 / (max(per, 1e-7) * batch)) + 2
        per = timed(min(max(iters, 33), 513))
    # Under dispatch jitter base can exceed best on near-free workloads,
    # which would print a negative us/mol; clamp to the resolution floor.
    return max(per, 1e-9)


def measure_backward(coords, feats, dim, batch, out_dtype="float32",
                     channelwise=False, radii_c=None):
    """(fwd_us, step_us) per molecule: forward-only vs forward+gradient step.

    Both run the PRODUCTION batch path (ops/batch.py -> batched custom_vjp
    -> Pallas backward kernel) under the same augmented-loop harness as
    measure(): random rotation per iteration, witness consumer on the
    forward; the gradient step's loss reads the grids against a resident
    cotangent (what a real training loss does) and returns per-atom grads
    for coords/weights/radii.  out_dtype="bfloat16" exercises the lowp
    training lane end to end (bf16 grids forward, bf16 cotangent block +
    single-pass matmuls backward); channelwise routes both directions
    through the virtual-atom expansion."""
    spec = GridSpec(0.5, dim)
    bc, bw, mask, vp = pad_batch(coords, feats, batch)
    radii = jnp.asarray(radii_c) if radii_c is not None else jnp.ones((vp,), jnp.float32)
    ct = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, feats.shape[1], dim, dim, dim)).astype(np.float32)
    )

    def run_one(grad: bool):
        def loss(crd, w, r, keys):
            out = voxelize_batch(crd, w, r, mask, None, keys, 0.5,
                                 spec=spec, density_type="gaussian", sigma=0.5,
                                 random_rotation=True, impl="pallas",
                                 materialize=True, out_dtype=out_dtype,
                                 channelwise=channelwise)
            return jnp.sum(out * ct)

        vg = jax.value_and_grad(loss, argnums=(0, 1, 2))

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(key, n):
            def body(i, acc):
                keys = jax.random.split(jax.random.fold_in(key, i), batch)
                if grad:
                    val, grads = vg(bc, bw, radii, keys)
                    return acc + (val + sum(jnp.sum(g) for g in grads)) * 1e-6
                out = voxelize_batch(bc, bw, radii, mask, None, keys, 0.5,
                                     spec=spec, density_type="gaussian", sigma=0.5,
                                     random_rotation=True, impl="pallas",
                                     materialize=True, out_dtype=out_dtype,
                                     channelwise=channelwise)
                return acc + jnp.sum(out[:1].astype(jnp.float32)) * 1e-6
            return jax.lax.fori_loop(0, n, body, 0.0)

        def run(n):
            t0 = time.time()
            float(loop(jax.random.PRNGKey(n), n))
            return time.time() - t0

        run(1)
        run(9)
        base = min(run(1) for _ in range(3))
        best = min(run(9) for _ in range(3))
        return max((best - base) / (8 * batch), 1e-9)

    fwd = run_one(False)
    step = run_one(True)
    return fwd * 1e6, step * 1e6


def measure_stream(path: str, extra: tuple = ()) -> dict:
    """End-to-end stream-from-disk row via the CLI machinery (wire format)."""
    from molvoxel_tpu.cli import main as cli_main
    import io
    import json as _json
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main([
            "voxelize", path, "--throughput", "--wire", "--out-dtype", "bfloat16",
            "--random-rotation", "--random-translation", "0.5", *extra,
        ])
    assert rc == 0
    return _json.loads(buf.getvalue().strip().splitlines()[-1])


def make_protein_stream_fixture(path: str, n: int = 5000) -> None:
    """N copies of the 10gs pocket (H-stripped, ~500 atoms -> 512-atom bucket)
    as a multi-record SDF: the protein-scale streaming regime, where the
    Morton presort must run on the HOST (--presort) — the in-graph argsort
    was ~200 us/mol of the round-1 protein path (docs/DESIGN.md 2b)."""
    from molvoxel_tpu.data.parsers import read_pdb, write_sdf

    prot = read_pdb("/root/reference/test/10gs/10gs_pocket_nowater.pdb").without_hydrogens()
    write_sdf(prot, path)
    one = Path(path).read_bytes()
    Path(path).write_bytes(one * n)


def measure_stream_protein(path: str) -> dict:
    """Protein-scale stream: 48^3 grid, host Morton presort, zero in-graph
    argsort (stream_checksum(presorted=True) skips _sort_atoms_spatially)."""
    if not Path(path).exists():
        make_protein_stream_fixture(path)
    return measure_stream(path, (
        "--presort", "--dimension", "48", "--unknown", "--batch", "1024",
    ))


def main():
    stream_path = None
    if "--stream" in sys.argv:
        stream_path = sys.argv[sys.argv.index("--stream") + 1]
    protein_stream_path = None
    if "--stream-protein" in sys.argv:
        protein_stream_path = sys.argv[sys.argv.index("--stream-protein") + 1]

    rows = []
    for name, coords, feats, dim, batch, extra in load_cases():
        densities = DENSITIES if not extra.get("channelwise") else ["gaussian", "binary"]
        for density in densities:
            cells = {}
            for dtype in ("float32", "bfloat16"):
                try:
                    per = measure(coords.astype(np.float32), feats, dim, batch, density,
                                  out_dtype=dtype, d_count=extra.get("d_count"),
                                  channelwise=extra.get("channelwise", False),
                                  radii_c=extra.get("radii_c"))
                except Exception as e:  # noqa: BLE001
                    print(f"{name} {density} {dtype} FAILED: {str(e)[:100]}", flush=True)
                    per = float("nan")
                cells[dtype] = per
            rows.append((name, density, cells["float32"] * 1e6, cells["bfloat16"] * 1e6))
            print(f"{name:38s} {density:18s} f32 {cells['float32']*1e6:9.1f}  "
                  f"bf16 {cells['bfloat16']*1e6:9.1f} us/mol "
                  f"({1.0/cells['bfloat16']:,.0f} mols/s)", flush=True)

    # fp8 training lane: the ligand headline only (full sweep would double
    # compile time for a lane whose story one row tells)
    lig_row = load_cases()[0]
    per_fp8 = measure(lig_row[1].astype(np.float32), lig_row[2], 64, 64, "gaussian",
                      out_dtype="float8_e4m3fn")
    print(f"{'ligand 64^3 x4ch':38s} {'gaussian fp8-out':18s} "
          f"{per_fp8*1e6:9.1f} us/mol ({1.0/per_fp8:,.0f} mols/s)", flush=True)
    # continuity row: the round-1/2 full-read protocol on the headline lane
    per_full = measure(lig_row[1].astype(np.float32), lig_row[2], 64, 64, "gaussian",
                       out_dtype="bfloat16", consumer="full")
    print(f"{'ligand 64^3 x4ch':38s} {'gaussian full-read':18s} "
          f"{per_full*1e6:9.1f} us/mol ({1.0/per_full:,.0f} mols/s)", flush=True)

    # backward (gradient deposit) rows: the Pallas VJP kernel, ligand +
    # protein scale, in BOTH training dtypes (bf16 grids select the lowp
    # backward: bf16 cotangent block + single-pass matmuls) — the reference
    # has no backward at all (@no_grad).  Plus the channel-wise training row
    # through the virtual-atom expansion backward (r5).
    bwd_rows = []
    bwd_jobs = [
        ("ligand 64^3 x4ch", "float32", {}),
        ("ligand 64^3 x4ch", "bfloat16", {}),
        ("protein 48^3 x4ch (3.3k atoms)", "float32", {}),
        ("protein 48^3 x4ch (3.3k atoms)", "bfloat16", {}),
        ("protein 128^3 x4ch (3.3k atoms)", "float32", {}),
        ("protein 128^3 x4ch (3.3k atoms)", "bfloat16", {}),
        ("ligand 64^3 x4ch channel-wise radii", "bfloat16",
         {"channelwise": True, "radii_c": np.asarray([0.9, 1.1, 1.3, 1.6], np.float32)}),
    ]
    for bname, bdtype, bextra in bwd_jobs:
        brow = next(r for r in load_cases() if r[0] == bname)
        try:
            fwd_us, step_us = measure_backward(brow[1].astype(np.float32), brow[2], brow[3],
                                               min(brow[4], 8), out_dtype=bdtype, **bextra)
            bwd_rows.append((bname, bdtype, fwd_us, step_us))
            print(f"{bname:38s} {bdtype:9s} fwd+grad step {step_us:9.1f} us/mol "
                  f"(fwd {fwd_us:.1f}, {step_us/fwd_us:.2f}x)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{bname} {bdtype} backward FAILED: {str(e)[:100]}", flush=True)

    stream_row = None
    if stream_path:
        stream_row = measure_stream(stream_path)
        print(f"stream-from-disk: {stream_row['value']:,.1f} mols/s "
              f"({stream_row['molecules']} molecules)", flush=True)
    protein_stream_row = None
    if protein_stream_path:
        protein_stream_row = measure_stream_protein(protein_stream_path)
        print(f"protein stream-from-disk: {protein_stream_row['value']:,.1f} mols/s "
              f"({protein_stream_row['molecules']} molecules, host presort)", flush=True)

    out = REPO / "BENCHMARKS.md"
    lines = [
        "# Benchmarks (single TPU chip)",
        "",
        f"Measured on `{jax.default_backend()}` via `benchmarks/report.py` "
        "(random rotation + 0.5 A translation per molecule, parity-exact "
        "semantics except `gaussian_notrunc` = the reference torch backend's "
        "no-cutoff gaussian).  Protocol (docs/DESIGN.md 3c): every iteration "
        "the FULL batch of grids is computed and written to HBM — the Pallas "
        "output is an opaque custom call XLA cannot narrow, and the separable "
        "path is fenced with `materialize=True` (optimization_barrier).  The "
        "timed consumer is a *witness read* (one molecule's complete grid per "
        "iteration): the figures are producer rates — prep + kernel + full "
        "grid write — and do not bill the benchmark's own full HBM re-read of "
        "every grid to the voxelizer (the `full-read` continuity row below "
        "shows that older protocol on the headline lane).  f32 = bit-parity "
        "lane; bf16 = production training lane (tracks f32 within 2^-8 "
        "relative, tests/test_out_dtype.py).",
        "",
        "| workload | density | f32 us/mol | bf16 us/mol | bf16 mols/s |",
        "|---|---|---:|---:|---:|",
    ]
    for name, density, us32, us16 in rows:
        rate = 1e6 / us16 if us16 == us16 and us16 > 0 else float("nan")
        lines.append(f"| {name} | {density} | {us32:.1f} | {us16:.1f} | {rate:,.0f} |")
    lines += [
        f"| ligand 64^3 x4ch | gaussian (fp8 e4m3 out) | — | {per_fp8*1e6:.1f} | "
        f"{1.0/per_fp8:,.0f} |",
        f"| ligand 64^3 x4ch | gaussian (full-read protocol) | — | {per_full*1e6:.1f} | "
        f"{1.0/per_full:,.0f} |",
        "",
    ]
    if bwd_rows:
        lines += [
            "Differentiable deposit (the reference is forward-only/@no_grad): a full",
            "training step — forward + loss-vs-resident-cotangent + dL/dcoords,",
            "dL/dweights, dL/dradii through the Pallas backward kernel — vs the",
            "forward-only producer rate, same augmented batch-path harness:",
            "",
            "| workload | grid dtype | forward us/mol | fwd+grad step us/mol | step/fwd |",
            "|---|---|---:|---:|---:|",
        ]
        for bname, bdtype, fwd_us, step_us in bwd_rows:
            # ligand-scale forwards sit at the harness's dispatch-noise floor;
            # a ratio against them is meaningless
            if fwd_us < 8.0:
                lines.append(f"| {bname} | {bdtype} | {fwd_us:.1f} (noise-floored) | "
                             f"{step_us:.1f} | — |")
            else:
                lines.append(f"| {bname} | {bdtype} | {fwd_us:.1f} | {step_us:.1f} | "
                             f"{step_us/fwd_us:.2f}x |")
        lines += [
            "",
            "The bf16 rows run the lowp backward (bf16 cotangent block + single-",
            "pass matmuls; docs/DESIGN.md 5b); the channel-wise row runs both",
            "directions through the virtual-atom expansion.  step/fwd stays ~5-6x",
            "on protein bf16 because the bf16 *forward* is ~3x faster in the same",
            "harness — absolute training cost is the metric that moved.",
            "",
        ]
    if stream_row:
        lines += [
            f"Stream-from-disk end to end ({stream_row['molecules']:,} molecules, "
            f"native parse -> int16 wire superbatches -> fused scan, bf16 grids): "
            f"**{stream_row['value']:,.0f} mols/s** "
            f"(superbatch {stream_row['superbatch']}, workers {stream_row['workers']}).",
            "",
        ]
    if protein_stream_row:
        lines += [
            f"Protein-scale stream ({protein_stream_row['molecules']:,} pocket copies, "
            "~500 atoms/record, 48^3 grid, HOST Morton presort -> zero in-graph "
            f"argsort, int16 wire, bf16 grids): "
            f"**{protein_stream_row['value']:,.0f} mols/s** "
            f"(superbatch {protein_stream_row['superbatch']}).",
            "",
        ]
    lines += [
        "Reference comparison (same host, 10gs ligand 64^3 x 4ch gaussian): the",
        "reference numpy backend measures ~142 mols/s with its default (buggy)",
        "block binning and ~0.8 mols/s on its exact single-block path.",
        "",
        "Reference-protocol replica (benchmarks/ref_protocol.py — the reference's",
        "own timing script shape: dim 48, 10gs complex ~6.6k pts, batch 16 x 25",
        "iter x 5 trials, SYNCHRONOUS per-iteration host readback of all 16 full",
        "f32 grids; measured r4 on this host):",
        "",
        "| mode | reference numpy ms/vox | molvoxel_tpu per-call | molvoxel_tpu batched |",
        "|---|---:|---:|---:|",
        "| single | 10.09 | 35.82 | 24.43 |",
        "| types | 15.34 | 113.57 | 87.49 |",
        "| features | 11.94 | 92.26 | 88.07 |",
        "",
        "This row measures the deployment topology, not the chip: each iteration",
        "fetches 56 MB of grids through the axon tunnel (~40 MB/s effective), so",
        "the synchronous-readback protocol is tunnel-bound — the device produces",
        "the same complex grids at ~76 us/mol (table above), ~1000x faster than",
        "this protocol can read them back, and batched-vs-per-call barely differ.",
        "On co-located hardware (TPU-VM PCIe) the same readback is >100x faster.",
        "Pipelines that keep grids on-device (training, gridstore, stream) are",
        "unaffected; they are the supported high-throughput surfaces.",
        "",
        "Deployment-shape row (benchmarks/experiments/r5_deploy_probe.py — same",
        "48^3 complex workload, but grids stream to a gridstore with the flush",
        "overlapping the next dispatch, the supported topology): fp8 single-",
        "channel **168 mols/s = 5.96 ms/vox**, beating the reference's 10.09",
        "ms/vox on its own workload; bf16 single 59-111 mols/s; 8-channel",
        "features 13-26 mols/s (still bound by this host's ~25 MB/s D2H tunnel —",
        "rates scale with grid bytes; docs/DESIGN.md 5d).  On TPU-VM PCIe the",
        "same path is compute-bound at ~13k mols/s.",
        "",
        "GridStore -> training input (benchmarks/experiments/",
        "r5_gridstore_probe.py; GridStoreDataset + shuffling torch DataLoader,",
        "64^3 x4ch, steady state): fp8 shards 1,064 grids/s, bf16 858, f32 305 —",
        "the capacity-lane payoff of the low-precision stores (DESIGN 4c/5d).",
        "",
    ]
    out.write_text("\n".join(lines))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()

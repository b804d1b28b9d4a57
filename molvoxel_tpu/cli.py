"""Command-line interface.

The reference ships no CLI (SURVEY.md section 0); this one covers the common
workflows end to end:

    python -m molvoxel_tpu info
    python -m molvoxel_tpu voxelize ligands.sdf -o grids.npz --channels C,N,O,S
    python -m molvoxel_tpu voxelize complex.pdb --dx out_dx/ --dimension 48
    python -m molvoxel_tpu bench
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def _cmd_info(args) -> int:
    import jax

    from . import __version__
    from .native import NATIVE_AVAILABLE

    print(f"molvoxel-tpu {__version__}")
    print(f"jax {jax.__version__}, backend {jax.default_backend()}, {len(jax.devices())} device(s)")
    print(f"native fast parser: {'yes' if NATIVE_AVAILABLE else 'no (pure-python fallback)'}")
    print("formats: sdf/.sdf.gz (V2000+V3000), pdb (+multi-MODEL), xyz, mol2")
    try:
        import rdkit  # noqa: F401

        print("rdkit: yes")
    except ImportError:
        print("rdkit: no (built-in SDF/PDB parsers active)")
    return 0


def _is_sdf(path: Path) -> bool:
    return path.suffix in (".sdf", ".mol") or path.suffixes[-2:] == [".sdf", ".gz"]


def _load_molecules(path: Path, hydrogens: bool):
    from .data.parsers import iter_xyz, read_pdb
    from .native import parse_sdf_file
    from .native.fastparse import parse_sdf_buffer

    if path.suffixes[-2:] == [".sdf", ".gz"]:
        import gzip

        mols = parse_sdf_buffer(gzip.decompress(path.read_bytes()))
    elif path.suffix in (".sdf", ".mol"):
        mols = parse_sdf_file(path)
    elif path.suffix in (".pdb", ".ent"):
        mols = [read_pdb(path)]
    elif path.suffix == ".xyz":
        mols = list(iter_xyz(path))
    elif path.suffix == ".mol2":
        from .data.parsers import iter_mol2

        mols = list(iter_mol2(path))
    else:
        raise SystemExit(f"unsupported input type: {path}")
    if not hydrogens:
        mols = [m.without_hydrogens() for m in mols]
    return mols


def _cmd_voxelize(args) -> int:
    from .core.config import GridSpec
    from .parallel import StreamingVoxelizer
    from .utils.timing import enable_compilation_cache
    from .viz.dx import write_channels_dx

    enable_compilation_cache(".jax_cache")
    paths = [Path(p) for p in args.input]
    path = paths[0]
    symbols = [s.strip() for s in args.channels.split(",")]
    spec = GridSpec(resolution=args.resolution, dimension=args.dimension)

    # Fast lane: SDF + atom-type channels goes through the vectorized feeder
    # (native parse -> columnar batch assembly, data/feed.py) with no
    # per-molecule Python.  Bond channels / PDB / multi-file grid output use
    # the maker path (each feeder pads its own tail, so multi-file feeder
    # streams would interleave padding mid-stream in the grid record).
    use_feeder = (
        len(paths) == 1 and _is_sdf(path) and not args.bonds and args.center == "auto"
    )

    if args.throughput:
        if not all(_is_sdf(p) for p in paths) or args.bonds or args.center != "auto":
            raise SystemExit("--throughput needs the SDF fast lane (no --bonds, --center auto)")
        return _run_throughput(args, spec, paths, symbols)

    # --batch default is mode-dependent (64 for grids, 4096 for --throughput);
    # None = unset so an explicit --batch 64 is honored in every mode.
    # Depths beyond the kernel's VMEM budget (--dimension 256+) assemble the
    # full grid from depth slabs with bounded memory (ops/batch.py); the
    # default batch also drops so a batch of 256^3 grids fits on host/device.
    from .ops.batch import pick_slab_depth

    slab_depth = pick_slab_depth(spec, len(symbols) + (1 if args.unknown else 0))
    batch_size = args.batch if args.batch is not None else (4 if slab_depth else 64)
    sv = StreamingVoxelizer(
        spec,
        batch_size=batch_size,
        slab_depth=slab_depth,
        density_type=args.density,
        sigma=args.sigma,
        radii=args.radii,
        random_translation=args.random_translation,
        random_rotation=args.random_rotation,
        seed=args.seed,
        out_dtype=args.out_dtype,
        presorted=args.presort and use_feeder,  # maker-path batches are unsorted
    )

    feeder = None
    mols = None
    if use_feeder:
        from .data.feed import SDFBatchFeeder

        feeder = SDFBatchFeeder(
            path, symbols,
            batch_size=batch_size, unknown=args.unknown,
            keep_hydrogens=args.hydrogens, workers=args.workers,
            presort=args.presort, spec=spec if args.presort else None,
        )
    else:
        mols = [m for p in paths for m in _load_molecules(p, args.hydrogens)]

    def batches():
        if feeder is not None:
            yield from feeder
        else:
            from .data import AtomTypeGetter, BondTypeGetter, MolPointCloudMaker
            from .data.pipeline import iter_batches

            atom_getter = AtomTypeGetter(symbols, unknown=args.unknown)
            bond_getter = BondTypeGetter.default() if args.bonds else None
            maker = MolPointCloudMaker(atom_getter, bond_getter, channel_type="features")

            def clouds():
                for mol in mols:
                    coords, feats = maker.run(mol)
                    center = coords.mean(0) if args.center == "auto" else np.zeros(3)
                    yield (coords - center).astype(np.float32), feats.astype(np.float32)

            yield from iter_batches(clouds(), batch_size)

    channel_names = symbols + (["Unknown"] if args.unknown else [])
    if args.bonds:
        channel_names += ["SingleBond", "DoubleBond", "TripleBond", "AromaticBond"]

    if args.output:
        return _run_grids_streamed(args, sv, batches, feeder, mols, channel_names)

    results = []
    num_atoms = []
    t0 = time.time()
    stats = sv.run_batches(
        batches(),
        lambda images, batch: (results.append(np.asarray(images)), num_atoms.append(batch.num_atoms)),
    )
    if not results:
        raise SystemExit("no molecules parsed")
    # Truncate by real record slots, not by non-empty-molecule count: a 0-atom
    # record (e.g. all-H after filtering) occupies a mid-stream slot, so
    # stats.molecules undercounts and would drop the last real grid
    # (ADVICE r2).  Only the feeder's tail padding is virtual.
    n_real = feeder.records_fed if feeder is not None else len(mols)
    grids = np.concatenate(results, axis=0)[:n_real]
    print(
        f"voxelized {stats.molecules} molecules ({n_real} records) in {time.time() - t0:.2f}s "
        f"-> grids {grids.shape}",
        file=sys.stderr,
    )

    if args.dx:
        channel_dict = {name: grids[0, i] for i, name in enumerate(channel_names)}
        paths = write_channels_dx(args.dx, channel_dict, [0, 0, 0], args.resolution)
        print(f"wrote {len(paths)} .dx volumes to {args.dx}", file=sys.stderr)
    if not args.dx:
        print(json.dumps({"molecules": int(stats.molecules), "shape": list(grids.shape)}))
    return 0


def _run_grids_streamed(args, sv, batches, feeder, mols, channel_names) -> int:
    """Write grids as a sharded store with bounded host memory.

    The accumulate-then-concatenate path needed O(file) host RAM (a 50k-mol
    64^3 x 4ch f32 run = ~52 GB).  Here each device batch is flushed to its
    own ``.npy`` shard as soon as it lands, so peak memory is O(batch);
    ``manifest.json`` + ``channels.json`` describe the store and
    ``viz.shards.read_grid_shards`` / ``GridShardReader`` reassemble it.
    A single ``.npz`` output stays available for small runs (< --npz-limit
    molecules) since it is the more convenient artifact.
    """
    import time as _time

    from .data.gridstore import GridShardWriter

    t0 = _time.time()
    out = Path(args.output)
    as_shards = out.suffix not in (".npz",) or args.shards
    if not as_shards:
        # small-run convenience path: one .npz (bounded by --npz-limit)
        results = []
        count = 0

        def consume(images, batch):
            nonlocal count
            results.append(np.asarray(images))
            count += images.shape[0]
            if count > args.npz_limit:
                raise SystemExit(
                    f"more than --npz-limit={args.npz_limit} molecules; "
                    "write a sharded store instead (-o outdir/ or --shards)"
                )

        stats = sv.run_batches(batches(), consume)
        if not results:
            raise SystemExit("no molecules parsed")
        n_real = feeder.records_fed if feeder is not None else len(mols)
        grids = np.concatenate(results, axis=0)[:n_real]
        np.savez_compressed(
            args.output,
            grids=grids,
            channels=np.asarray(channel_names),
            resolution=np.float32(args.resolution),
            dimension=np.int32(args.dimension),
        )
        out_path = args.output if args.output.endswith(".npz") else args.output + ".npz"
        print(
            f"voxelized {stats.molecules} molecules ({n_real} records) in "
            f"{_time.time() - t0:.2f}s -> {out_path}",
            file=sys.stderr,
        )
        _maybe_dx(args, grids[0] if len(grids) else None, channel_names)
        return 0

    writer = GridShardWriter(
        out, channel_names, resolution=args.resolution, dimension=args.dimension
    )
    with writer:
        stats = sv.run_batches(
            batches(), lambda images, batch: writer.append(np.asarray(images), batch.num_atoms)
        )
        n_real = feeder.records_fed if feeder is not None else len(mols)
        writer.finalize(n_real)
    print(
        f"voxelized {stats.molecules} molecules ({n_real} records) in "
        f"{_time.time() - t0:.2f}s -> {writer.num_shards} shards under {out}",
        file=sys.stderr,
    )
    if args.dx and n_real:
        from .data.gridstore import GridShardReader

        _maybe_dx(args, GridShardReader(out)[0], channel_names)
    return 0


def _maybe_dx(args, grid0, channel_names) -> None:
    if not args.dx or grid0 is None:
        return
    from .viz.dx import write_channels_dx

    grid0 = np.asarray(grid0, np.float32)
    channel_dict = {name: grid0[i] for i, name in enumerate(channel_names)}
    paths = write_channels_dx(args.dx, channel_dict, [0, 0, 0], args.resolution)
    print(f"wrote {len(paths)} .dx volumes to {args.dx}", file=sys.stderr)


def _run_throughput(args, spec, paths, symbols) -> int:
    """End-to-end stream-from-disk throughput: parse + batch + H2D + voxelize.

    The production-shaped pipeline: the vectorized feeder emits COMPACT
    superbatches (int8 types, no one-hot — data/feed.py) and the fused scan
    step voxelizes a whole superbatch per dispatch, reducing each chunk's
    grids to a scalar on device (parallel/stream.py _fused_scan_step).  Host
    cost per superbatch is 3 transfers + 1 dispatch, which matters: through
    the axon tunnel every host->device op costs ~1-3 ms.

    The timed window ends at ONE final scalar fetch — the only trustworthy
    fence, since the tunnel defers execution past block_until_ready
    (CLAUDE.md).  Each chunk's checksum depends on fresh PRNG keys, so
    nothing folds or skips.  Two passes: the first warms the jit cache.
    """
    from .data.feed import SDFBatchFeeder, prefetch_iter
    from .parallel.stream import stream_checksum

    nch = len(symbols) + (1 if args.unknown else 0)
    rbt = None
    if args.radii_by_type:
        rbt = tuple(float(x) for x in args.radii_by_type.split(","))
        if len(rbt) != nch:
            raise SystemExit(
                f"--radii-by-type needs {nch} values (one per channel incl. Unknown), got {len(rbt)}"
            )

    # mode-dependent default: measured sweep on-chip says superbatch 4096
    # (13 overlap units on 50k mols) > 8192 > 16384; an explicit --batch wins
    batch = args.batch if args.batch is not None else 4096
    chunk = min(args.chunk, batch)
    superbatch = max(batch, chunk) // chunk * chunk

    def one_pass(seed):
        feeders = [
            SDFBatchFeeder(
                p, symbols,
                batch_size=superbatch, unknown=args.unknown,
                keep_hydrogens=args.hydrogens, workers=args.workers, compact=True,
                presort=args.presort, spec=spec if args.presort else None,
            )
            for p in paths
        ]
        t0 = time.time()
        # --wire: the feeder's all-native wire path (parse, assemble, presort,
        # quantize all in GIL-releasing C).  No extra prefetch hop here —
        # stream_checksum's staging thread already overlaps assembly with
        # dispatch, and a second hop only adds GIL churn (measured -3%).
        # Multiple input files chain seamlessly (each pads its own tail).
        def chained():
            for f in feeders:
                yield from (f.iter_wire(spec) if args.wire else iter(f))

        src = chained() if args.wire else prefetch_iter(chained())
        stats, checksum = stream_checksum(
            src, spec,
            chunk=chunk, density_type=args.density, sigma=args.sigma,
            radii=args.radii, radii_by_type=rbt,
            random_translation=args.random_translation,
            random_rotation=args.random_rotation, out_dtype=args.out_dtype,
            seed=seed, presorted=args.presort, wire=args.wire,
            witness=not args.full_read, prefetch_depth=args.prefetch_depth,
        )
        return stats, time.time() - t0, checksum

    print("warmup pass (compiles cached under .jax_cache) ...", file=sys.stderr)
    one_pass(0)
    # the timed window per pass is short (~1 s on a 50k library), so single
    # passes swing 5-20% with host scheduling weather (BENCHMARKS.md stream
    # note); --trials N reports the best pass plus the full spread
    results = [one_pass(1 + t) for t in range(max(args.trials, 1))]
    rates = [s.molecules / w for s, w, _ in results]
    best = int(np.argmax(rates))
    stats, wall, checksum = results[best]
    payload = {
        "metric": "stream_from_disk_mols_per_s",
        "value": round(stats.molecules / wall, 1),
        "unit": "mols/s",
        "molecules": int(stats.molecules),
        "superbatches": int(stats.batches),
        "superbatch": superbatch,
        "chunk": chunk,
        "wall_s": round(wall, 3),
        "out_dtype": args.out_dtype,
        "density": args.density,
        "dimension": args.dimension,
        "workers": args.workers,
        "wire": bool(args.wire),
        "checksum": checksum,
    }
    if len(results) > 1:
        payload["trials"] = [round(r, 1) for r in rates]
        payload["median_mols_per_s"] = round(float(np.median(rates)), 1)
    print(json.dumps(payload))
    return 0


def _cmd_bench(args) -> int:
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path(str(Path(__file__).parent.parent / "bench.py"), run_name="__main__")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="molvoxel-tpu", description="TPU-native molecular voxelization")
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("info", help="environment / backend report")

    pv = sub.add_parser("voxelize", help="voxelize molecules from SDF/PDB")
    pv.add_argument("input", nargs="+", help="input file(s): .sdf/.sdf.gz (multi-record ok), .pdb, .xyz, .mol2")
    pv.add_argument("-o", "--output", help="output .npz (grids, channel names)")
    pv.add_argument("--dx", help="directory for per-channel OpenDX volumes (first molecule)")
    pv.add_argument("--dimension", type=int, default=64)
    pv.add_argument("--resolution", type=float, default=0.5)
    pv.add_argument("--density", default="gaussian", choices=["gaussian", "binary", "gaussian_notrunc"])
    pv.add_argument("--sigma", type=float, default=0.5)
    pv.add_argument("--radii", type=float, default=1.0)
    pv.add_argument("--radii-by-type", default=None, metavar="R1,R2,...",
                    help="per-channel radii for --throughput (one per channel incl. "
                    "Unknown); gathered in-graph from the type lane, zero extra "
                    "wire bytes")
    pv.add_argument("--channels", default="C,N,O,S", help="comma-separated element channels")
    pv.add_argument("--unknown", action="store_true", help="add a catch-all Unknown channel")
    pv.add_argument("--bonds", action="store_true", help="add bond-midpoint channels")
    pv.add_argument("--hydrogens", action="store_true", help="keep hydrogens")
    pv.add_argument("--center", default="auto", choices=["auto", "origin"])
    pv.add_argument(
        "--batch", type=int, default=None,
        help="batch size (default: 64 for grids output, 4096 superbatch for --throughput)",
    )
    pv.add_argument("--random-translation", type=float, default=0.0)
    pv.add_argument("--random-rotation", action="store_true")
    pv.add_argument("--seed", type=int, default=0)
    pv.add_argument("--workers", type=int, default=2, help="parser threads for the vectorized SDF feeder")
    # defaults from the r5 witness-ladder sweep (docs/DESIGN.md 5a): chunk
    # 1024 + depth 4 measured 74.7k vs 65-69k at the old 256/2 on the
    # 50k-ligand fixture; chunk is clamped to the superbatch size
    pv.add_argument("--chunk", type=int, default=1024, help="in-graph scan chunk for --throughput")
    pv.add_argument("--prefetch-depth", type=int, default=4,
                    help="--throughput --wire: staged superbatches in flight ahead of dispatch")
    pv.add_argument(
        "--out-dtype", default="float32",
        choices=["float32", "bfloat16", "float8_e4m3fn"],
        help="grid dtype: f32 = parity lane, bf16 = production training lane "
        "(2^-8 rel), fp8 e4m3 = aggressive training lane (2^-4 rel)",
    )
    pv.add_argument(
        "--presort",
        action="store_true",
        help="Morton-sort atoms on the host (skips the in-graph sort; pays off for >128-atom buckets)",
    )
    pv.add_argument(
        "--shards",
        action="store_true",
        help="force the sharded bounded-memory grid store even for .npz-suffixed -o paths",
    )
    pv.add_argument(
        "--npz-limit", type=int, default=20000,
        help="max molecules for single-.npz output; larger runs must use the sharded store",
    )
    pv.add_argument(
        "--throughput",
        action="store_true",
        help="measure end-to-end stream-from-disk mols/s (grids consumed on device, not saved)",
    )
    pv.add_argument(
        "--wire",
        action="store_true",
        help="--throughput: ship superbatches as ONE int16 fixed-point array (~0.5 mÅ) "
        "staged from a prefetch thread (8 B/atom, 1 transfer instead of 3)",
    )
    pv.add_argument(
        "--full-read",
        action="store_true",
        help="--throughput: consume every grid with a full on-device sum instead of the "
        "witness read — bills an extra HBM re-read of all grids (the pre-r4 protocol)",
    )

    pv.add_argument(
        "--trials", type=int, default=1,
        help="--throughput: timed passes after warmup; reports the best plus the "
        "spread (single ~1 s passes swing 5-20%% with host scheduling weather)",
    )

    sub.add_parser("bench", help="run the headline benchmark")

    args = parser.parse_args(argv)
    if args.command == "info":
        return _cmd_info(args)
    if args.command == "voxelize":
        return _cmd_voxelize(args)
    if args.command == "bench":
        return _cmd_bench(args)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())

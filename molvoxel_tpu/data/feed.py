"""Vectorized host feed: whole SDF files -> padded device batches.

The reference adapts one molecule per Python call (RDKit mol -> point cloud ->
forward, /root/reference/molvoxel/etc/rdkit/wrapper.py:22-45) — fine at
~100 mols/s, hopeless against a TPU kernel that voxelizes ~100k mols/s.  This
module is the production feeder: the native C++ parser emits a whole file as
flat column arrays (native/fastparse.py FlatMolecules) and everything
downstream — element typing, hydrogen filtering, centering, one-hot weight
assembly, padding — is a handful of numpy passes over those columns.  No code
path in the hot feed loops over molecules or atoms in Python.

Two layers:

- ``flat_clouds`` / ``assemble_batches``: pure functions, FlatMolecules ->
  FlatClouds (column form) -> PaddedBatch views.
- ``SDFBatchFeeder``: a record-aligned shard splitter + thread pool that
  parses shards concurrently (the ctypes call releases the GIL) and yields
  PaddedBatches in file order with bounded prefetch, carrying ragged
  molecule tails across shard boundaries.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Iterator, Sequence
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from ..core.config import small_atom_bucket
from .pipeline import PaddedBatch

__all__ = [
    "FlatClouds",
    "flat_clouds",
    "assemble_batches",
    "SDFBatchFeeder",
    "map_symbols",
    "morton_presort",
    "prefetch_iter",
    "wire_scale",
    "pack_wire",
]


def prefetch_iter(it, depth: int = 2):
    """Run an iterator in a daemon thread with a bounded queue.

    Decouples the producer (batch assembly — numpy work that holds the GIL
    in bursts) from the consumer (device dispatch — mostly I/O waiting on the
    tunnel): the next superbatch is assembled while the device crunches the
    previous one.  Exceptions propagate to the consumer.  If the consumer
    abandons the generator early (``close()`` / GC), the worker notices via a
    cancellation flag and exits instead of blocking forever on a full queue.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    cancelled = threading.Event()

    def put(obj) -> bool:
        while not cancelled.is_set():
            try:
                q.put(obj, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in it:
                if not put(item):
                    return
            put(sentinel)
        except BaseException as exc:  # noqa: BLE001 — re-raised on the consumer side
            put(exc)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        cancelled.set()


def map_symbols(symbols: np.ndarray, symbol_table: dict[str, int], unknown: int | None = None) -> np.ndarray:
    """Vectorized element-symbol -> channel-index mapping.

    ``symbols`` is the parser's ``(N,) |S4`` column; comparing the 4-byte
    fields as uint32 integers keeps the whole mapping in a few numpy passes
    (sorted-key searchsorted), independent of the table size.
    """
    sym_u32 = np.ascontiguousarray(symbols).view(np.uint32)
    keys_b = np.array([k.encode().ljust(4, b"\0") for k in symbol_table], dtype="|S4")
    keys = keys_b.view(np.uint32)
    vals = np.array(list(symbol_table.values()), dtype=np.int32)
    order = np.argsort(keys)
    keys, vals = keys[order], vals[order]
    idx = np.minimum(np.searchsorted(keys, sym_u32), len(keys) - 1).astype(np.int32)
    hit = keys[idx] == sym_u32
    if unknown is None:
        if not hit.all():
            bad = np.asarray(symbols)[~hit][0].decode()
            raise KeyError(f"unknown element symbol {bad!r}")
        return vals[idx]
    return np.where(hit, vals[idx], np.int32(unknown))


@dataclasses.dataclass
class FlatClouds:
    """A chunk of the molecule stream in column form — the zero-object
    handoff between parse workers and the batch assembler."""

    coords: np.ndarray  # (TA, 3) float32, concatenated over molecules
    types: np.ndarray  # (TA,) int32 channel index per atom
    counts: np.ndarray  # (M,) int64 atoms per molecule

    @property
    def num_molecules(self) -> int:
        return len(self.counts)

    def slice_molecules(self, m0: int, m1: int) -> "FlatClouds":
        off = np.concatenate([[0], np.cumsum(self.counts)])
        a0, a1 = int(off[m0]), int(off[m1])
        return FlatClouds(self.coords[a0:a1], self.types[a0:a1], self.counts[m0:m1])


def concat_flat_clouds(parts: Sequence[FlatClouds]) -> FlatClouds:
    parts = [p for p in parts if p.num_molecules > 0]
    if len(parts) == 1:
        return parts[0]
    if not parts:
        return FlatClouds(
            np.zeros((0, 3), np.float32), np.zeros((0,), np.int32), np.zeros((0,), np.int64)
        )
    return FlatClouds(
        np.concatenate([p.coords for p in parts], axis=0),
        np.concatenate([p.types for p in parts]),
        np.concatenate([p.counts for p in parts]),
    )


def flat_clouds(
    flat,
    symbol_table: dict[str, int],
    *,
    unknown: int | None = None,
    keep_hydrogens: bool = False,
) -> FlatClouds:
    """FlatMolecules -> FlatClouds, fully vectorized.

    Hydrogen filtering is a boolean mask + bincount recount (the reference
    drops nothing — its RDKit mols usually carry no explicit H; our built-in
    parsers see every atom in the file, so the feed filters by default).
    Atoms whose symbol is missing from ``symbol_table`` raise unless
    ``unknown`` gives them a catch-all channel (reference unknown-channel
    semantics, /root/reference/molvoxel/etc/rdkit/base.py:27-43).
    """
    counts = np.diff(flat.atom_offsets)
    coords = flat.coords
    symbols = flat.symbols
    if not keep_hydrogens:
        keep = (symbols != b"H") & (symbols != b"D")  # parsers.SimpleMolecule.without_hydrogens rule
        if not keep.all():
            mol_idx = np.repeat(np.arange(len(counts)), counts)
            counts = np.bincount(mol_idx[keep], minlength=len(counts)).astype(np.int64)
            coords = coords[keep]
            symbols = symbols[keep]
    types = map_symbols(symbols, symbol_table, unknown)
    return FlatClouds(np.ascontiguousarray(coords, np.float32), types, counts)


def _group_centers(coords: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """(M, 3) per-molecule coordinate means via one cumsum (no reduceat
    zero-length quirks, no Python loop)."""
    cs = np.concatenate([np.zeros((1, 3), np.float64), np.cumsum(coords, axis=0, dtype=np.float64)])
    off = np.concatenate([[0], np.cumsum(counts)])
    sums = cs[off[1:]] - cs[off[:-1]]
    return (sums / np.maximum(counts, 1)[:, None]).astype(np.float32)


def assemble_batches(
    fc: FlatClouds,
    num_channels: int,
    batch_size: int,
    *,
    bucket: int | None = None,
    center: bool = True,
    radii_by_type: np.ndarray | None = None,
    pad_tail: bool = False,
    compact: bool = False,
) -> tuple[list[PaddedBatch], FlatClouds]:
    """Assemble whole batches from a FlatClouds chunk; return the ragged tail.

    One vectorized scatter builds every batch of the chunk at once:
    ``rows = repeat(arange(M), counts)`` and ``slots = arange(TA) -
    repeat(offsets, counts)`` index straight into the padded ``(M, Vp, ...)``
    arrays; one-hot weights land via ``weights[rows, slots, types] = 1``.
    The returned batches are views into the chunk-wide arrays (no copies).

    With ``pad_tail`` the final short batch is emitted padded with empty
    molecules (mask all-False) and the returned carry is empty — end-of-file
    behavior matching data/pipeline.py iter_batches.

    ``compact`` skips the one-hot expansion: batches carry (B, Vp) int8
    channel indices (-1 = padding) instead of (B, Vp, C) f32 weights — the
    minimal-transfer form for the fused stream driver, which rebuilds the
    one-hot in-graph.
    """
    m = fc.num_molecules
    nb = m // batch_size
    mg = nb * batch_size
    if pad_tail and mg < m:
        nb += 1
        mg = nb * batch_size
    if nb == 0:
        return [], fc

    use = fc.slice_molecules(0, min(mg, m))
    carry = fc.slice_molecules(min(mg, m), m)
    counts = use.counts
    if len(counts) < mg:  # pad_tail: virtual empty molecules
        counts = np.concatenate([counts, np.zeros(mg - len(counts), np.int64)])

    vmax = int(counts.max(initial=0))
    vp = bucket if bucket is not None else small_atom_bucket(max(vmax, 1))
    if vp < vmax:
        raise ValueError(f"bucket {vp} smaller than max atom count {vmax}")

    off = np.concatenate([[0], np.cumsum(counts)])
    rows = np.repeat(np.arange(mg), counts)
    slots = np.arange(len(use.coords)) - np.repeat(off[:-1], counts)

    coords_p = np.zeros((mg, vp, 3), np.float32)
    mask_p = np.zeros((mg, vp), bool)
    coords_p[rows, slots] = use.coords
    mask_p[rows, slots] = True
    weights_p = types_p = None
    if compact:
        assert num_channels <= 127, "compact int8 types require C <= 127"
        types_p = np.full((mg, vp), -1, np.int8)
        types_p[rows, slots] = use.types.astype(np.int8)
    else:
        weights_p = np.zeros((mg, vp, num_channels), np.float32)
        weights_p[rows, slots, use.types] = 1.0

    radii_p = None
    if radii_by_type is not None:
        radii_p = np.ones((mg, vp), np.float32)
        radii_p[rows, slots] = np.asarray(radii_by_type, np.float32)[use.types]

    centers_p = _group_centers(use.coords, counts) if center else None
    num_atoms = counts.astype(np.int32)

    s = lambda arr, i: None if arr is None else arr[i * batch_size : (i + 1) * batch_size]
    batches = [
        PaddedBatch(
            coords_p[i * batch_size : (i + 1) * batch_size],
            s(weights_p, i),
            mask_p[i * batch_size : (i + 1) * batch_size],
            s(radii_p, i),
            s(centers_p, i),
            num_atoms[i * batch_size : (i + 1) * batch_size],
            types=s(types_p, i),
            num_channels=num_channels if compact else None,
        )
        for i in range(nb)
    ]
    return batches, carry


# 3-stride bit-interleave of a 5-bit value: PART[v] has bit i of v at bit 3i.
_MORTON_PART_TABLE = np.zeros(32, np.int32)
for _i in range(5):
    _MORTON_PART_TABLE |= ((np.arange(32) >> _i) & 1).astype(np.int32) << (3 * _i)


def morton_presort(batch: PaddedBatch, spec) -> PaddedBatch:
    """Host-side Morton (Z-order) atom sort of a padded batch.

    numpy mirror of the kernel's in-graph sort (ops/pallas_deposit.py
    morton_keys): bit-interleaved 5-bit cell keys, padded atoms keyed last.
    Rigid transforms preserve spatial locality, so sorting once here lets
    every augmented device pass run with ``presorted=True`` — the in-graph
    argsort was ~200 us/mol of the protein path (docs/DESIGN.md).
    Only the >128-atom regime benefits; small-molecule batches can skip it.
    """
    bits = 5
    cells = (1 << bits) - 1
    centered = batch.coords if batch.centers is None else batch.coords - batch.centers[:, None, :]
    scale = cells / max(spec.width, 1e-6)
    cell = np.clip((centered - spec.lower_bound) * scale, 0, cells).astype(np.int32)
    # Bit-interleave via a 32-entry table (one gather per axis) instead of 15
    # shift/mask passes over the full (B, Vp) array — the key build was ~half
    # the presort cost on protein-scale batches, and the presort runs on the
    # host data path where it contends with the parser threads for CPU.
    part = _MORTON_PART_TABLE
    key = (part[cell[..., 0]] << 2) | (part[cell[..., 1]] << 1) | part[cell[..., 2]]
    key = np.where(batch.mask, key, np.int32(1 << 30))
    b, vp = key.shape
    order = np.argsort(key, axis=1, kind="stable")
    # One flat gather per array: take_along_axis pays its fancy-index setup
    # per call; a precomputed flat index makes each permutation a plain take.
    flat = (order + np.arange(b, dtype=np.intp)[:, None] * vp).ravel()
    take = lambda a: None if a is None else a.reshape(b * vp, *a.shape[2:])[flat].reshape(a.shape)
    return PaddedBatch(
        take(batch.coords),
        take(batch.weights),
        take(batch.mask),
        take(batch.radii),
        batch.centers,
        batch.num_atoms,
        types=take(batch.types),
        num_channels=batch.num_channels,
    )


# -------------------------------------------------------------- wire format


def wire_scale(spec) -> float:
    """Fixed-point scale (voxels of 1/scale Å) for the int16 wire format.

    Largest power of two whose int16 range covers the grid half-width plus an
    8 Å margin (radius + random translation + slack): 64³ @ 0.5 Å -> 1024
    (~0.5 mÅ quantization step), 128³ -> 512.  Power-of-two scales make the
    dequantize multiply exact in f32.
    """
    import math

    need = spec.width / 2.0 + 8.0
    return float(2 ** int(math.floor(math.log2(32767.0 / need))))


def assemble_wire(
    fc: FlatClouds,
    batch_size: int,
    *,
    num_channels: int,
    scale: float,
    spec,
    bucket: int | None = None,
    presort: bool = False,
    pad_tail: bool = False,
) -> tuple[list[tuple[np.ndarray, np.ndarray]], FlatClouds]:
    """FlatClouds -> whole wire batches ((B, Vp, 4) int16, (B,) num_atoms).

    The all-native fast path of the streaming assembly: one GIL-releasing
    C pass (native/fastparse.cpp wire_assemble) replaces assemble_batches +
    morton_presort + pack_wire — per molecule it centers, optionally
    Morton-sorts, quantizes, and writes the wire rows directly.  Falls back
    to composing those numpy stages when the native lib is absent; results
    are identical either way (tests/test_feed.py).  Returns (batches, carry)
    with the same carry semantics as assemble_batches.
    """
    m = fc.num_molecules
    nb = m // batch_size
    mg = nb * batch_size
    if pad_tail and mg < m:
        nb += 1
        mg = nb * batch_size
    if nb == 0:
        return [], fc

    use = fc.slice_molecules(0, min(mg, m))
    carry = fc.slice_molecules(min(mg, m), m)
    counts = use.counts
    if len(counts) < mg:  # pad_tail: virtual empty molecules
        counts = np.concatenate([counts, np.zeros(mg - len(counts), np.int64)])
    vmax = int(counts.max(initial=0))
    vp = bucket if bucket is not None else small_atom_bucket(max(vmax, 1))
    if vp < vmax:
        raise ValueError(f"bucket {vp} smaller than max atom count {vmax}")

    from ..native.fastparse import wire_assemble_native

    cells = 31
    out = wire_assemble_native(
        use.coords, use.types, counts, vp, scale,
        presort and vp > 128, float(spec.lower_bound), cells / max(spec.width, 1e-6), cells,
    )
    if out is not None:
        wire, num_atoms = out
    else:  # numpy fallback: compose the existing stages
        fc_pad = use if len(counts) == use.num_molecules else FlatClouds(use.coords, use.types, counts)
        batches, _ = assemble_batches(fc_pad, num_channels, batch_size, bucket=vp, compact=True)
        parts_w, parts_n = [], []
        for b in batches:
            if presort and b.padded_atoms > 128:
                b = morton_presort(b, spec)
            w = pack_wire(b, scale)
            # match the native padding convention: padded slots park off-box
            # (+32767 steps >= 8 A beyond the grid) so the kernel's plane
            # ranges prune them; pack_wire alone leaves them at -center
            w[w[..., 3] == -1] = np.array([32767, 32767, 32767, -1], np.int16)
            parts_w.append(w)
            parts_n.append(b.num_atoms)
        wire = np.concatenate(parts_w) if parts_w else np.zeros((0, vp, 4), np.int16)
        num_atoms = np.concatenate(parts_n) if parts_n else np.zeros((0,), np.int32)

    return (
        [
            (wire[i * batch_size : (i + 1) * batch_size],
             num_atoms[i * batch_size : (i + 1) * batch_size])
            for i in range(nb)
        ],
        carry,
    )


def pack_wire(batch: PaddedBatch, scale: float) -> np.ndarray:
    """Compact batch -> ONE (B, Vp, 4) int16 wire array [x_q, y_q, z_q, type].

    The transfer ladder's dominant cost through the axon tunnel is per-op tax
    plus bytes: three arrays (f32 coords 12 B/atom + int8 types + f32 centers)
    become one 8 B/atom array.  Coords are centered host-side (the same f32
    subtract the device would do) and quantized at ``scale`` steps/Å — ~0.5 mÅ
    absolute error, far below the bf16 grid quantization floor (2⁻⁸ relative)
    the streaming lane already runs at.  Types ride the 4th int16 lane
    (-1 = padding).  Atoms are clipped to the int16 range; anything that far
    off-box (≥ half-width + 8 Å) deposits nothing regardless.
    """
    if batch.types is None:
        raise ValueError("pack_wire needs a compact batch (types present)")
    coords = batch.coords
    if batch.centers is not None:
        coords = coords - batch.centers[:, None, :]
    q = np.clip(np.rint(coords * scale), -32767, 32767).astype(np.int16)
    wire = np.empty((*batch.types.shape, 4), np.int16)
    wire[..., :3] = q
    wire[..., 3] = batch.types
    return wire


# ------------------------------------------------------------------- feeder


def _record_shards(buf: bytes, n: int) -> list[tuple[int, int]]:
    """Split an SDF buffer into <=n byte ranges on record boundaries.

    A record ends at a line starting with ``$$$$`` (the same rule as the C++
    scanner, native/fastparse.cpp skip_to_record_end); each cut lands just
    after that line's newline so every shard is a valid SDF buffer.
    """

    def next_end(pos: int) -> int:
        while True:
            i = buf.find(b"$$$$", pos)
            if i < 0:
                return len(buf)
            if i == 0 or buf[i - 1 : i] == b"\n":
                j = buf.find(b"\n", i)
                return len(buf) if j < 0 else j + 1
            pos = i + 4

    pts = [0]
    step = max(len(buf) // max(n, 1), 1)
    for k in range(1, n):
        cut = next_end(k * step)
        if cut > pts[-1]:
            pts.append(cut)
        if cut >= len(buf):
            break
    if pts[-1] < len(buf):
        pts.append(len(buf))
    return [(pts[i], pts[i + 1]) for i in range(len(pts) - 1)]


def _parse_shard_python(chunk: bytes, symbol_table, unknown, keep_hydrogens) -> FlatClouds:
    """Pure-Python fallback shard parser (native lib absent)."""
    from .parsers import iter_sdf_lines

    parts = []
    for mol in iter_sdf_lines(chunk.decode("utf-8", errors="replace").splitlines()):
        syms = np.array([s.encode().ljust(4, b"\0") for s in mol.symbols], dtype="|S4")
        if len(syms) == 0:
            parts.append(FlatClouds(np.zeros((0, 3), np.float32), np.zeros(0, np.int32), np.zeros(1, np.int64)))
            continue
        # same rule as flat_clouds / SimpleMolecule.without_hydrogens: H and D
        keep = np.ones(len(syms), bool) if keep_hydrogens else (syms != b"H") & (syms != b"D")
        types = map_symbols(syms[keep], symbol_table, unknown)
        parts.append(
            FlatClouds(
                np.ascontiguousarray(mol.coords[keep], np.float32),
                types,
                np.array([int(keep.sum())], np.int64),
            )
        )
    return concat_flat_clouds(parts)


class SDFBatchFeeder:
    """Stream a (large, multi-record) SDF file as PaddedBatches.

    The file is split into record-aligned shards, parsed concurrently by a
    small thread pool (the native parse is one GIL-releasing C++ call per
    shard), and assembled into fixed-shape batches in file order.  Bounded
    prefetch: at most ``workers + 1`` shards are in flight, so memory stays
    O(shard), not O(file).

    Channel semantics match the CLI/reference atom-type path: one channel per
    symbol in ``symbols`` (plus a catch-all when ``unknown``), one-hot
    weights — the MXU form of the reference's type scatter.
    """

    def __init__(
        self,
        path: str | Path,
        symbols: Sequence[str],
        *,
        batch_size: int = 64,
        unknown: bool = False,
        keep_hydrogens: bool = False,
        bucket: int | None = None,
        center: bool = True,
        radii_by_type: np.ndarray | None = None,
        workers: int = 2,
        shards: int | None = None,
        target_shard_bytes: int = 8 << 20,
        compact: bool = False,
        presort: bool = False,
        spec=None,
        shuffle_seed: int | None = None,
        span_offset: int = 0,
        span_stride: int = 1,
    ):
        self.path = Path(path)
        self.symbols = list(symbols)
        self.symbol_table = {s: i for i, s in enumerate(self.symbols)}
        self.unknown = len(self.symbols) if unknown else None
        self.num_channels = len(self.symbols) + (1 if unknown else 0)
        self.batch_size = batch_size
        self.keep_hydrogens = keep_hydrogens
        self.bucket = bucket
        self.center = center
        self.radii_by_type = radii_by_type
        self.workers = max(1, workers)
        self.compact = compact
        self.shards = shards
        self.target_shard_bytes = target_shard_bytes
        if presort and spec is None:
            raise ValueError("presort=True needs spec= (the GridSpec sets the Morton cell size)")
        self.presort = presort
        self.spec = spec
        # Shard-level epoch shuffle + disjoint striping for parallel loaders:
        # every reader shuffles the span list with the SAME seed, then takes
        # spans[offset::stride] — readers with distinct offsets and a common
        # stride cover the file exactly once between them (the torch
        # DataLoader num_workers>0 contract, interop.VoxelGridDataset).
        # Shuffle granularity is the record-aligned shard (records within a
        # shard stay in file order); lower target_shard_bytes for finer mixing.
        self.shuffle_seed = shuffle_seed
        self.span_offset = span_offset
        self.span_stride = max(1, span_stride)
        self.molecules_fed = 0  # molecules with >= 1 atom (what a consumer voxelizes)
        self.records_fed = 0  # real file records emitted as batch slots (incl. 0-atom)

    def _parse_shard(self, chunk: bytes) -> FlatClouds:
        from ..native.fastparse import parse_sdf_flat

        flat = parse_sdf_flat(chunk)
        if flat is None:
            return _parse_shard_python(chunk, self.symbol_table, self.unknown, self.keep_hydrogens)
        return flat_clouds(
            flat, self.symbol_table, unknown=self.unknown, keep_hydrogens=self.keep_hydrogens
        )

    def _pump(self) -> Iterator[tuple[FlatClouds, bool]]:
        """Shard-parallel parse pump: yields (parsed chunk, is-last) in file
        order with at most ``workers + 1`` shards in flight."""
        buf = self.path.read_bytes()
        if self.path.suffix == ".gz":  # .sdf.gz — the common library distribution form
            import gzip

            buf = gzip.decompress(buf)
        n_shards = self.shards
        if n_shards is None:
            n_shards = max(self.workers, -(-len(buf) // self.target_shard_bytes))
        spans = _record_shards(buf, n_shards)
        if self.shuffle_seed is not None:
            # deterministic by seed so striped readers agree on the permutation
            np.random.default_rng(self.shuffle_seed).shuffle(spans)
        spans = spans[self.span_offset :: self.span_stride]
        self.molecules_fed = 0
        self.records_fed = 0

        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            pending = []
            idx = 0

            def submit_up_to(limit: int):
                nonlocal idx
                while idx < len(spans) and len(pending) < limit:
                    s, e = spans[idx]
                    pending.append(pool.submit(self._parse_shard, buf[s:e]))
                    idx += 1

            submit_up_to(self.workers + 1)
            while pending:
                fc = pending.pop(0).result()
                submit_up_to(self.workers + 1)
                yield fc, not pending and idx >= len(spans)

    def __iter__(self) -> Iterator[PaddedBatch]:
        carry = concat_flat_clouds([])
        for fc, last in self._pump():
            chunk = concat_flat_clouds([carry, fc])
            batches, carry = assemble_batches(
                chunk,
                self.num_channels,
                self.batch_size,
                bucket=self.bucket,
                center=self.center,
                radii_by_type=self.radii_by_type,
                pad_tail=last,
                compact=self.compact,
            )
            self.records_fed += chunk.num_molecules - carry.num_molecules
            for b in batches:
                self.molecules_fed += int((b.num_atoms > 0).sum())
                if self.presort and b.padded_atoms > 128:
                    b = morton_presort(b, self.spec)
                yield b

    def iter_wire(self, spec) -> Iterator[tuple]:
        """Stream ((B, Vp, 4) int16 wire, (B,) num_atoms, num_channels).

        The all-native streaming fast path: shards parse in C, batches
        assemble/center/presort/quantize in one C pass (assemble_wire) —
        the Python driver only hands buffers around, so the feed fully
        overlaps the dispatch thread (both C calls release the GIL).

        Quantization always uses ``wire_scale(spec)`` — the same scale the
        wire consumers (stream_checksum / the fused scan step) dequantize
        with, so there is no per-call scale knob to get out of sync."""
        if self.radii_by_type is not None:
            raise ValueError(
                "iter_wire carries types, not per-atom radii; pass radii_by_type= to "
                "stream_checksum / the fused step instead (gathered in-graph)"
            )
        if not self.center:
            raise ValueError(
                "iter_wire always centers per molecule (the C wire assembly has no "
                "uncentered mode); use __iter__ for center=False feeds"
            )
        scale = wire_scale(spec)
        carry = concat_flat_clouds([])
        for fc, last in self._pump():
            chunk = concat_flat_clouds([carry, fc])
            items, carry = assemble_wire(
                chunk, self.batch_size, num_channels=self.num_channels, scale=scale,
                spec=spec, bucket=self.bucket, presort=self.presort, pad_tail=last,
            )
            self.records_fed += chunk.num_molecules - carry.num_molecules
            for wire, num_atoms in items:
                self.molecules_fed += int((num_atoms > 0).sum())
                yield wire, num_atoms, self.num_channels

"""Streaming library voxelization driver.

The reference processes molecules one Python call at a time with no batching,
metrics, or resumability (SURVEY.md sections 2.5/5).  This driver turns an
arbitrary molecule stream into padded device batches (data/pipeline.py),
voxelizes them (data-parallel over a mesh when given one), and adds the
operational layer a production run needs:

- prefetch: the next batch is dispatched before the previous result is
  consumed (device/host overlap; JAX dispatch is async).
- observability: running molecules/s and voxel-channel/s counters
  (the reference's only metric is ad-hoc ``time.time()`` prints,
  test/test_time_numpy.py:74-115).
- checkpoint/resume: an optional JSON manifest records the number of
  molecules completed; a restarted run skips them (the reference has no
  notion of resumption).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import time
from collections.abc import Callable, Iterable
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import GridSpec
from ..data.pipeline import PaddedBatch, iter_batches
from ..ops.batch import voxelize_batch
from .mesh import DATA_AXIS
from .sharded import voxelize_batch_dp


@dataclasses.dataclass
class StreamStats:
    molecules: int = 0
    batches: int = 0
    skipped: int = 0
    wall_seconds: float = 0.0

    @property
    def mols_per_second(self) -> float:
        return self.molecules / self.wall_seconds if self.wall_seconds > 0 else 0.0


class StreamingVoxelizer:
    """Voxelize a molecule stream in fixed-shape batches with metrics/resume."""

    def __init__(
        self,
        spec: GridSpec,
        *,
        batch_size: int = 64,
        density_type: str = "gaussian",
        sigma: float = 0.5,
        radii: float = 1.0,
        random_translation: float = 0.0,
        random_rotation: bool = False,
        bucket: int | None = None,
        mesh=None,
        seed: int = 0,
        checkpoint_path: str | Path | None = None,
        checkpoint_every: int = 10,
        out_dtype: str = "float32",
        presorted: bool = False,
        materialize: bool = False,
        slab_depth: int | None = None,
    ):
        self.spec = spec
        self.batch_size = batch_size
        self.density_type = density_type
        self.sigma = sigma
        self.radii = radii
        self.random_translation = random_translation
        self.random_rotation = random_rotation
        self.bucket = bucket
        self.mesh = mesh
        self.checkpoint_path = Path(checkpoint_path) if checkpoint_path else None
        self.checkpoint_every = checkpoint_every
        self.out_dtype = out_dtype
        self.presorted = presorted
        self.materialize = materialize
        # full-grid assembly for depths beyond the kernel budget (256^3+):
        # loop depth slabs and assemble on the host (ops/batch.py
        # voxelize_batch_sliced).  None = single-launch full depth.
        self.slab_depth = slab_depth
        self._key = jax.random.PRNGKey(seed)

    # ------------------------------------------------------------- checkpoint

    def _load_checkpoint(self) -> int:
        if self.checkpoint_path and self.checkpoint_path.exists():
            return int(json.loads(self.checkpoint_path.read_text()).get("molecules_done", 0))
        return 0

    def _save_checkpoint(self, molecules_done: int) -> None:
        if self.checkpoint_path:
            tmp = self.checkpoint_path.with_suffix(".tmp")
            tmp.write_text(json.dumps({"molecules_done": molecules_done, "ts": time.time()}))
            tmp.replace(self.checkpoint_path)

    # ------------------------------------------------------------------ drive

    def _dispatch(self, batch: PaddedBatch, radii_dev):
        import jax.numpy as jnp

        b = batch.batch_size
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, b)
        per_atom = batch.radii is not None
        weights = batch.weights
        if weights is None:  # compact batch: expand the one-hot host-side
            t = batch.types
            eye = np.eye(batch.num_channels, dtype=np.float32)
            weights = np.where((t >= 0)[..., None], eye[np.maximum(t, 0)], 0.0)
        args = (
            jnp.asarray(batch.coords),
            jnp.asarray(weights),
            jnp.asarray(batch.radii) if per_atom else radii_dev,
            jnp.asarray(batch.mask),
            None if batch.centers is None else jnp.asarray(batch.centers),
            keys,
            self.random_translation,
        )
        kw = dict(
            spec=self.spec,
            density_type=self.density_type,
            sigma=self.sigma,
            random_rotation=self.random_rotation,
            out_dtype=self.out_dtype,
            presorted=self.presorted,
        )
        if self.slab_depth is not None:
            from ..ops.batch import voxelize_batch_sliced

            return voxelize_batch_sliced(
                *args, spec=self.spec, slab_depth=self.slab_depth,
                density_type=self.density_type, sigma=self.sigma,
                random_rotation=self.random_rotation, out_dtype=self.out_dtype,
                presorted=self.presorted, radii_batched=per_atom,
            )
        if self.mesh is None:
            kw["materialize"] = self.materialize
        if self.mesh is not None and not per_atom and b % self.mesh.shape[DATA_AXIS] == 0:
            return voxelize_batch_dp(*args, mesh=self.mesh, **kw)
        return voxelize_batch(*args, radii_batched=per_atom, **kw)

    def run(
        self,
        clouds: Iterable[tuple[np.ndarray, np.ndarray]],
        consumer: Callable[[jax.Array, PaddedBatch], None] | None = None,
        log_every: int = 0,
    ) -> StreamStats:
        """Drive the stream; ``consumer(images, batch)`` receives each result.

        images is the device array (B, C, D, H, W); padded tail molecules
        (mask all-False) produce all-zero grids.
        """
        source = iter(clouds)
        skip = self._load_checkpoint()
        if skip:
            for _ in range(skip):
                next(source, None)
        return self.run_batches(
            iter_batches(source, self.batch_size, bucket=self.bucket),
            consumer,
            log_every=log_every,
            skipped=skip,
        )

    def run_batches(
        self,
        batches: Iterable[PaddedBatch],
        consumer: Callable[[jax.Array, PaddedBatch], None] | None = None,
        log_every: int = 0,
        skipped: int = 0,
    ) -> StreamStats:
        """Drive a pre-built PaddedBatch stream (e.g. data.feed.SDFBatchFeeder).

        Callers that batch upstream (the vectorized feeder, a sharded loader)
        enter here directly and skip the per-molecule iter_batches path.
        Resume semantics: ``skipped`` molecules were already done; checkpoints
        record ``skipped + molecules``.
        """
        import jax.numpy as jnp

        stats = StreamStats()
        stats.skipped = skipped
        t0 = time.time()

        radii_dev = None
        pending: tuple[jax.Array, PaddedBatch] | None = None

        def flush(p):
            if p is not None and consumer is not None:
                consumer(p[0], p[1])

        for batch in batches:
            if batch.radii is None and (radii_dev is None or radii_dev.shape[0] != batch.padded_atoms):
                radii_dev = jnp.full((batch.padded_atoms,), float(self.radii), jnp.float32)
            images = self._dispatch(batch, radii_dev)  # async dispatch
            flush(pending)  # consume previous while this batch runs
            pending = (images, batch)
            stats.batches += 1
            stats.molecules += int((batch.num_atoms > 0).sum())
            if self.checkpoint_path and stats.batches % self.checkpoint_every == 0:
                jax.block_until_ready(images)
                self._save_checkpoint(skipped + stats.molecules)
            if log_every and stats.batches % log_every == 0:
                dt = time.time() - t0
                print(
                    f"[stream] {stats.molecules} mols, {stats.batches} batches, "
                    f"{stats.molecules / dt:.0f} mols/s"
                )
        flush(pending)
        if pending is not None:
            jax.block_until_ready(pending[0])
        stats.wall_seconds = time.time() - t0
        self._save_checkpoint(skipped + stats.molecules)
        return stats


# ------------------------------------------------------- fused stream step


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "num_channels", "radii_value", "radii_by_type", "random_translation",
        "spec", "density_type", "sigma", "random_rotation", "out_dtype", "impl", "presorted",
        "witness",
    ),
)
def _fused_scan_step(
    coords,  # (B, Vp, 3) f32, B = k * chunk
    types,  # (B, Vp) int8, -1 = padding
    centers,  # (B, 3) f32
    key,  # base PRNG key (device-resident, transferred once)
    step,  # int32 scalar: stream step counter (folds into the keys)
    *,
    chunk: int,
    num_channels: int,
    radii_value: float,
    random_translation: float,
    spec: GridSpec,
    density_type: str,
    sigma: float,
    random_rotation: bool,
    out_dtype: str,
    impl: str = "auto",
    presorted: bool = False,
    radii_by_type: tuple | None = None,
    witness: bool = False,
):
    """One dispatch for a whole superbatch: scan chunks, return ONE checksum.

    Built for the tunnel/host-overhead regime the stream driver measured:
    every host->device operation costs ~1-3 ms through the axon tunnel, so
    the production step takes THREE compact arrays (int8 types instead of
    one-hot f32 weights: 4C x fewer bytes), derives masks/one-hots/PRNG keys
    in-graph, and keeps memory O(chunk) by reducing each chunk's grids to a
    scalar inside the scan — grids are written (Pallas output is intrinsic;
    the separable path runs materialize=True) but never round-trip to HBM
    twice or to the host.  This is the shape a training consumer uses, with
    the checksum replaced by its loss.
    """
    return _scan_chunks(
        coords, types, centers, key, step,
        chunk=chunk, num_channels=num_channels, radii_value=radii_value,
        random_translation=random_translation, spec=spec, density_type=density_type,
        sigma=sigma, random_rotation=random_rotation, out_dtype=out_dtype,
        impl=impl, presorted=presorted, radii_by_type=radii_by_type, witness=witness,
    )


def _scan_chunks(
    coords, types, centers, key, step, *,
    chunk, num_channels, radii_value, random_translation, spec,
    density_type, sigma, random_rotation, out_dtype, impl, presorted,
    radii_by_type=None, witness=False,
):
    b, vp = types.shape
    k = b // chunk
    coords = coords.reshape(k, chunk, vp, 3)
    types = types.reshape(k, chunk, vp)
    centers = None if centers is None else centers.reshape(k, chunk, 3)
    radii = jnp.full((vp,), radii_value, jnp.float32)
    # per-element radii ride the type lane for free: gathered in-graph from a
    # static (C,) table, so the wire format needs no extra bytes (the
    # reference's channel-wise-radii types path, numpy/voxelizer.py:284-286)
    rtab = None if radii_by_type is None else jnp.asarray(radii_by_type, jnp.float32)
    base = jax.random.fold_in(key, step)

    def body(acc, xs):
        i, crd, t = xs[:3]
        ce = xs[3] if centers is not None else None
        keys = jax.random.split(jax.random.fold_in(base, i), chunk)
        mask = t >= 0
        w = jax.nn.one_hot(jnp.maximum(t, 0).astype(jnp.int32), num_channels, dtype=jnp.float32)
        w = w * mask[..., None].astype(jnp.float32)
        r = radii
        batched = False
        if rtab is not None:
            r = jnp.where(mask, jnp.take(rtab, jnp.maximum(t, 0).astype(jnp.int32)), 1.0)
            batched = True
        out = voxelize_batch(
            crd, w, r, mask, ce, keys, random_translation,
            spec=spec, density_type=density_type, sigma=sigma,
            random_rotation=random_rotation, impl=impl, radii_batched=batched,
            materialize=True, out_dtype=out_dtype, presorted=presorted,
        )
        # consumer: full sum (integrity checksums) or the witness read (one
        # molecule's complete grid per chunk — the honest producer protocol,
        # docs/DESIGN.md 3c; grids still fully materialize, but the
        # measurement does not bill an HBM re-read of every grid)
        consumed = out[:1] if witness else out
        return acc + jnp.sum(consumed.astype(jnp.float32)), None

    xs = (jnp.arange(k), coords, types) + (() if centers is None else (centers,))
    acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
    return acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "num_channels", "radii_value", "radii_by_type", "random_translation",
        "spec", "density_type", "sigma", "random_rotation", "out_dtype", "impl",
        "presorted", "inv_scale", "witness",
    ),
)
def _fused_scan_step_wire(
    wire,  # (B, Vp, 4) int16 fixed-point [x_q, y_q, z_q, type] (data/feed.py pack_wire)
    key,
    step,
    *,
    chunk: int,
    num_channels: int,
    radii_value: float,
    random_translation: float,
    spec: GridSpec,
    density_type: str,
    sigma: float,
    random_rotation: bool,
    out_dtype: str,
    impl: str = "auto",
    presorted: bool = False,
    inv_scale: float = 1.0 / 1024.0,
    radii_by_type: tuple | None = None,
    witness: bool = False,
):
    """Wire-format superbatch step: ONE int16 array on the wire.

    The next transfer-ladder rung after compact int8 types: coords ship as
    fixed-point int16 (~0.5 mÅ quantization, data/feed.py pack_wire) packed
    with the type lane into a single (B, Vp, 4) array — 8 B/atom instead of
    13+, and ONE host->device transfer instead of three (each op costs
    ~1-3 ms through the axon tunnel).  Coords arrive pre-centered, so no
    centers array exists at all; dequantization is one exact
    power-of-two multiply in-graph.
    """
    coords = wire[..., :3].astype(jnp.float32) * jnp.float32(inv_scale)
    types = wire[..., 3]
    return _scan_chunks(
        coords, types, None, key, step,
        chunk=chunk, num_channels=num_channels, radii_value=radii_value,
        random_translation=random_translation, spec=spec, density_type=density_type,
        sigma=sigma, random_rotation=random_rotation, out_dtype=out_dtype,
        impl=impl, presorted=presorted, radii_by_type=radii_by_type, witness=witness,
    )


def stream_checksum(
    batches: Iterable[PaddedBatch],
    spec: GridSpec,
    *,
    chunk: int = 256,
    density_type: str = "gaussian",
    sigma: float = 0.5,
    radii: float = 1.0,
    radii_by_type=None,
    random_translation: float = 0.0,
    random_rotation: bool = False,
    out_dtype: str = "float32",
    impl: str = "auto",
    seed: int = 0,
    presorted: bool = False,
    wire: bool = False,
    witness: bool = False,
    prefetch_depth: int = 2,
) -> tuple[StreamStats, float]:
    """Drive compact superbatches through the fused step; return a checksum.

    The throughput-measurement / training-shaped driver: batches must be
    compact (types present, data/feed.py compact=True) with batch_size a
    multiple of ``chunk``.  Host work per superbatch = 3 array transfers +
    1 scalar + 1 dispatch; the single final float() fetch fences everything
    (the tunnel defers execution, CLAUDE.md).

    ``presorted``: the batches arrived Morton-sorted on the host
    (SDFBatchFeeder(presort=True) / data.feed.morton_presort) — skips the
    in-graph argsort for the >128-atom regime entirely.

    ``witness``: consume each chunk via the witness read (sum of one
    molecule's complete grid) instead of the full-grid sum — the headline
    protocol (docs/DESIGN.md 3c).  Grids still fully materialize; the full
    sum bills an extra HBM re-read of every grid (~2.6 us/mol at 64^3) that
    a real training consumer would replace with its own loss.  Integrity
    comparisons keep the default full checksum.

    ``wire``: pack each superbatch into ONE (B, Vp, 4) int16 fixed-point
    array (data/feed.py pack_wire, ~0.5 mÅ quantization) and stage its
    device transfer from a prefetch thread, so packing + H2D overlap the
    previous superbatch's device work — host cost per superbatch drops to
    1 staged transfer + 1 dispatch.  ``prefetch_depth`` bounds how many
    staged superbatches may be in flight ahead of the dispatch loop
    (measured flat 2 vs 4 on this host — docs/DESIGN.md 5a — but exposed
    for hosts with more cores).
    """
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    stats = StreamStats()
    accs = []
    t0 = time.time()
    if wire:
        from ..data.feed import pack_wire, prefetch_iter, wire_scale

        scale = wire_scale(spec)

        def staged():
            for batch in batches:
                if isinstance(batch, tuple):
                    # pre-packed wire from SDFBatchFeeder.iter_wire (all-native
                    # assembly): nothing left to do on this thread but H2D
                    wire_arr, num_atoms, nc = batch
                    if wire_arr.shape[0] % chunk:
                        raise ValueError(
                            f"batch_size {wire_arr.shape[0]} not a multiple of chunk {chunk}"
                        )
                    yield jax.device_put(wire_arr), int((num_atoms > 0).sum()), nc
                    continue
                if batch.types is None:
                    raise ValueError("stream_checksum(wire=True) needs compact batches")
                if batch.batch_size % chunk:
                    raise ValueError(f"batch_size {batch.batch_size} not a multiple of chunk {chunk}")
                dev = jax.device_put(pack_wire(batch, scale))  # async H2D off-thread
                yield dev, int((batch.num_atoms > 0).sum()), batch.num_channels

        for step, (dev, nmol, num_channels) in enumerate(
            prefetch_iter(staged(), depth=prefetch_depth)
        ):
            accs.append(
                _fused_scan_step_wire(
                    dev, key, jnp.int32(step),
                    chunk=chunk, num_channels=num_channels, radii_value=float(radii),
                    random_translation=float(random_translation), spec=spec,
                    density_type=density_type, sigma=sigma,
                    random_rotation=random_rotation, out_dtype=out_dtype,
                    impl=impl, presorted=presorted, inv_scale=1.0 / scale,
                    radii_by_type=None if radii_by_type is None else tuple(radii_by_type),
                    witness=witness,
                )
            )
            stats.batches += 1
            stats.molecules += nmol
        checksum = float(jnp.sum(jnp.stack(accs))) if accs else 0.0
        stats.wall_seconds = time.time() - t0
        return stats, checksum
    for step, batch in enumerate(batches):
        if batch.types is None:
            raise ValueError("stream_checksum needs compact batches (SDFBatchFeeder(compact=True))")
        if batch.batch_size % chunk:
            raise ValueError(f"batch_size {batch.batch_size} not a multiple of chunk {chunk}")
        accs.append(
            _fused_scan_step(
                jnp.asarray(batch.coords),
                jnp.asarray(batch.types),
                jnp.asarray(
                    batch.centers
                    if batch.centers is not None
                    else np.zeros((batch.batch_size, 3), np.float32)
                ),
                key,
                jnp.int32(step),
                chunk=chunk,
                num_channels=batch.num_channels,
                radii_value=float(radii),
                random_translation=float(random_translation),
                spec=spec,
                density_type=density_type,
                sigma=sigma,
                random_rotation=random_rotation,
                out_dtype=out_dtype,
                impl=impl,
                presorted=presorted,
                radii_by_type=None if radii_by_type is None else tuple(radii_by_type),
                witness=witness,
            )
        )
        stats.batches += 1
        stats.molecules += int((batch.num_atoms > 0).sum())
    checksum = float(jnp.sum(jnp.stack(accs))) if accs else 0.0
    stats.wall_seconds = time.time() - t0
    return stats, checksum

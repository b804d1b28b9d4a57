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
import json
import time
from collections.abc import Callable, Iterable
from pathlib import Path

import jax
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
        args = (
            jnp.asarray(batch.coords),
            jnp.asarray(batch.weights),
            radii_dev,
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
        )
        if self.mesh is not None and b % self.mesh.shape[DATA_AXIS] == 0:
            return voxelize_batch_dp(*args, mesh=self.mesh, **kw)
        return voxelize_batch(*args, **kw)

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
        import jax.numpy as jnp

        stats = StreamStats()
        skip = self._load_checkpoint()
        stats.skipped = skip
        t0 = time.time()

        radii_dev = None
        pending: tuple[jax.Array, PaddedBatch] | None = None

        def flush(p):
            if p is not None and consumer is not None:
                consumer(p[0], p[1])

        def real_count(batch: PaddedBatch) -> int:
            return int((batch.num_atoms > 0).sum())

        source = iter(clouds)
        if skip:
            for _ in range(skip):
                next(source, None)

        for batch in iter_batches(source, self.batch_size, bucket=self.bucket):
            if radii_dev is None or radii_dev.shape[0] != batch.padded_atoms:
                radii_dev = jnp.full((batch.padded_atoms,), float(self.radii), jnp.float32)
            images = self._dispatch(batch, radii_dev)  # async dispatch
            flush(pending)  # consume previous while this batch runs
            pending = (images, batch)
            stats.batches += 1
            stats.molecules += real_count(batch)
            if self.checkpoint_path and stats.batches % self.checkpoint_every == 0:
                jax.block_until_ready(images)
                self._save_checkpoint(skip + stats.molecules)
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
        self._save_checkpoint(skip + stats.molecules)
        return stats

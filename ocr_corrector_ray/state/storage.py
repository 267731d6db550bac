"""Storage driver seam (SURVEY.md §7.0).

Checkpoint fragments are written/read through a driver object so the
on-disk format is swappable in ONE place: ``LanceDriver`` when the
``lance`` package is importable (the north-star deployment stores the
corrected corpus + lineage in Lance tables), ``ParquetDriver`` otherwise
(this sandbox).  ``checkpoint`` and the CLI only ever call
``get_driver()`` — no parquet calls are hard-wired in the checkpoint
path.

Both drivers share the crash-consistency contract:
``write_fragment`` must make the fragment visible ATOMICALLY (parquet:
write-to-temp + ``os.replace``; Lance: its versioned commit), so a
manifest row written after it can never describe a half-written file.
"""

from __future__ import annotations

import os

import pyarrow as pa


class ParquetDriver:
    """Parquet fragments, one file per partition (atomic rename)."""

    name = "parquet"
    extension = "parquet"

    def write_fragment(self, table: pa.Table, path: str) -> None:
        import pyarrow.parquet as pq

        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)

    def read_fragment(self, path: str, columns=None) -> pa.Table:
        import pyarrow.parquet as pq

        return pq.read_table(path, columns=columns)

    def read_dir(self, dir_path: str):
        """All fragments in a directory as a (lazy) ray.data.Dataset."""
        import ray.data

        return ray.data.read_parquet(dir_path)

    def read_files(self, paths):
        import ray.data

        return ray.data.read_parquet(list(paths))


class LanceDriver:  # pragma: no cover — lance is not installed in this sandbox
    """Lance fragments: one single-fragment Lance dataset per partition.
    Lance's manifest-versioned commit makes the write atomic without a
    rename dance; readers get zero-copy Arrow via ``lance.dataset``."""

    name = "lance"
    extension = "lance"

    def write_fragment(self, table: pa.Table, path: str) -> None:
        import lance

        lance.write_dataset(table, path, mode="overwrite")

    def read_fragment(self, path: str, columns=None) -> pa.Table:
        import lance

        return lance.dataset(path).to_table(columns=columns)

    def read_dir(self, dir_path: str):
        import ray.data

        paths = sorted(
            os.path.join(dir_path, n)
            for n in os.listdir(dir_path)
            if n.endswith(f".{self.extension}")
        )
        return self.read_files(paths)

    def read_files(self, paths):
        """Lazy: each fragment is opened INSIDE a read task (batch_size=1
        path rows), never materialized on the driver — a 100-TB resume
        must not funnel every fragment through driver memory (ADVICE r2)."""
        import pyarrow as pa
        import ray.data

        def load(batch: pa.Table) -> pa.Table:
            import lance

            tables = [lance.dataset(p).to_table() for p in batch.column("path").to_pylist()]
            return pa.concat_tables(tables)

        paths_ds = ray.data.from_arrow(pa.table({"path": pa.array(list(paths), pa.string())}))
        return paths_ds.map_batches(load, batch_format="pyarrow", batch_size=1)


def get_driver(fmt: str | None = None):
    """Resolve the storage driver.

    ``fmt=None`` (fresh writes): Lance when importable, parquet fallback —
    installing lance flips the format for NEW checkpoints without code
    changes.  ``fmt`` given (read/resume paths): the format PERSISTED with
    the data (manifest rows / ``_layout.json``) wins — a checkpoint
    written as parquet must be read as parquet even after lance is
    installed, or reads silently drop every parquet partition (ADVICE
    r2).  Unknown formats fail loudly."""
    if fmt is None:
        try:
            import lance  # noqa: F401

            return LanceDriver()
        except ImportError:
            return ParquetDriver()
    for cls in (ParquetDriver, LanceDriver):
        if fmt in (cls.name, cls.extension):
            return cls()
    raise ValueError(f"unknown storage format {fmt!r} (expected 'parquet' or 'lance')")

"""Lance table IO, gated behind import-try.

The north_rule lands fetched payloads in Lance tables. The ``lance``
package is not installed in this container, so every write goes to
parquet (same schema, same layout) and ADDITIONALLY to ``<path>.lance``
when the package exists — the swap is a format flag, not a code path.
Readers prefer the lance dataset when present.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance absent in this container
    import lance

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def write_table(table: pa.Table, base_path: str | Path) -> Path:
    """Write ``table`` as ``<base>.parquet`` (always) and ``<base>.lance``
    (when lance is importable). Returns the parquet path."""
    base = Path(base_path)
    base.parent.mkdir(parents=True, exist_ok=True)
    parquet_path = base.with_suffix(".parquet")
    pq.write_table(table, parquet_path)
    if HAVE_LANCE:  # pragma: no cover
        lance.write_dataset(table, str(base.with_suffix(".lance")), mode="overwrite")
    return parquet_path


def read_table(base_path: str | Path) -> pa.Table:
    base = Path(base_path)
    if HAVE_LANCE and base.with_suffix(".lance").exists():  # pragma: no cover
        return lance.dataset(str(base.with_suffix(".lance"))).to_table()
    return pq.read_table(base.with_suffix(".parquet"))


def ray_read(base_path: str | Path, **kwargs):
    """ray.data reader for a table written by :func:`write_table`."""
    import ray.data as rd

    base = Path(base_path)
    if HAVE_LANCE and base.with_suffix(".lance").exists():  # pragma: no cover
        return rd.read_lance(str(base.with_suffix(".lance")), **kwargs)
    return rd.read_parquet(str(base.with_suffix(".parquet")), **kwargs)

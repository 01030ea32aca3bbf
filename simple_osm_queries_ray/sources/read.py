"""Sized parquet reads: block count proportional to file bytes.

Ray's default read parallelism targets ~CPU-count blocks regardless of input
size, so a 60 KB table becomes 64 eight-row blocks — and every downstream
sort-shuffle then pays width^2 task overhead for zero parallelism gain (the
reference reads such a table in one scan, ``/root/reference/src/osm/reader.go``).
One block per ~16 MB of file, capped at 4 blocks per CPU, keeps small inputs
narrow and large inputs wide.
"""

from __future__ import annotations

import os

import ray
import ray.data

TARGET_BLOCK_BYTES = 16 << 20


def read_feature_table(path: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read a feature table in whatever format it is stored.

    The north rule's storage format is Lance; this container ships no lance
    wheel, so ``.lance`` paths use ``ray.data.read_lance`` when importable and
    raise a clearly-marked error otherwise. Parquet (the sandbox testdata
    format) goes through the sized read below. Call sites stay
    format-agnostic.
    """
    if path.endswith(".lance"):
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "Lance support needs the 'lance' wheel (not in this container); "
                "the parquet path below is the format-equivalent substitute"
            ) from e
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return read_parquet_sized(path, columns=columns, **kwargs)


def read_parquet_sized(path: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    try:
        if os.path.isdir(path):
            # getsize() on a directory returns the dirent size (~4 KB) and
            # would force a multi-GB dataset into ONE block — sum the
            # parquet members instead (one level; hive layouts nest once)
            fsize = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        fsize += os.path.getsize(os.path.join(root, f))
            if fsize == 0:
                fsize = None
        else:
            fsize = os.path.getsize(path)
    except OSError:
        fsize = None
    if fsize is not None and "override_num_blocks" not in kwargs:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        nblocks = -(-fsize // TARGET_BLOCK_BYTES)  # ceil
        kwargs["override_num_blocks"] = int(min(max(1, nblocks), 4 * cpus))
    return ray.data.read_parquet(path, columns=columns, **kwargs)

"""HDF5 shard storage with the reference's on-disk contract.

Artifact format (reference tools/hdf5_manager.py, SURVEY §2.6):
- shards named ``{name}.hdf5`` (single) or ``{name}.hdf5_K`` (K = 0,1,...),
  each holding one dataset ``data`` of shape [N,3,224,224] float16, gzip
  compression, chunk shape (1,3,224,224), at most ``max_size`` images each;
- ``name2idx.json`` mapping image filename -> global row index.

Additions over the reference:
- ``gen_hdf5`` parallelizes the JPEG decode across worker processes
  (the reference ingest is single-threaded, ~158 img/s for 1.05M images —
  dataset_gen.py:81); workers decode+normalize, the parent writes shards in
  order so the artifact is byte-compatible with serial ingest.
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import h5py
import numpy as np

_SPLIT_FILE_PATTERN = re.compile(r".*?\.hdf5_[0-9]+$")
_DB_NAME_FILTER = re.compile(r"(.*?)\.hdf5[_0-9]*$")
_DB_INDEX_FILTER = re.compile(r".*?\.hdf5_([0-9]+)$")

USE_FLOAT16 = True  # storage dtype (hdf5_manager.py:12) — 2x space, lossy


class Hdf5Manager:
    """Random-access reader over a sorted set of HDF5 shards."""

    def __init__(self) -> None:
        self._db_files: List[h5py.File] = []
        self._cum_lens: List[int] = []
        self._name2idx: Optional[Dict[str, int]] = None

    def load_name2idx(self, file_path: str) -> None:
        with open(file_path, "r", encoding="utf-8") as f:
            self._name2idx = json.load(f)

    def load_database(self, db_path) -> None:
        """Open all shards under one or more directories.

        Accepts both the sharded ``*.hdf5_K`` layout and a single ``*.hdf5``
        file; validates that a directory holds only one dataset family.
        """
        self.close()
        paths = [db_path] if isinstance(db_path, str) else list(db_path)

        # shard order: directories in the given order, shards sorted by
        # index within each directory (a directory may hold either a single
        # ``name.hdf5`` or a ``name.hdf5_K`` split set).
        # DIVERGENCE from reference hdf5_manager.py:46-49, which sorts all
        # shards *globally* by index, interleaving directories whose shard
        # indices overlap — under which a name2idx built against one ordering
        # silently maps names to wrong rows under the other. We keep
        # per-directory ordering (see PARITY.md) and warn on overlap.
        shards: List[str] = []
        indices_by_dir: List[set] = []
        for dirpath in paths:
            files = os.listdir(dirpath)
            matched = [n for n in files if _SPLIT_FILE_PATTERN.match(n)]
            if not matched:  # fall back to a single unsharded .hdf5
                matched = [n for n in files if n.endswith(".hdf5")]
            if not matched:
                raise FileNotFoundError(f"no HDF5 dataset found under {dirpath}")
            base = _DB_NAME_FILTER.findall(matched[0])[0]
            if not all(_DB_NAME_FILTER.findall(n)[0] == base for n in matched):
                raise ValueError(f"multiple datasets found under {dirpath}")
            matched.sort(
                key=lambda n: int((_DB_INDEX_FILTER.findall(n) or [-1])[0])
            )
            shards.extend(os.path.join(dirpath, n) for n in matched)
            indices_by_dir.append(
                {int(i) for n in matched for i in _DB_INDEX_FILTER.findall(n)}
            )
        for i, a in enumerate(indices_by_dir):
            for b in indices_by_dir[i + 1:]:
                if a & b:
                    import warnings

                    warnings.warn(
                        "multiple directories contain overlapping .hdf5_K "
                        "shard indices; row order here is per-directory, but "
                        "the reference interleaves by global index — a legacy "
                        "name2idx built by the reference may map names to "
                        "wrong rows",
                        stacklevel=2,
                    )
                    break
            else:
                continue
            break

        total = 0
        for path in shards:
            f = h5py.File(path, mode="r")
            self._db_files.append(f)
            total += f["data"].shape[0]
            self._cum_lens.append(total)

    def __len__(self) -> int:
        return self._cum_lens[-1] if self._cum_lens else 0

    def read_index(self, index: int) -> np.ndarray:
        """Read one image by global row index."""
        prev = 0
        for f, cum in zip(self._db_files, self._cum_lens):
            if index < cum:
                return f["data"][index - prev]
            prev = cum
        raise IndexError(index)

    def read(self, name: str) -> np.ndarray:
        """Read one image by filename via name2idx."""
        assert self._name2idx is not None, "call load_name2idx first"
        return self.read_index(self._name2idx[name])

    def close(self) -> None:
        for f in self._db_files:
            try:
                f.close()
            except Exception:
                pass
        self._db_files.clear()
        self._cum_lens.clear()

    def __del__(self) -> None:
        self.close()


class DbBuilder:
    """Context-manager shard writer (reference hdf5_manager.py:81-135)."""

    def __init__(
        self,
        output_path: str,
        name: str,
        shape: Sequence[int],
        max_size: int,
        db_length: int,
        dtype: str = "float32",
        compression_opts: int = 5,
    ) -> None:
        self.output_path = output_path
        self.name = name
        self.shape = tuple(shape)
        self.max_length = max_size
        self.db_length = db_length
        self.dtype = dtype
        self.compression_opts = compression_opts
        self.file_index = 0
        self.ptr_index = 0
        self.cur_file: Optional[h5py.File] = None
        self.cur_db = None

    def __enter__(self) -> "DbBuilder":
        if self.max_length >= self.db_length:
            p = os.path.join(self.output_path, self.name + ".hdf5")
        else:
            p = os.path.join(self.output_path, f"{self.name}.hdf5_{self.file_index}")
            self.file_index += 1
        self._create_new_file(p, min(self.max_length, self.db_length))
        return self

    def _create_new_file(self, path: str, length: int) -> None:
        if self.cur_file is not None:
            self.cur_file.close()
        self.cur_file = h5py.File(path, "w")
        self.cur_db = self.cur_file.create_dataset(
            name="data",
            shape=[length] + list(self.shape),
            maxshape=[None] + list(self.shape),
            dtype=self.dtype,
            chunks=tuple([1] + list(self.shape)),
            compression="gzip",
            compression_opts=self.compression_opts,
        )

    def append(self, data: np.ndarray) -> None:
        assert np.shape(data) == self.shape, (np.shape(data), self.shape)
        if self.ptr_index >= self.max_length:
            p = os.path.join(self.output_path, f"{self.name}.hdf5_{self.file_index}")
            self.file_index += 1
            self.ptr_index = 0
            self.db_length -= self.max_length
            self._create_new_file(p, min(self.max_length, self.db_length))
        self.cur_db[self.ptr_index] = data
        self.ptr_index += 1

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        if self.cur_file is not None:
            # trim the tail if fewer rows were appended than pre-sized
            # (e.g. undecodable images skipped by gen_hdf5)
            if self.cur_db is not None and self.ptr_index < self.cur_db.shape[0]:
                self.cur_db.resize(self.ptr_index, axis=0)
            self.cur_file.close()


def _decode_one(args: Tuple[str, str, Tuple[int, int], Tuple, Tuple]) -> Optional[np.ndarray]:
    """Worker: decode + normalize one image to the storage dtype."""
    from myimagecaptioningmodel_tpu.data import image as image_mod

    path, _name, shape, mean, std = args
    try:
        feat = image_mod.process_image(image_mod.read_image(path), shape, mean, std)
    except Exception:
        return None
    if feat is None:
        return None
    return feat.astype(np.float16) if USE_FLOAT16 else feat


def gen_hdf5(cfg=None, progress_every: int = 10000) -> Dict[str, object]:
    """Offline ingest: scan image dirs -> decode/normalize -> shard to HDF5.

    Reference hdf5_manager.gen_hdf5 (:138-166), with optional multi-process
    decode (``cfg.build_dataset.num_workers``). Shard contents and
    ``name2idx.json`` are identical to serial ingest: results are written in
    scan order regardless of worker completion order.

    Images that fail to decode or are not 3-channel are *skipped* (the
    reference would crash on them via the DbBuilder shape assert); skipped
    names are excluded from name2idx and reported in the summary.
    """
    from myimagecaptioningmodel_tpu import config as config_mod

    cfg = cfg or config_mod.default
    bd, dc = cfg.build_dataset, cfg.data
    begin = time.time()

    images: List[Tuple[str, str]] = []
    for image_path in bd.image_paths:
        names = sorted(n for n in os.listdir(image_path) if n.endswith(".jpg"))
        images.extend((n, os.path.join(image_path, n)) for n in names)

    shape = tuple(dc.image_shape)
    work = [(p, n, shape, dc.image_mean, dc.image_std) for n, p in images]

    os.makedirs(bd.output_path, exist_ok=True)
    builder = DbBuilder(
        bd.output_path,
        "aic_flk",
        shape=(3, *shape),
        max_size=bd.shard_max_size,
        db_length=len(images),
        dtype="float16" if USE_FLOAT16 else "float32",
        compression_opts=bd.compression_opts,
    )

    name2idx: Dict[str, int] = {}
    skipped: List[str] = []
    row = 0

    def results() -> Iterable[Optional[np.ndarray]]:
        if bd.num_workers and bd.num_workers > 0:
            import multiprocessing as mp

            with mp.Pool(bd.num_workers) as pool:
                yield from pool.imap(_decode_one, work, chunksize=64)
        else:
            yield from map(_decode_one, work)

    with builder:
        for idx, ((name, _path), feat) in enumerate(zip(images, results())):
            if feat is None:
                skipped.append(name)
                continue
            name2idx[name] = row
            builder.append(feat)
            row += 1
            if progress_every and idx % progress_every == 0:
                print(f"gen_hdf5 {idx}/{len(images)}")

    with open(os.path.join(bd.output_path, "name2idx.json"), "w") as f:
        json.dump(name2idx, f)

    elapsed = time.time() - begin
    return {
        "images": row,
        "skipped": skipped,
        "seconds": elapsed,
        "images_per_sec": row / elapsed if elapsed > 0 else float("inf"),
    }

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
import zlib
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

    @property
    def storage_info(self) -> Dict[str, object]:
        """dtype/codec + provenance attrs of the shard set (from the first
        shard's dataset; the build writes identical attrs to every shard)."""
        if not self._db_files:
            return {}
        d = self._db_files[0]["data"]
        info: Dict[str, object] = {
            "dtype": str(d.dtype),
            "codec": d.compression or "none",
        }
        for k, v in d.attrs.items():
            info[k] = v.tolist() if hasattr(v, "tolist") else v
        return info

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


class ParallelHdf5Reader:
    """Thread-pooled random-access batch reads over a shard set.

    h5py serializes every HDF5 library call under one process-global lock,
    so naive multi-threaded ``read_index`` calls cannot scale. For gzip
    shards (the reference contract) this reader bypasses HDF5's filter
    pipeline instead: the raw deflate chunk is fetched under the lock (a
    cheap page-cache memcpy — measured ~12x faster than inflating under the
    lock) and inflated with ``zlib.decompress`` in a thread pool (zlib
    releases the GIL), so decode scales with host cores. lzf/uncompressed
    shards read through h5py directly — their decode is >10k img/s on one
    core (benchmarks/feed_roofline.md). Rows are bit-identical to
    ``Hdf5Manager.read_index``.
    """

    def __init__(self, db_path, name2idx_path: Optional[str] = None,
                 threads: int = 4) -> None:
        from concurrent.futures import ThreadPoolExecutor

        self._mgr = Hdf5Manager()
        self._mgr.load_database(db_path)
        if name2idx_path:
            self._mgr.load_name2idx(name2idx_path)
        self._threads = max(1, int(threads))
        self._pool = ThreadPoolExecutor(
            self._threads, thread_name_prefix="h5reader"
        )
        # per shard: (dataset, global start row, chunk-inflate fast path?)
        self._plan = []
        start = 0
        for f, cum in zip(self._mgr._db_files, self._mgr._cum_lens):
            d = f["data"]
            fast = (
                d.compression == "gzip"
                and not d.shuffle
                and not d.fletcher32
                and d.scaleoffset is None
                and d.chunks == (1,) + d.shape[1:]
            )
            self._plan.append((d, start, fast))
            start = cum

    def __len__(self) -> int:
        return len(self._mgr)

    @property
    def storage_info(self) -> Dict[str, object]:
        return self._mgr.storage_info

    def _read_one(self, index: int, out: np.ndarray, pos: int) -> None:
        for d, start, fast in self._plan:
            if index < start + d.shape[0]:
                i = index - start
                if fast:
                    try:
                        mask, raw = d.id.read_direct_chunk(
                            (i,) + (0,) * (len(d.shape) - 1)
                        )
                        if mask == 0:  # all filters (i.e. deflate) applied
                            out[pos] = np.frombuffer(
                                zlib.decompress(raw), d.dtype
                            ).reshape(d.shape[1:])
                            return
                    except Exception:
                        pass  # partial-edge/missing chunk: fall through
                out[pos] = d[i]
                return
        raise IndexError(index)

    def read_batch_idx(self, indices: Sequence[int]) -> np.ndarray:
        """Read rows by global index -> stacked [len(indices), ...] array."""
        d0 = self._plan[0][0]
        out = np.empty((len(indices),) + d0.shape[1:], d0.dtype)
        list(
            self._pool.map(
                lambda t: self._read_one(t[1], out, t[0]), enumerate(indices)
            )
        )
        return out

    def read_batch(self, names: Sequence[str]) -> np.ndarray:
        """Read rows by image name (requires name2idx)."""
        n2i = self._mgr._name2idx
        assert n2i is not None, "pass name2idx_path to read by name"
        return self.read_batch_idx([n2i[n] for n in names])

    def close(self) -> None:
        if getattr(self, "_closed", False):
            return
        self._closed = True
        # wait: in-flight read tasks must not see files closed under them
        self._pool.shutdown(wait=True)
        self._mgr.close()

    def __del__(self) -> None:
        try:
            # guard: load_database may have raised before _pool was
            # assigned, and interpreter teardown can half-dismantle the
            # pool/threading machinery under us
            if getattr(self, "_pool", None) is not None:
                self.close()
            elif getattr(self, "_mgr", None) is not None:
                self._mgr.close()
        except Exception:
            pass


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
        codec: str = "gzip",
        attrs: Optional[Dict[str, object]] = None,
    ) -> None:
        if codec not in ("gzip", "lzf", "none"):
            raise ValueError(f"unknown codec {codec!r} (gzip|lzf|none)")
        self.output_path = output_path
        self.name = name
        self.shape = tuple(shape)
        self.max_length = max_size
        self.db_length = db_length
        self.dtype = dtype
        self.compression_opts = compression_opts
        self.codec = codec
        self.attrs = dict(attrs or {})
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
        comp: Dict[str, object] = {}
        if self.codec == "gzip":
            comp = {"compression": "gzip", "compression_opts": self.compression_opts}
        elif self.codec == "lzf":
            comp = {"compression": "lzf"}
        self.cur_file = h5py.File(path, "w")
        self.cur_db = self.cur_file.create_dataset(
            name="data",
            shape=[length] + list(self.shape),
            maxshape=[None] + list(self.shape),
            dtype=self.dtype,
            chunks=tuple([1] + list(self.shape)),
            **comp,
        )
        for k, v in self.attrs.items():
            self.cur_db.attrs[k] = v

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


def _decode_one(args: Tuple[str, str, Tuple[int, int], Tuple, Tuple, str]) -> Optional[np.ndarray]:
    """Worker: decode one image to the storage dtype.

    float16/float32 storage holds *normalized* rows (the reference contract,
    hdf5_manager.py:12,158-159); uint8 storage holds the raw resized CHW
    pixels — normalization then happens at feed time from the shard attrs.
    """
    from myimagecaptioningmodel_tpu.data import image as image_mod

    path, _name, shape, mean, std, storage_dtype = args
    try:
        img = image_mod.read_image(path)
        if storage_dtype == "uint8":
            raw = image_mod.resize_chw_uint8(img, shape)
            return raw
        feat = image_mod.process_image(img, shape, mean, std)
    except Exception:
        return None
    if feat is None:
        return None
    return feat.astype(np.float16) if storage_dtype == "float16" else feat


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
    storage_dtype = getattr(bd, "storage_dtype", "float16")
    if storage_dtype not in ("float16", "float32", "uint8"):
        raise ValueError(f"unknown storage_dtype {storage_dtype!r}")
    if not USE_FLOAT16 and storage_dtype == "float16":
        storage_dtype = "float32"
    codec = getattr(bd, "codec", "gzip")
    work = [
        (p, n, shape, dc.image_mean, dc.image_std, storage_dtype)
        for n, p in images
    ]

    os.makedirs(bd.output_path, exist_ok=True)
    builder = DbBuilder(
        bd.output_path,
        "aic_flk",
        shape=(3, *shape),
        max_size=bd.shard_max_size,
        db_length=len(images),
        dtype=storage_dtype,
        compression_opts=bd.compression_opts,
        codec=codec,
        attrs={
            # provenance the feed path needs to reconstruct normalized rows
            "storage_dtype": storage_dtype,
            "normalized": storage_dtype != "uint8",
            "image_mean": np.asarray(dc.image_mean, np.float32),
            "image_std": np.asarray(dc.image_std, np.float32),
        },
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
        "storage_dtype": storage_dtype,
        "codec": codec,
    }
